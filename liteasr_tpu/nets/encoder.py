"""Shared Transformer/Conformer encoder (liteasr/nets/transformer_encoder.py:28-127).

Pipeline: Conv2D subsample (T -> T/4) -> (relative) positional encoding ->
N encoder layers -> final LayerNorm. The padding-mask subsampling follows the
reference's convolution simulation exactly: ``mask[:, :-2:2][:, :-2:2]``
(transformer_encoder.py:118) — the CTC length formula depends on it.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteasr_tpu.nets.common import (
    LayerNorm,
    PositionalEncoding,
    RelativePositionalEncoding,
    sinusoidal_pe,
)
from liteasr_tpu.nets.layers import ConformerLayer, EncoderLayer
from liteasr_tpu.nets.subsampling import Conv2DSubsampling


def subsample_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) padding mask -> (B, T') after the two stride-2 convs."""
    return mask[:, :-2:2][:, :-2:2]


class TransformerEncoder(nn.Module):
    use_rel: bool
    h_dim: int
    ff_dim: int
    n_head: int
    n_layer: int
    dropout_rate: float
    pos_dropout_rate: float
    attn_dropout_rate: float
    ff_dropout_rate: float
    activation: str = "swish"
    arch: str = "conformer"  # transformer | conformer
    conv_kernel: int = 15
    # WeNet-style streaming: chunked causal attention with this chunk width
    # (in subsampled frames). 0 = full-context (offline). Implements the
    # reference's latent triangle_mask(stage=...) primitive
    # (liteasr/utils/mask.py:30-90), which nothing in the reference wires up.
    static_chunk_size: int = 0
    # dynamic chunk training: per-step random chunk width (50% full context,
    # else U[1, 25] subsampled frames) so one model serves all streaming
    # latencies at decode time
    dynamic_chunk: bool = False
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(layers) less activation memory
    remat: bool = False
    # pre-LN (True, reference default) vs post-LN sublayers
    # (liteasr/nets/transformer_layer.py:17, conformer_layer.py:19)
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    def _chunk_forward(self, x, caches, index, kv_lens, pe_len: int):
        """One streaming step over the layer stack (see __call__)."""
        assert self.arch == "transformer", (
            "streaming decode needs chunk-causal layers; the conformer "
            "conv module + BatchNorm are not chunk-causal")
        x = Conv2DSubsampling(self.h_dim, self.dropout_rate,
                              dtype=self.dtype, name="embed")(x, False)
        c_sub = x.shape[1]
        d = x.shape[-1]
        x = x * math.sqrt(d)
        if self.use_rel:
            pos_emb = sinusoidal_pe(pe_len, d, self.dtype)
        else:
            pe = sinusoidal_pe(pe_len, d, self.dtype)
            x = x + jax.lax.dynamic_slice(pe, (0, index, 0), (1, c_sub, d))
            pos_emb = None

        # key mask: per-QUERY chunk policy (frame t sees keys up to the end
        # of its own static chunk — exactly triangle_mask(stage) offline)
        # AND the per-row valid-key count (padding + unwritten cache tail)
        Lk = caches[0]["k"].shape[1]
        t_g = index + jnp.arange(c_sub)[:, None]        # (c, 1) global
        j = jnp.arange(Lk)[None, :]                      # (1, Lk)
        cs = self.static_chunk_size
        if cs > 0:
            allowed_end = ((t_g // cs) + 1) * cs
        else:
            allowed_end = index + c_sub  # full left context + current chunk
        chunk_mask = (j >= allowed_end)[None, None]      # (1, 1, c, Lk)
        pad_mask = (j >= kv_lens[:, None])[:, None, None, :]  # (B,1,1,Lk)
        attn_mask = chunk_mask | pad_mask                # (B, 1, c, Lk)

        kwargs = dict(
            n_head=self.n_head,
            ff_dim=self.ff_dim,
            dropout_rate=self.dropout_rate,
            attn_dropout_rate=self.attn_dropout_rate,
            ff_dropout_rate=self.ff_dropout_rate,
            activation=self.activation,
            use_rel=self.use_rel,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
        )
        new_caches = []
        for i in range(self.n_layer):
            x, nc = EncoderLayer(**kwargs, name=f"layer_{i}")(
                x, pos_emb, attn_mask, False, mode="chunk",
                cache=caches[i], index=index)
            new_caches.append(nc)
        return LayerNorm(dtype=self.dtype, name="after_norm")(x), new_caches

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, mode: str = "full", caches=None,
                 index=None, kv_lens=None, pe_len: int = 0):
        """:param x: (B, T, F) features; ``mask``: (B, T) True = padding.
        Returns (B, T', h_dim) with T' = ((T-1)//2-1)//2.

        ``mode="chunk"`` is the streaming path (liteasr_tpu/streaming.py):
        ``x`` is one raw conv window whose subsampled outputs are all new
        stream frames starting at subsampled position ``index``; ``caches``
        is a per-layer list of fixed-capacity K/V dicts, ``kv_lens`` (B,)
        the per-row count of valid cached keys after this chunk, and
        ``pe_len`` the static positional-table length (must equal the
        offline padded T' for bit-parity — the legacy rel-shift indexes the
        table from its end). Returns (chunk hidden states, new caches)."""
        if mode == "chunk":
            return self._chunk_forward(x, caches, index, kv_lens, pe_len)
        x = Conv2DSubsampling(self.h_dim, self.dropout_rate,
                              dtype=self.dtype, name="embed")(x, train)

        if self.use_rel:
            x, pos_emb = RelativePositionalEncoding(
                self.pos_dropout_rate, dtype=self.dtype, name="pe")(x, train)
        else:
            x = PositionalEncoding(
                self.pos_dropout_rate, dtype=self.dtype, name="pe")(x, train)
            pos_emb = None

        attn_mask = None
        if mask is not None:
            sub = subsample_mask(mask)
            attn_mask = sub[:, None, None, :]  # (B, 1, 1, T')
        if self.dynamic_chunk and train:
            # chunk width is a traced scalar: the mask is computed with jnp
            # ops so no recompilation per sampled width
            t_sub = x.shape[1]
            if self.has_rng("chunk"):
                key = self.make_rng("chunk")
            else:
                key = jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(key)
            full = jax.random.uniform(k1) < 0.5
            c = jnp.where(full, t_sub,
                          jax.random.randint(k2, (), 1, 26)).astype(jnp.int32)
            row = jnp.arange(t_sub)[:, None]
            col = jnp.arange(t_sub)[None, :]
            chunk = ((col // c) > (row // c))[None, None, :, :]
            attn_mask = chunk if attn_mask is None else (attn_mask | chunk)
        elif self.static_chunk_size > 0:
            from liteasr_tpu.ops.masks import triangle_mask

            t_sub = x.shape[1]
            chunk = triangle_mask(
                t_sub, stage=self.static_chunk_size).astype(bool)
            chunk = chunk[None, None, :, :]  # (1, 1, T', T')
            attn_mask = chunk if attn_mask is None else (attn_mask | chunk)

        layer_cls = ConformerLayer if self.arch == "conformer" else EncoderLayer
        if self.remat:
            # __call__(self, x, pos_emb, mask, train): train (idx 4 incl.
            # self) must stay static
            layer_cls = nn.remat(layer_cls, static_argnums=(4,))
        kwargs = dict(
            n_head=self.n_head,
            ff_dim=self.ff_dim,
            dropout_rate=self.dropout_rate,
            attn_dropout_rate=self.attn_dropout_rate,
            ff_dropout_rate=self.ff_dropout_rate,
            activation=self.activation,
            use_rel=self.use_rel,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
        )
        if self.arch == "conformer":
            kwargs["conv_kernel"] = self.conv_kernel

        for i in range(self.n_layer):
            # positional call: nn.remat's static_argnums indexes positions
            x = layer_cls(**kwargs, name=f"layer_{i}")(
                x, pos_emb, attn_mask, train)

        return LayerNorm(dtype=self.dtype, name="after_norm")(x)
