"""Transformer decoder (liteasr/nets/transformer_decoder.py:13-93).

embed -> PE -> N DecoderLayers (self + src attention) -> LayerNorm -> vocab
projection. The ``one_step`` path used by beam search recomputes the full
(fixed-length) prefix instead of the reference's python-list KV cache — under
a ``lax.scan``/``while_loop`` decode the static shape is what lets XLA compile
one program for all steps; the wasted prefix FLOPs ride the MXU.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

import math

from liteasr_tpu.nets.common import (
    LayerNorm,
    PositionalEncoding,
    sinusoidal_pe_at,
)
from liteasr_tpu.nets.encoder import subsample_mask
from liteasr_tpu.nets.layers import DecoderLayer


class TransformerDecoder(nn.Module):
    vocab_size: int
    h_dim: int
    ff_dim: int
    n_head: int
    n_layer: int
    dropout_rate: float
    pos_dropout_rate: float
    self_attn_dropout_rate: float
    src_attn_dropout_rate: float
    ff_dropout_rate: float
    # pre-LN (True, reference default) vs post-LN sublayers
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, memory, mask: Optional[jnp.ndarray] = None,
                 memory_mask: Optional[jnp.ndarray] = None,
                 memory_mask_presubsampled: bool = False,
                 train: bool = False, mode: str = "full", src_kv=None,
                 self_caches=None, index=None):
        """:param y: (B, L) token ids
        :param memory: (B, T', D) encoder output
        :param mask: (B, L, L) self-attention mask (True = masked)
        :param memory_mask: (B, T) original-resolution padding mask, subsampled
            here like the reference (transformer_decoder.py:83-88) — or already
            (B, T') if ``memory_mask_presubsampled``.

        Cached decoding (``mode``, re-design of the reference's step cache,
        liteasr/nets/transformer_decoder.py:58-68 + transformer_layer.py:40-47
        — scan-carried fixed-shape K/V instead of growing python lists):

        * "prime": project every layer's source K/V from ``memory`` once;
          returns a list of (k, v) pairs, each (B, T', H, Dk).
        * "step": one token step. ``y`` is (B,) token ids at position
          ``index``; ``src_kv`` is the primed list; ``self_caches`` is a
          per-layer list of {"k","v"} (B, L, H, Dk). ``memory_mask`` must
          already be (B, 1, 1, T'). Returns (logits (B, V), new caches).
        """
        if mode == "prime":
            return [self._layer(i)(None, memory, mode="prime")
                    for i in range(self.n_layer)]

        if mode == "step":
            y = nn.Embed(self.vocab_size, self.h_dim, dtype=self.dtype,
                         name="embed")(y[:, None])  # (B, 1, D)
            y = y * math.sqrt(self.h_dim) + sinusoidal_pe_at(
                index, self.h_dim, y.dtype)
            new_caches = []
            for i in range(self.n_layer):
                y, c = self._layer(i)(
                    y, None, memory_mask=memory_mask, mode="step",
                    cache={"self": self_caches[i], "src": src_kv[i]},
                    index=index)
                new_caches.append(c)
            y = LayerNorm(dtype=self.dtype, name="after_norm")(y)
            logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                              name="linear_out")(y)
            return logits[:, 0], new_caches

        y = nn.Embed(self.vocab_size, self.h_dim, dtype=self.dtype,
                     name="embed")(y)
        y = PositionalEncoding(self.pos_dropout_rate, dtype=self.dtype,
                               name="pe")(y, train)

        if mask is not None:
            mask = mask[:, None, :, :]  # (B, 1, L, L)
        if memory_mask is not None:
            if not memory_mask_presubsampled:
                memory_mask = subsample_mask(memory_mask)
            memory_mask = memory_mask[:, None, None, :]  # (B, 1, 1, T')

        for i in range(self.n_layer):
            y = DecoderLayer(
                n_head=self.n_head,
                ff_dim=self.ff_dim,
                dropout_rate=self.dropout_rate,
                self_attn_dropout_rate=self.self_attn_dropout_rate,
                src_attn_dropout_rate=self.src_attn_dropout_rate,
                ff_dropout_rate=self.ff_dropout_rate,
                normalize_before=self.normalize_before,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(y, memory, mask=mask, memory_mask=memory_mask, train=train)

        y = LayerNorm(dtype=self.dtype, name="after_norm")(y)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="linear_out")(y)

    def _layer(self, i: int) -> DecoderLayer:
        return DecoderLayer(
            n_head=self.n_head,
            ff_dim=self.ff_dim,
            dropout_rate=self.dropout_rate,
            self_attn_dropout_rate=self.self_attn_dropout_rate,
            src_attn_dropout_rate=self.src_attn_dropout_rate,
            ff_dropout_rate=self.ff_dropout_rate,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
            name=f"layer_{i}",
        )
