"""U2: hybrid CTC/attention Conformer ASR model.

Reference: liteasr/models/u2.py:35-364 (config schema :35-67, forward
:116-159, target construction :323-333, pred_len :319-321, special ids
:111-114 — blank=0, sos=eos=V-1, ignore=-1).

Decoding (attention beam search, CTC prefix beam search, attention rescoring,
u2.py:164-317) lives in :mod:`liteasr_tpu.decode` as batched compiled loops.
"""

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from liteasr_tpu.config import II, MISSING, LiteasrDataclass
from liteasr_tpu.models import LiteasrModel, register_model
from liteasr_tpu.nets.decoder import TransformerDecoder
from liteasr_tpu.nets.encoder import TransformerEncoder
from liteasr_tpu.ops.masks import padding_mask, triangle_mask

IGNORE = -1
BLANK = 0


@dataclass
class U2Config(LiteasrDataclass):
    name: Optional[str] = field(default="U2")

    dropout_rate: float = 0.0

    # shared encoder
    enc_arch: str = "conformer"  # transformer | conformer
    use_rel: bool = True
    input_dim: int = MISSING
    enc_dim: int = 256
    enc_ff_dim: int = 2048
    enc_attn_heads: int = 4
    enc_dropout_rate: float = II("model.dropout_rate")
    enc_pos_dropout_rate: float = II("model.enc_dropout_rate")
    enc_attn_dropout_rate: float = II("model.enc_dropout_rate")
    enc_ff_dropout_rate: float = II("model.enc_dropout_rate")
    enc_layers: int = 12
    activation: str = "swish"
    # streaming: chunked causal encoder attention (0 = offline full context)
    static_chunk_size: int = 0
    # dynamic chunk training: random chunk width per step (streaming-capable
    # model from one training run)
    dynamic_chunk: bool = False
    # rematerialize encoder layers (memory for FLOPs)
    remat: bool = False
    # pre-LN (True, reference default) vs post-LN sublayers
    # (liteasr/nets/transformer_layer.py:17)
    normalize_before: bool = True

    # attention decoder
    dec_arch: str = "transformer"
    vocab_size: int = MISSING
    dec_dim: int = 256
    dec_ff_dim: int = 2048
    dec_attn_heads: int = 4
    dec_dropout_rate: float = II("model.dropout_rate")
    dec_pos_dropout_rate: float = II("model.dec_dropout_rate")
    dec_self_attn_dropout_rate: float = II("model.dec_dropout_rate")
    dec_src_attn_dropout_rate: float = II("model.dec_dropout_rate")
    dec_ff_dropout_rate: float = II("model.dec_dropout_rate")
    dec_layers: int = 6

    # compute dtype for the forward pass ("bfloat16" rides the MXU)
    dtype: str = "float32"


@register_model("U2", dataclass=U2Config)
class U2(LiteasrModel):
    input_dim: int = 80
    vocab_size: int = 0
    dropout_rate: float = 0.0
    enc_arch: str = "conformer"
    use_rel: bool = True
    enc_dim: int = 256
    enc_ff_dim: int = 2048
    enc_attn_heads: int = 4
    enc_dropout_rate: float = 0.0
    enc_pos_dropout_rate: float = 0.0
    enc_attn_dropout_rate: float = 0.0
    enc_ff_dropout_rate: float = 0.0
    enc_layers: int = 12
    activation: str = "swish"
    static_chunk_size: int = 0
    dynamic_chunk: bool = False
    remat: bool = False
    normalize_before: bool = True
    dec_dim: int = 256
    dec_ff_dim: int = 2048
    dec_attn_heads: int = 4
    dec_dropout_rate: float = 0.0
    dec_pos_dropout_rate: float = 0.0
    dec_self_attn_dropout_rate: float = 0.0
    dec_src_attn_dropout_rate: float = 0.0
    dec_ff_dropout_rate: float = 0.0
    dec_layers: int = 6
    dtype: jnp.dtype = jnp.float32

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def setup(self):
        self.encoder = TransformerEncoder(
            use_rel=self.use_rel,
            h_dim=self.enc_dim,
            ff_dim=self.enc_ff_dim,
            n_head=self.enc_attn_heads,
            n_layer=self.enc_layers,
            dropout_rate=self.enc_dropout_rate,
            pos_dropout_rate=self.enc_pos_dropout_rate,
            attn_dropout_rate=self.enc_attn_dropout_rate,
            ff_dropout_rate=self.enc_ff_dropout_rate,
            activation=self.activation,
            arch=self.enc_arch,
            static_chunk_size=self.static_chunk_size,
            dynamic_chunk=self.dynamic_chunk,
            remat=self.remat,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
        )
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size,
            h_dim=self.dec_dim,
            ff_dim=self.dec_ff_dim,
            n_head=self.dec_attn_heads,
            n_layer=self.dec_layers,
            dropout_rate=self.dec_dropout_rate,
            pos_dropout_rate=self.dec_pos_dropout_rate,
            self_attn_dropout_rate=self.dec_self_attn_dropout_rate,
            src_attn_dropout_rate=self.dec_src_attn_dropout_rate,
            ff_dropout_rate=self.dec_ff_dropout_rate,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
        )
        self.ctc_dropout = nn.Dropout(self.dropout_rate)
        self.ctc_lo = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, xs, xlens, ys, ylens, train: bool = False):
        """Training forward: returns (h_attn (B,L+1,V), h_ctc (B,T',V)).

        Reference semantics: liteasr/models/u2.py:116-159 + _preprocess
        :339-358 (ignore->eos, prepend sos, pad|causal decoder mask).
        """
        B, T = xs.shape[0], xs.shape[1]
        L = ys.shape[1]

        xs_mask = padding_mask(xlens, T)

        ys_ = jnp.where(ys == IGNORE, self.eos, ys)
        sos_col = jnp.full((B, 1), self.sos, dtype=ys.dtype)
        ys_in = jnp.concatenate([sos_col, ys_], axis=1)  # (B, L+1)
        ys_mask = padding_mask(ylens + 1, L + 1)  # (B, L+1)

        h_enc = self.encoder(xs, mask=xs_mask, train=train)

        dec_mask = triangle_mask(L + 1)
        ys_attn_mask = ys_mask[:, None, :] | dec_mask[None].astype(bool)
        h_attn = self.decoder(
            ys_in, h_enc, mask=ys_attn_mask, memory_mask=xs_mask, train=train)

        h_ctc = self.ctc_lo(self.ctc_dropout(h_enc, deterministic=not train))
        return h_attn, h_ctc

    def encode(self, xs, xlens, train: bool = False):
        """Encoder-only forward for decoding. Returns (h_enc, enc_mask)."""
        xs_mask = padding_mask(xlens, xs.shape[1])
        h_enc = self.encoder(xs, mask=xs_mask, train=train)
        from liteasr_tpu.nets.encoder import subsample_mask

        return h_enc, subsample_mask(xs_mask)

    def ctc_logits(self, h_enc):
        return self.ctc_lo(h_enc)

    def encode_chunk(self, window, caches, index, kv_lens, pe_len: int):
        """One streaming encoder step (liteasr_tpu/streaming.py): raw conv
        window -> chunk hidden states + CTC logits + updated KV caches."""
        h, new_caches = self.encoder(
            window, mode="chunk", caches=caches, index=index,
            kv_lens=kv_lens, pe_len=pe_len)
        return h, self.ctc_lo(h), new_caches

    def decode_logits(self, ys_in, h_enc, mask=None, enc_mask=None):
        """Decoder forward over already-subsampled memory (for beam search)."""
        return self.decoder(
            ys_in, h_enc, mask=mask, memory_mask=enc_mask,
            memory_mask_presubsampled=True, train=False)

    def decode_prime(self, h_enc):
        """Project per-layer source K/V once for cached beam search."""
        return self.decoder(None, h_enc, mode="prime")

    def decode_step(self, tok, src_kv, self_caches, index, enc_mask=None):
        """One KV-cached decoder step: tok (B,) at position ``index``."""
        mem_mask = enc_mask[:, None, None, :] if enc_mask is not None else None
        return self.decoder(tok, None, memory_mask=mem_mask, mode="step",
                            src_kv=src_kv, self_caches=self_caches,
                            index=index)

    # ---- criterion hooks (pure functions; liteasr/models/u2.py:319-337) ----

    def get_pred_len(self, xlens):
        return ((xlens - 1) // 2 - 1) // 2

    def get_target(self, ys, ylens):
        B, L = ys.shape
        ignore_col = jnp.full((B, 1), IGNORE, dtype=ys.dtype)
        tgt_attn = jnp.concatenate([ys, ignore_col], axis=1)  # (B, L+1)
        tgt_attn = tgt_attn.at[jnp.arange(B), ylens].set(self.eos)
        tgt_ctc = ys
        return tgt_attn, tgt_ctc

    def get_target_len(self, ylens):
        return ylens

    @classmethod
    def build_model(cls, cfg, task=None):
        if task is not None:
            cfg.input_dim = task.feat_dim
            cfg.vocab_size = task.vocab_size
        return cls(
            input_dim=int(cfg.input_dim),
            vocab_size=int(cfg.vocab_size),
            dropout_rate=cfg.dropout_rate,
            enc_arch=str(cfg.enc_arch),
            use_rel=bool(cfg.use_rel),
            enc_dim=cfg.enc_dim,
            enc_ff_dim=cfg.enc_ff_dim,
            enc_attn_heads=cfg.enc_attn_heads,
            enc_dropout_rate=cfg.enc_dropout_rate,
            enc_pos_dropout_rate=cfg.enc_pos_dropout_rate,
            enc_attn_dropout_rate=cfg.enc_attn_dropout_rate,
            enc_ff_dropout_rate=cfg.enc_ff_dropout_rate,
            enc_layers=cfg.enc_layers,
            activation=cfg.activation,
            static_chunk_size=int(cfg.get("static_chunk_size", 0)),
            dynamic_chunk=bool(cfg.get("dynamic_chunk", False)),
            remat=bool(cfg.get("remat", False)),
            normalize_before=bool(cfg.get("normalize_before", True)),
            dec_dim=cfg.dec_dim,
            dec_ff_dim=cfg.dec_ff_dim,
            dec_attn_heads=cfg.dec_attn_heads,
            dec_dropout_rate=cfg.dec_dropout_rate,
            dec_pos_dropout_rate=cfg.dec_pos_dropout_rate,
            dec_self_attn_dropout_rate=cfg.dec_self_attn_dropout_rate,
            dec_src_attn_dropout_rate=cfg.dec_src_attn_dropout_rate,
            dec_ff_dropout_rate=cfg.dec_ff_dropout_rate,
            dec_layers=cfg.dec_layers,
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
