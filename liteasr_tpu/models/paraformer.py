"""Paraformer: non-autoregressive CIF model.

Reference: liteasr/models/paraformer.py:27-161 — conformer encoder, CIF
predictor, glancing-LM two-pass training (pass 1 no-grad argmax, sampler mix,
pass 2 with grads), inference = CIF + parallel decoder + argmax.
"""

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteasr_tpu.config import II, MISSING, LiteasrDataclass
from liteasr_tpu.models import LiteasrModel, register_model
from liteasr_tpu.nets.common import PositionalEncoding
from liteasr_tpu.nets.encoder import TransformerEncoder
from liteasr_tpu.nets.paraformer import ParallelDecoder, Predictor, glancing_sample
from liteasr_tpu.ops.masks import padding_mask

IGNORE = -1


@dataclass
class ParaformerConfig(LiteasrDataclass):
    name: Optional[str] = field(default="Paraformer")

    dropout_rate: float = 0.0

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

    sample_ratio: float = 0.75
    # Optional glancing-ratio schedule (GLAT-style): anneal sample_ratio ->
    # sample_ratio_end linearly over sample_ratio_decay_steps optimizer
    # steps. None/0 keeps the reference's constant ratio.
    sample_ratio_end: Optional[float] = None
    sample_ratio_decay_steps: int = 0
    # Reference parity mixes ground-truth embeddings during validation too
    # (glancing_sampler is not train-gated, liteasr/models/paraformer.py:
    # 104-122), which flatters valid CE in proportion to the leakage.
    # glance_at_eval=False scores validation with ratio 0 (no mixing) so
    # valid loss tracks the honest pure-CIF decode quality that N-best
    # checkpoint selection needs.
    glance_at_eval: bool = True
    # CIF path: None = size heuristic, False = lax.scan, True = closed-form
    # (see nets/paraformer.Predictor: the dense graph compiles slowly on the
    # remote-compile TPU tunnel; pass false for tunnel training runs).
    dense_cif: Optional[bool] = None

    vocab_size: int = MISSING
    dec_dim: int = 256
    dec_ff_dim: int = 2048
    dec_attn_heads: int = 4
    dec_dropout_rate: float = II("model.dropout_rate")
    dec_self_attn_dropout_rate: float = II("model.dec_dropout_rate")
    dec_src_attn_dropout_rate: float = II("model.dec_dropout_rate")
    dec_ff_dropout_rate: float = II("model.dec_dropout_rate")
    dec_layers: int = 6

    pos_dropout_rate: float = II("model.dec_dropout_rate")

    dtype: str = "float32"


@register_model("Paraformer", dataclass=ParaformerConfig)
class Paraformer(LiteasrModel):
    input_dim: int = 80
    vocab_size: int = 0
    dropout_rate: float = 0.0
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
    sample_ratio: float = 0.75
    sample_ratio_end: Optional[float] = None
    sample_ratio_decay_steps: int = 0
    glance_at_eval: bool = True
    dense_cif: Optional[bool] = None
    dec_dim: int = 256
    dec_ff_dim: int = 2048
    dec_attn_heads: int = 4
    dec_dropout_rate: float = 0.0
    dec_self_attn_dropout_rate: float = 0.0
    dec_src_attn_dropout_rate: float = 0.0
    dec_ff_dropout_rate: float = 0.0
    dec_layers: int = 6
    pos_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

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
            arch="conformer",
            dtype=self.dtype,
        )
        self.decoder = ParallelDecoder(
            vocab_size=self.vocab_size,
            ff_dim=self.dec_ff_dim,
            n_head=self.dec_attn_heads,
            n_layer=self.dec_layers,
            dropout_rate=self.dec_dropout_rate,
            self_attn_dropout_rate=self.dec_self_attn_dropout_rate,
            src_attn_dropout_rate=self.dec_src_attn_dropout_rate,
            ff_dropout_rate=self.dec_ff_dropout_rate,
            dtype=self.dtype,
        )
        self.embed = nn.Embed(self.vocab_size, self.dec_dim, dtype=self.dtype)
        self.pe = PositionalEncoding(self.pos_dropout_rate, dtype=self.dtype)
        self.predictor = Predictor(dtype=self.dtype,
                                   dense_cif=self.dense_cif)

    def _glance_ratio(self, train: bool, step):
        """Effective glancing ratio: scheduled during training, honest-or-
        reference at eval (see glance_at_eval)."""
        if not train and not self.glance_at_eval:
            return 0.0
        ratio = self.sample_ratio
        if (self.sample_ratio_end is not None
                and self.sample_ratio_decay_steps > 0 and step is not None):
            frac = jnp.clip(
                step.astype(jnp.float32) / self.sample_ratio_decay_steps,
                0.0, 1.0)
            ratio = ratio + (self.sample_ratio_end - ratio) * frac
        return ratio

    def __call__(self, xs, xlens, ys, ylens, train: bool = False, step=None):
        """Two-pass glancing training forward. Returns (hs_attn, sum_alpha).

        ``step`` (traced int scalar) drives the optional glancing-ratio
        schedule; the trainer threads it through ``batch["step"]``.
        """
        B, T = xs.shape[0], xs.shape[1]
        U = ys.shape[1]

        xs_mask = padding_mask(xlens, T)
        ys_in = jnp.where(ys == IGNORE, self.eos, ys)
        ys_mask = padding_mask(ylens, U)

        hs_enc = self.encoder(xs, mask=xs_mask, train=train)
        sampled_xlens = self.get_pred_len(xlens)
        hs_cif, sum_alpha = self.predictor(
            hs_enc, sampled_xlens, ylens, u_max=U)
        embed_ys = self.pe(self.embed(ys_in), train=train)

        # pass 1 (no grads): predict with raw CIF vectors
        hs_hat = self.decoder(
            jax.lax.stop_gradient(hs_cif),
            memory=jax.lax.stop_gradient(hs_enc),
            memory_mask=xs_mask, train=False)
        ys_hat = jnp.argmax(jax.lax.stop_gradient(hs_hat), axis=-1)
        ys_hat = jnp.where(ys_mask, self.eos, ys_hat)

        # glancing mix (PRNG-keyed; deterministic fallback without rng)
        if self.has_rng("dropout"):
            rng = self.make_rng("dropout")
        else:
            rng = jax.random.PRNGKey(0)
        hs_mix = glancing_sample(
            rng, hs_cif, embed_ys, ys_in, ys_hat, ylens,
            self._glance_ratio(train, step))

        # pass 2 (with grads)
        hs_attn = self.decoder(
            hs_mix, memory=hs_enc, memory_mask=xs_mask, train=train)
        return hs_attn, sum_alpha

    def decode(self, xs, xlens, u_max: int):
        """Inference: CIF (lengths from alpha) + parallel decode + argmax.
        Returns (token ids (B, u_max), ulens (B,))."""
        xs_mask = padding_mask(xlens, xs.shape[1])
        h = self.encoder(xs, mask=xs_mask, train=False)
        h_cif, sum_alpha = self.predictor(
            h, self.get_pred_len(xlens), None, u_max=u_max)
        h_attn = self.decoder(h_cif, memory=h, memory_mask=xs_mask,
                              train=False)
        hyp = jnp.argmax(h_attn, axis=-1)
        ulens = jnp.clip(jnp.round(sum_alpha).astype(jnp.int32), 0, u_max)
        return hyp, ulens

    # ---- criterion hooks (paraformer.py:131-140) ----

    def get_pred_len(self, xlens):
        return ((xlens - 1) // 2 - 1) // 2

    def get_target(self, ys, ylens):
        return ys

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
            sample_ratio=cfg.sample_ratio,
            sample_ratio_end=cfg.get("sample_ratio_end"),
            sample_ratio_decay_steps=int(
                cfg.get("sample_ratio_decay_steps") or 0),
            glance_at_eval=bool(cfg.get("glance_at_eval", True)),
            dec_dim=cfg.dec_dim,
            dec_ff_dim=cfg.dec_ff_dim,
            dec_attn_heads=cfg.dec_attn_heads,
            dec_dropout_rate=cfg.dec_dropout_rate,
            dec_self_attn_dropout_rate=cfg.dec_self_attn_dropout_rate,
            dec_src_attn_dropout_rate=cfg.dec_src_attn_dropout_rate,
            dec_ff_dropout_rate=cfg.dec_ff_dropout_rate,
            dec_layers=cfg.dec_layers,
            pos_dropout_rate=cfg.pos_dropout_rate,
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
