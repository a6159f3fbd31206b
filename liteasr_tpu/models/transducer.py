"""Transducer (RNN-T) model.

Reference: liteasr/models/transducer.py:50-257 — Transformer/Conformer
encoder + LSTM prediction network + additive tanh joint; forward broadcasts
enc (B,T,1,D) + dec (B,1,U+1,D) into the (B,T,U+1,V) joint lattice
(:131-135); greedy/beam decoding lives in liteasr_tpu.decode (the reference's
python per-frame beam, :137-206, becomes a compiled greedy scan plus a
host-driven beam with jitted steps).
"""

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from liteasr_tpu.config import II, MISSING, LiteasrDataclass
from liteasr_tpu.models import LiteasrModel, register_model
from liteasr_tpu.nets.encoder import TransformerEncoder
from liteasr_tpu.nets.rnn_decoder import RNNDecoder
from liteasr_tpu.ops.masks import padding_mask

IGNORE = -1
BLANK = 0


@dataclass
class TransducerConfig(LiteasrDataclass):
    name: Optional[str] = field(default="transducer")

    joint_dim: int = 768
    dropout_rate: float = 0.0

    enc_arch: str = "transformer"
    use_rel: bool = True
    input_dim: int = MISSING
    enc_dim: int = 256
    enc_ff_dim: int = 2048
    enc_attn_heads: int = 4
    enc_dropout_rate: float = II("model.dropout_rate")
    enc_pos_dropout_rate: float = II("model.enc_dropout_rate")
    enc_attn_dropout_rate: float = II("model.enc_dropout_rate")
    enc_ff_dropout_rate: float = II("model.enc_dropout_rate")
    enc_layers: int = 4
    activation: str = "relu"

    dec_arch: str = "lstm"
    vocab_size: int = MISSING
    dec_dim: int = 256
    dec_units: int = 2048
    dec_dropout_rate: float = II("model.dropout_rate")
    dec_layers: int = 2

    dtype: str = "float32"


@register_model("transducer", dataclass=TransducerConfig)
class Transducer(LiteasrModel):
    input_dim: int = 80
    vocab_size: int = 0
    joint_dim: int = 768
    dropout_rate: float = 0.0
    enc_arch: str = "transformer"
    use_rel: bool = True
    enc_dim: int = 256
    enc_ff_dim: int = 2048
    enc_attn_heads: int = 4
    enc_dropout_rate: float = 0.0
    enc_pos_dropout_rate: float = 0.0
    enc_attn_dropout_rate: float = 0.0
    enc_ff_dropout_rate: float = 0.0
    enc_layers: int = 4
    activation: str = "relu"
    dec_dim: int = 256
    dec_units: int = 2048
    dec_dropout_rate: float = 0.0
    dec_layers: int = 2
    dtype: jnp.dtype = jnp.float32

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
            dtype=self.dtype,
        )
        self.decoder = RNNDecoder(
            vocab_size=self.vocab_size,
            h_dim=self.dec_dim,
            h_units=self.dec_units,
            n_layer=self.dec_layers,
            dropout_rate=self.dec_dropout_rate,
            dtype=self.dtype,
        )
        self.lin_enc = nn.Dense(self.joint_dim, dtype=self.dtype)
        self.lin_dec = nn.Dense(self.joint_dim, use_bias=False,
                                dtype=self.dtype)
        self.lin_jnt = nn.Dense(self.vocab_size, dtype=self.dtype)

    def joint(self, h_enc, h_dec):
        """tanh(lin_enc(h_enc) + lin_dec(h_dec)) -> vocab
        (reference transducer.py:220-224). Shapes broadcast."""
        return self.lin_jnt(jnp.tanh(self.lin_enc(h_enc) + self.lin_dec(h_dec)))

    def __call__(self, xs, xlens, ys, ylens, train: bool = False):
        """Returns the joint lattice (B, T', U+1, V)."""
        B = xs.shape[0]
        xs_mask = padding_mask(xlens, xs.shape[1])
        ys_ = jnp.where(ys == IGNORE, BLANK, ys)
        blank_col = jnp.full((B, 1), BLANK, dtype=ys.dtype)
        ys_in = jnp.concatenate([blank_col, ys_], axis=1)  # (B, U+1)

        h_enc = self.encoder(xs, mask=xs_mask, train=train)  # (B, T', D)
        h_dec = self.decoder(ys_in, train=train)  # (B, U+1, D')

        return self.joint(h_enc[:, :, None, :], h_dec[:, None, :, :])

    def encode(self, xs, xlens, train: bool = False):
        xs_mask = padding_mask(xlens, xs.shape[1])
        h_enc = self.encoder(xs, mask=xs_mask, train=train)
        from liteasr_tpu.nets.encoder import subsample_mask

        return h_enc, subsample_mask(xs_mask)

    def decoder_init_state(self, batch: int):
        return self.decoder.init_state(batch)

    def decoder_step(self, tok, state):
        return self.decoder.step(tok, state)

    def post_init_params(self, params):
        """Reference _init_module (transducer.py:243-251): forget-gate bias
        of every prediction-network LSTM layer initialized to 1."""
        from liteasr_tpu.nets.rnn_decoder import forget_bias_ones

        return {**params, "decoder": forget_bias_ones(params["decoder"])}

    # ---- criterion hooks (transducer.py:208-218) ----

    def get_pred_len(self, xlens):
        return ((xlens - 1) // 2 - 1) // 2

    def get_target(self, ys, ylens):
        return jnp.where(ys == IGNORE, BLANK, ys)

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
            joint_dim=cfg.joint_dim,
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
            dec_dim=cfg.dec_dim,
            dec_units=cfg.dec_units,
            dec_dropout_rate=cfg.dec_dropout_rate,
            dec_layers=cfg.dec_layers,
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
