"""Paraformer loss: CE (ignore -1, mean) + MAE on sum(alpha) vs ylens.

Reference: liteasr/criterions/paraformer_loss.py:19-56.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from liteasr_tpu.config import MISSING, LiteasrDataclass
from liteasr_tpu.criterions import LiteasrLoss, register_criterion


@dataclass
class ParaformerLossConfig(LiteasrDataclass):
    name: Optional[str] = field(default="paraformer_loss")
    vocab_size: int = MISSING
    gamma: float = 1.0


@register_criterion("paraformer_loss", dataclass=ParaformerLossConfig)
class ParaformerLoss(LiteasrLoss):
    def __init__(self, cfg, task=None):
        super().__init__(cfg)
        self.vocab_size = int(cfg.vocab_size)
        self.gamma = float(cfg.gamma)

    @classmethod
    def build_criterion(cls, cfg, task=None):
        if task is not None:
            cfg.vocab_size = task.vocab_size
        return cls(cfg, task)

    def __call__(self, model, variables, batch, rngs=None, train: bool = True):
        xs, xlens, ys, ylens = (
            batch["xs"], batch["xlens"], batch["ys"], batch["ylens"])
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(xs.shape[0], dtype=jnp.float32)

        if train:
            (hs_attn, sum_alpha), new_model_state = model.apply(
                variables, xs, xlens, ys, ylens, train=True,
                step=batch.get("step"),
                rngs=rngs, mutable=["batch_stats"])
        else:
            hs_attn, sum_alpha = model.apply(
                variables, xs, xlens, ys, ylens, train=False,
                rngs=rngs)
            new_model_state = {}

        tgt = model.get_target(ys, ylens)  # (B, U) with -1 ignored
        tgt = jnp.where(valid[:, None] > 0, tgt, -1)

        # CE from raw logits: nll = lse(h) - h_tgt; the (N, V) fp32
        # log-softmax table is never materialized (fused reductions only)
        h = hs_attn.reshape(-1, self.vocab_size)
        lse = jax.nn.logsumexp(h.astype(jnp.float32), axis=-1)
        tgt_flat = tgt.reshape(-1)
        ignore = tgt_flat == -1
        h_tgt = jnp.take_along_axis(
            h, jnp.where(ignore, 0, tgt_flat)[:, None], axis=1
        )[:, 0].astype(jnp.float32)
        nll = lse - h_tgt
        n_tok = jnp.maximum((~ignore).sum(), 1)
        loss_ce = jnp.where(ignore, 0.0, nll).sum() / n_tok

        # MAE between predicted total alpha and true target length
        mae = jnp.abs(sum_alpha - ylens.astype(jnp.float32))
        nutt = jnp.maximum(valid.sum(), 1.0)
        loss_mae = (mae * valid).sum() / nutt

        loss = self.gamma * loss_ce + loss_mae
        return loss, {"loss_ce": loss_ce, "loss_mae": loss_mae,
                      "model_state": new_model_state}
