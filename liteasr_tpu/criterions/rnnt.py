"""RNN-T criterion (reference: liteasr/criterions/rnnt.py:16-70).

Both of the reference's external native backends (warp-transducer C++/CUDA
and warp_rnnt CUDA) are replaced by the in-repo TPU lattice DP
(liteasr_tpu/ops/rnnt.py). Reduction is the batch mean, matching the warp
libraries' default.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.criterions import LiteasrLoss, register_criterion
from liteasr_tpu.ops.rnnt import rnnt_loss


@dataclass
class RNNTLossConfig(LiteasrDataclass):
    name: Optional[str] = field(default="rnnt")
    trans_type: str = "tpu-lattice"  # kept for config-surface parity
    blank_id: int = 0


@register_criterion("rnnt", dataclass=RNNTLossConfig)
class RNNTLoss(LiteasrLoss):
    def __init__(self, cfg, task=None):
        super().__init__(cfg)
        self.blank_id = int(cfg.blank_id)

    @classmethod
    def build_criterion(cls, cfg, task=None):
        return cls(cfg, task)

    def __call__(self, model, variables, batch, rngs=None, train: bool = True):
        xs, xlens, ys, ylens = (
            batch["xs"], batch["xlens"], batch["ys"], batch["ylens"])
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(xs.shape[0], dtype=jnp.float32)
        nutt = jnp.maximum(valid.sum(), 1.0)

        if train:
            logits, new_model_state = model.apply(
                variables, xs, xlens, ys, ylens, train=True,
                rngs=rngs, mutable=["batch_stats"])
        else:
            logits = model.apply(variables, xs, xlens, ys, ylens, train=False)
            new_model_state = {}

        per_utt = rnnt_loss(
            logits,
            model.get_target(ys, ylens),
            model.get_pred_len(xlens),
            model.get_target_len(ylens),
            blank=self.blank_id,
        )
        loss = (per_utt * valid).sum() / nutt
        return loss, {"model_state": new_model_state}
