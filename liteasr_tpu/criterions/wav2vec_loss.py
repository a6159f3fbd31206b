"""wav2vec 2.0 contrastive loss.

Reference: liteasr/criterions/wav2vec_loss.py:15-37 — CE over (M*B, N+1)
logits with the positive at index 0. Here the masked-frame gather is replaced
by a mask-weighted CE over all frames (fixed shapes; see models/wav2vec2.py).
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.criterions import LiteasrLoss, register_criterion


@dataclass
class Wav2Vec2LossConfig(LiteasrDataclass):
    name: Optional[str] = field(default="wav2vec")
    infonce: bool = False


@register_criterion("wav2vec", dataclass=Wav2Vec2LossConfig)
class Wav2Vec2Loss(LiteasrLoss):
    def __init__(self, cfg, task=None):
        super().__init__(cfg)

    @classmethod
    def build_criterion(cls, cfg, task=None):
        return cls(cfg, task)

    def init_variables(self, model, rng, batch):
        return model.init({"params": rng}, batch["xs"],
                          xlens=batch.get("xlens"), train=False)

    def __call__(self, model, variables, batch, rngs=None, train: bool = True):
        xs = batch["xs"]  # (B, T) raw waveform
        xlens = batch.get("xlens")  # (B,) valid sample counts (optional)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(xs.shape[0], dtype=jnp.float32)

        # gumbel temperature anneal: max_t * decay^step clipped at min_t.
        # (The reference defines latent_temp=(start, end, decay) but never
        # advances it — curr_temp stays at start; here the anneal actually
        # runs off the trainer's step counter in batch["step"].)
        lt = getattr(model, "latent_temp", (2.0, 0.5, 0.999995))
        step = batch.get("step")
        if step is not None:
            temp = jnp.maximum(
                lt[0] * jnp.power(jnp.float32(lt[2]),
                                  step.astype(jnp.float32)), lt[1])
        else:
            temp = batch.get("gumbel_temp", lt[0])

        if train:
            (logits, mask), new_model_state = model.apply(
                variables, xs, xlens=xlens, train=True, temp=temp, rngs=rngs,
                mutable=["batch_stats"])
        else:
            logits, mask = model.apply(variables, xs, xlens=xlens,
                                       train=False, temp=temp, rngs=rngs)
            new_model_state = {}

        # logits: (N+1, B, F); positive at index 0. `mask` is already
        # restricted to valid (non-padding) frames by the model.
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=0)  # over candidates
        nll = -logp[0]  # (B, F)
        weight = mask.astype(jnp.float32) * valid[:, None]
        denom = jnp.maximum(weight.sum(), 1.0)
        loss = (nll * weight).sum() / denom

        # accuracy over masked frames (observability)
        correct = (jnp.argmax(logits, axis=0) == 0).astype(jnp.float32)
        acc = (correct * weight).sum() / denom
        return loss, {"accuracy": acc, "model_state": new_model_state}
