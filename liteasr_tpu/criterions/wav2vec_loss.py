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
    # codebook diversity penalty (fairseq's prob_perplexity loss). The
    # reference criterion is plain CE (wav2vec_loss.py:15-37) with no
    # diversity term, so 0.0 keeps parity — but without it the Gumbel-VQ
    # codebook can collapse to one code per group, making every negative
    # equal the positive (all masked to -inf) and the task degenerate.
    diversity_weight: float = 0.0


@register_criterion("wav2vec", dataclass=Wav2Vec2LossConfig)
class Wav2Vec2Loss(LiteasrLoss):
    def __init__(self, cfg, task=None):
        super().__init__(cfg)
        self.diversity_weight = float(cfg.get("diversity_weight", 0.0))

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
            (logits, mask, code_probs), new_model_state = model.apply(
                variables, xs, xlens=xlens, train=True, temp=temp, rngs=rngs,
                mutable=["batch_stats"])
        else:
            logits, mask, code_probs = model.apply(
                variables, xs, xlens=xlens, train=False, temp=temp,
                rngs=rngs)
            new_model_state = {}

        # logits: (N+1, B, F); positive at index 0. `mask` is already
        # restricted to valid (non-padding) frames by the model.
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=0)  # over candidates
        nll = -logp[0]  # (B, F)
        weight = mask.astype(jnp.float32) * valid[:, None]
        denom = jnp.maximum(weight.sum(), 1.0)
        loss = (nll * weight).sum() / denom

        # codebook usage: per-group perplexity of the (mask-weighted)
        # average code distribution. The diversity penalty pushes toward
        # uniform usage, exactly fairseq's (GV - sum ppl) / GV.
        code_probs = code_probs.astype(jnp.float32)  # (G, V)
        ppl = jnp.exp(-jnp.sum(
            code_probs * jnp.log(code_probs + 1e-9), axis=-1))  # (G,)
        n_codes = code_probs.shape[0] * code_probs.shape[1]
        if self.diversity_weight:
            loss = loss + self.diversity_weight * (
                n_codes - ppl.sum()) / n_codes

        # accuracy over masked frames (observability)
        correct = (jnp.argmax(logits, axis=0) == 0).astype(jnp.float32)
        acc = (correct * weight).sum() / denom
        return loss, {"accuracy": acc, "code_ppl": ppl.sum(),
                      "model_state": new_model_state}
