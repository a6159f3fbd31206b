"""Noam (inverse-sqrt warmup) schedule on Adam.

Reference: liteasr/optims/noam.py:10-58 —
``lr(step) = factor * d^-0.5 * min(step^-0.5, step * warmup^-1.5)`` with
step counting from 1, beta2=0.98, eps=1e-9, warmup=25000.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import optax

from liteasr_tpu.optims import LiteasrOptimizer, register_optimizer
from liteasr_tpu.optims.adam import AdamConfig


@dataclass
class NoamConfig(AdamConfig):
    name: Optional[str] = field(default="noam")
    beta2: float = 0.98
    eps: float = 1e-9
    model_dim: int = 256
    factor: float = 1.0
    warmup: int = 25000


def noam_schedule(model_dim: int, factor: float, warmup: int):
    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)  # optax steps are 0-based
        return factor * model_dim ** (-0.5) * jnp.minimum(
            s ** (-0.5), s * warmup ** (-1.5))

    return schedule


@register_optimizer("noam", dataclass=NoamConfig)
class Noam(LiteasrOptimizer):
    @classmethod
    def build_optimizer(cls, cfg, task=None):
        schedule = noam_schedule(cfg.model_dim, cfg.factor, cfg.warmup)
        parts = []
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts += [
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        ]
        return cls(cfg, optax.chain(*parts), schedule=schedule)
