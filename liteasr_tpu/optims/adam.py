"""Adam optimizer (optax). Reference: liteasr/optims/adam.py:12-38."""

from dataclasses import dataclass, field
from typing import Optional

import optax

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.optims import LiteasrOptimizer, register_optimizer


@dataclass
class AdamConfig(LiteasrDataclass):
    name: Optional[str] = field(default="adam")
    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    amsgrad: bool = False


@register_optimizer("adam", dataclass=AdamConfig)
class Adam(LiteasrOptimizer):
    @classmethod
    def build_optimizer(cls, cfg, task=None):
        parts = []
        if cfg.weight_decay:
            # torch Adam's weight_decay adds wd * param to the gradient
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        scale = (optax.scale_by_amsgrad if cfg.amsgrad else optax.scale_by_adam)(
            b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps)
        parts += [scale, optax.scale(-cfg.lr)]
        return cls(cfg, optax.chain(*parts))
