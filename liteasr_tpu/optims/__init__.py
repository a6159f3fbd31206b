"""Optimizer framework. Reference: liteasr/optims/__init__.py:16-101.

TPU-native redesign: an optimizer is an ``optax.GradientTransformation`` (plus
an optional schedule); the trainer owns the opt-state inside its TrainState
pytree, so optimizers here are pure factories.
"""

import importlib
import os
from typing import Dict, Optional

import optax

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.config.core import ConfigStore, DotDict, _deep_merge, _node_to_dict

OPTIMIZER_REGISTRY: Dict[str, type] = {}
OPTIMIZER_DATACLASS_REGISTRY: Dict[str, type] = {}


class LiteasrOptimizer:
    """Wraps an optax transformation + optional LR schedule for logging."""

    def __init__(self, cfg, tx: optax.GradientTransformation, schedule=None):
        self.cfg = cfg
        self.tx = tx
        self.schedule = schedule  # step -> lr, for reporting

    def current_lr(self, step: int) -> float:
        if self.schedule is None:
            return float(self.cfg.get("lr", 0.0))
        return float(self.schedule(step))

    @classmethod
    def build_optimizer(cls, cfg, task=None):
        raise NotImplementedError


def register_optimizer(name: str, dataclass: Optional[type] = None):
    def register_optimizer_cls(cls):
        if name in OPTIMIZER_REGISTRY:
            raise ValueError(f"duplicate optimizer name {name}")
        OPTIMIZER_REGISTRY[name] = cls
        if dataclass is not None:
            assert issubclass(dataclass, LiteasrDataclass)
            OPTIMIZER_DATACLASS_REGISTRY[name] = dataclass
            node = _node_to_dict(dataclass)
            node["name"] = name
            ConfigStore.instance().store(name=name, node=dataclass, group="optimizer")
        return cls

    return register_optimizer_cls


# keep the reference's (typo'd) public alias for API parity
# (liteasr/optims/__init__.py:73 `register_optimzer`)
register_optimzer = register_optimizer


def build_optimizer(cfg, task=None) -> LiteasrOptimizer:
    name = cfg.get("name") if isinstance(cfg, dict) else getattr(cfg, "name", None)
    if name is None or name not in OPTIMIZER_REGISTRY:
        raise ValueError(
            f"unknown optimizer '{name}' (known: {sorted(OPTIMIZER_REGISTRY)})"
        )
    dc = OPTIMIZER_DATACLASS_REGISTRY.get(name)
    merged = dict(cfg) if isinstance(cfg, dict) else {}
    if dc is not None:
        merged = _deep_merge(_node_to_dict(dc), merged)
        merged["name"] = name
    if isinstance(cfg, dict):
        cfg.clear()
        cfg.update(merged)
        cfg = DotDict(cfg)
    return OPTIMIZER_REGISTRY[name].build_optimizer(cfg, task)


_dir = os.path.dirname(__file__)
for _file in sorted(os.listdir(_dir)):
    if _file.endswith(".py") and not _file.startswith("_"):
        importlib.import_module("liteasr_tpu.optims." + _file[: -len(".py")])
