"""Criterion framework. Reference: liteasr/criterions/__init__.py:16-69.

A criterion is a *pure function* of (model, variables, batch, rng) returning a
scalar loss — it is traced inside the jitted train step, so it must be
jax-transformable. The criterion calls the model itself, like the reference
(e.g. liteasr/criterions/hybrid_ctc_attn.py:41).
"""

import importlib
import os
from typing import Dict, Optional

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.config.core import ConfigStore, DotDict, _deep_merge, _node_to_dict

CRITERION_REGISTRY: Dict[str, type] = {}
CRITERION_DATACLASS_REGISTRY: Dict[str, type] = {}


class LiteasrLoss:
    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, model, variables, batch, rngs=None, train=True):
        """Return (scalar loss, aux dict). Must be jit-traceable."""
        raise NotImplementedError

    def init_variables(self, model, rng, batch):
        """Initialize model variables for this criterion's batch layout."""
        return model.init(
            {"params": rng}, batch["xs"], batch["xlens"], batch["ys"],
            batch["ylens"], train=False)

    @classmethod
    def build_criterion(cls, cfg, task=None):
        return cls(cfg, task)


def register_criterion(name: str, dataclass: Optional[type] = None):
    def register_criterion_cls(cls):
        if name in CRITERION_REGISTRY:
            raise ValueError(f"duplicate criterion name {name}")
        CRITERION_REGISTRY[name] = cls
        if dataclass is not None:
            assert issubclass(dataclass, LiteasrDataclass)
            CRITERION_DATACLASS_REGISTRY[name] = dataclass
            node = _node_to_dict(dataclass)
            node["name"] = name
            ConfigStore.instance().store(name=name, node=dataclass, group="criterion")
        return cls

    return register_criterion_cls


def build_criterion(cfg, task=None) -> LiteasrLoss:
    name = cfg.get("name") if isinstance(cfg, dict) else getattr(cfg, "name", None)
    if name is None or name not in CRITERION_REGISTRY:
        raise ValueError(
            f"unknown criterion '{name}' (known: {sorted(CRITERION_REGISTRY)})"
        )
    dc = CRITERION_DATACLASS_REGISTRY.get(name)
    merged = dict(cfg) if isinstance(cfg, dict) else {}
    if dc is not None:
        merged = _deep_merge(_node_to_dict(dc), merged)
        merged["name"] = name
    if isinstance(cfg, dict):
        cfg.clear()
        cfg.update(merged)
        cfg = DotDict(cfg)
    return CRITERION_REGISTRY[name].build_criterion(cfg, task)


_dir = os.path.dirname(__file__)
for _file in sorted(os.listdir(_dir)):
    if _file.endswith(".py") and not _file.startswith("_"):
        importlib.import_module("liteasr_tpu.criterions." + _file[: -len(".py")])
