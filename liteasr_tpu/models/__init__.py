"""Model framework: flax module base + name registry.

Reference: liteasr/models/__init__.py:21-111 (LiteasrModel base, build_model
merging dataclass defaults with the composed config and writing the completed
config back, registry decorator + ConfigStore registration, auto-import).

TPU-native redesign: models are flax ``nn.Module``s (pure functions of
params), so "state_dict" becomes a params pytree and ``save``/``load`` go
through the orbax-backed checkpoint layer.
"""

import importlib
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.config.core import ConfigStore, DotDict, _node_to_dict, _deep_merge

MODEL_REGISTRY: Dict[str, type] = {}
MODEL_DATACLASS_REGISTRY: Dict[str, type] = {}


class LiteasrModel(nn.Module):
    """Base model. Subclasses implement __call__ (training forward) plus the
    target/length hooks the criterions use (reference
    liteasr/models/__init__.py:34-50)."""

    def get_pred_len(self, xlens):
        raise NotImplementedError

    def get_target(self, ys, ylens):
        raise NotImplementedError

    def get_target_len(self, ylens):
        return ylens

    def post_init_params(self, params):
        """Hook for init edits flax initializers cannot express (e.g. the
        transducer's LSTM forget-bias=1, reference
        liteasr/nets/initialization.py:50-55). Default: identity. Applied by
        the trainer to freshly initialized params only — checkpoints resume
        past it."""
        return params

    @classmethod
    def build_model(cls, cfg, task=None) -> "LiteasrModel":
        raise NotImplementedError


def register_model(name: str, dataclass: Optional[type] = None):
    """Decorator mirroring liteasr/models/__init__.py:72-98."""

    def register_model_cls(cls):
        if name in MODEL_REGISTRY:
            raise ValueError(f"duplicate model name {name}")
        MODEL_REGISTRY[name] = cls
        if dataclass is not None:
            assert issubclass(dataclass, LiteasrDataclass)
            MODEL_DATACLASS_REGISTRY[name] = dataclass
            node = _node_to_dict(dataclass)
            node["name"] = name
            ConfigStore.instance().store(name=name, node=dataclass, group="model")
        cls.__dataclass__ = dataclass
        return cls

    return register_model_cls


def build_model(cfg, task=None) -> Tuple[LiteasrModel, Any]:
    """Instantiate a model from the composed config.

    Merges the registered dataclass defaults under the user config and writes
    the completed tree back into ``cfg`` so the saved run config is
    self-contained (reference liteasr/models/__init__.py:53-68).
    """
    name = cfg.get("name") if isinstance(cfg, dict) else getattr(cfg, "name", None)
    if name is None or name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model '{name}' (known: {sorted(MODEL_REGISTRY)})")
    dc = MODEL_DATACLASS_REGISTRY.get(name)
    merged = dict(cfg) if isinstance(cfg, dict) else {}
    if dc is not None:
        merged = _deep_merge(_node_to_dict(dc), merged)
        merged["name"] = name
    if isinstance(cfg, dict):
        cfg.clear()
        cfg.update(merged)
        cfg = DotDict(cfg)
    return MODEL_REGISTRY[name].build_model(cfg, task)


# automatically import any model modules (reference models/__init__.py:102-111)
_models_dir = os.path.dirname(__file__)
for _file in sorted(os.listdir(_models_dir)):
    if _file.endswith(".py") and not _file.startswith("_"):
        importlib.import_module("liteasr_tpu.models." + _file[: -len(".py")])
