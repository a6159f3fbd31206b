"""Task framework. Reference: liteasr/tasks/__init__.py:26-105."""

import importlib
import os
from typing import Dict, Optional

from liteasr_tpu import criterions, models, optims
from liteasr_tpu.config import LiteasrDataclass
from liteasr_tpu.config.core import ConfigStore, DotDict, _deep_merge, _node_to_dict

TASK_REGISTRY: Dict[str, type] = {}
TASK_DATACLASS_REGISTRY: Dict[str, type] = {}
TASK_CLASS_NAMES = set()


class LiteasrTask:
    def __init__(self, cfg):
        self.cfg = cfg
        self.datasets = dict()

    def load_dataset(self, split, data_dir, dataset_cfg, postprocess_cfg,
                     memory_save: bool = False):
        raise NotImplementedError

    def dataset(self, split: str):
        return self.datasets[split]

    def inference(self, x, model, variables):
        raise NotImplementedError

    def save_model(self, model_name, variables):
        raise NotImplementedError

    def build_model(self, cfg):
        return models.build_model(cfg, self)

    def build_optimizer(self, cfg):
        return optims.build_optimizer(cfg, self)

    def build_criterion(self, cfg):
        return criterions.build_criterion(cfg, self)


def setup_task(cfg) -> LiteasrTask:
    name = cfg.get("name") if isinstance(cfg, dict) else getattr(cfg, "name", None)
    if name is None or name not in TASK_REGISTRY:
        raise ValueError(f"unknown task '{name}' (known: {sorted(TASK_REGISTRY)})")
    dc = TASK_DATACLASS_REGISTRY.get(name)
    merged = dict(cfg) if isinstance(cfg, dict) else {}
    if dc is not None:
        merged = _deep_merge(_node_to_dict(dc), merged)
        merged["name"] = name
    if isinstance(cfg, dict):
        cfg.clear()
        cfg.update(merged)
        cfg = DotDict(cfg)
    return TASK_REGISTRY[name](cfg)


def register_task(name: str, dataclass: Optional[type] = None):
    def register_task_cls(cls):
        if name in TASK_REGISTRY:
            raise ValueError(f"duplicate task name {name}")
        TASK_REGISTRY[name] = cls
        TASK_CLASS_NAMES.add(cls.__name__)
        if dataclass is not None:
            assert issubclass(dataclass, LiteasrDataclass)
            TASK_DATACLASS_REGISTRY[name] = dataclass
            node = _node_to_dict(dataclass)
            node["name"] = name
            ConfigStore.instance().store(name=name, node=dataclass, group="task")
        return cls

    return register_task_cls


_dir = os.path.dirname(__file__)
for _file in sorted(os.listdir(_dir)):
    if _file.endswith(".py") and not _file.startswith("_"):
        importlib.import_module("liteasr_tpu.tasks." + _file[: -len(".py")])
