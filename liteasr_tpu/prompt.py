"""Print a registered module's default YAML (reference: liteasr/prompt.py:10-27).

Usage: ``python -m liteasr_tpu.prompt model.U2``
"""

import argparse

import yaml

import liteasr_tpu  # noqa: F401  (populates registries)
from liteasr_tpu.config.core import _node_to_dict
from liteasr_tpu.criterions import CRITERION_DATACLASS_REGISTRY
from liteasr_tpu.models import MODEL_DATACLASS_REGISTRY
from liteasr_tpu.optims import OPTIMIZER_DATACLASS_REGISTRY
from liteasr_tpu.tasks import TASK_DATACLASS_REGISTRY

_GROUPS = {
    "model": MODEL_DATACLASS_REGISTRY,
    "task": TASK_DATACLASS_REGISTRY,
    "optimizer": OPTIMIZER_DATACLASS_REGISTRY,
    "criterion": CRITERION_DATACLASS_REGISTRY,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("option", type=str,
                        help="<group>.<option> e.g. task.asr")
    args = parser.parse_args()
    group, option = args.option.split(".")

    if group not in _GROUPS:
        raise ValueError(f"{group} is not a module")
    registry = _GROUPS[group]
    if option not in registry:
        raise ValueError(
            f"unknown {group} '{option}' (known: {sorted(registry)})")
    node = _node_to_dict(registry[option])
    node["name"] = option
    print(yaml.safe_dump(node, sort_keys=False))


if __name__ == "__main__":
    main()
