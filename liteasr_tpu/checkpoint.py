"""Checkpoint I/O.

Reference: liteasr/utils/checkpoint.py:15-73 (single-ckpt load, averaging over
last-N by mtime or N-best by parsing ``valid loss:`` lines from train.log) and
liteasr/models/__init__.py:31-32 (model-only state_dict save per epoch).

TPU-native: params are a flax pytree serialized with msgpack
(``model.ep.<epoch>.msgpack``). Beyond reference parity, full train-state
checkpointing (params + optimizer + step) enables mid-training resume — the
reference cannot resume (SURVEY.md §5).
"""

import glob
import logging
import os
import re
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

CKPT_TEMPLATE = "model.ep.{}.msgpack"


def save_params(path: str, variables: Any) -> None:
    """Serialize model variables (params [+ batch_stats]) to msgpack."""
    variables = jax.device_get(variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _average_params(paths: List[str]) -> Any:
    """Average float leaves; integer-divide int leaves (checkpoint.py:24-46)."""
    acc = None
    for p in paths:
        tree = load_params(p)
        if acc is None:
            acc = tree
        else:
            acc = jax.tree.map(lambda a, b: a + b, acc, tree)
    n = len(paths)

    def avg(leaf):
        if np.issubdtype(np.asarray(leaf).dtype, np.floating):
            return leaf / n
        return leaf // n

    return jax.tree.map(avg, acc)


_LOSS_RE = (r"valid loss: "
            r"([-+]?(?:\d+\.?\d*(?:[eE][-+]?\d+)?|\.\d+|nan|inf))")


def parse_valid_losses(log_path: str) -> List[float]:
    """Extract ``valid loss: X`` values from train.log (checkpoint.py:55-67).

    Accepts negative, scientific-notation, and nan/inf losses — a
    digits-only pattern would silently mis-parse those and make N-best
    averaging pick the wrong epochs.
    """
    pattern = re.compile(_LOSS_RE)
    losses = []
    with open(log_path, "r") as log:
        for line in log:
            match = pattern.search(line)
            if match:
                losses.append(float(match.group(1)))
    return losses


def parse_valid_history(log_path: str) -> List[tuple]:
    """Extract ``(epoch, valid loss)`` pairs from train.log.

    The trainer's valid lines carry their epoch counter
    (``... E / MAX epochs - valid loss: X``); keying losses by epoch is what
    lets :func:`load_ckpt`'s N-best policy align losses with checkpoints
    saved at a coarser interval than the valid trigger (save every K>1
    epochs misaligned a positional zip: model.ep.8 would be scored with
    epoch 2's loss). Resumed runs append duplicate epochs; every occurrence
    is kept in file order, so "last entry with epoch <= N" picks the
    freshest measurement.
    """
    pattern = re.compile(r"(\d+) / (?:\d+|inf) epochs - " + _LOSS_RE)
    out = []
    with open(log_path, "r") as log:
        for line in log:
            match = pattern.search(line)
            if match:
                out.append((int(match.group(1)), float(match.group(2))))
    return out


def _ckpt_epoch(path: str) -> int:
    match = re.search(r"model\.ep\.(\d+)\.msgpack$", path)
    return int(match.group(1)) if match else -1


def _loss_for_epoch(history: List[tuple], epoch: int) -> float:
    """Valid loss attributed to the checkpoint saved at ``epoch``'s end:
    the last logged valid at epoch <= N (the save trigger fires after the
    valid trigger at the same boundary)."""
    best = float("nan")
    for ep, loss in history:
        if ep <= epoch:
            best = loss
    return best


def load_ckpt(infer_cfg) -> Any:
    """Load (possibly averaged) model variables for decoding."""
    ckpt_path = infer_cfg.ckpt_path
    ckpt_name = infer_cfg.ckpt_name
    if not infer_cfg.model_avg:
        path = os.path.join(ckpt_path, CKPT_TEMPLATE.format(ckpt_name))
        logger.info("loading checkpoint: %s", path)
        return load_params(path)

    # only model checkpoints — save_dir also holds train_state files;
    # epoch-number order (mtime lies after file copies / machine moves)
    ckpts = sorted(glob.glob(os.path.join(ckpt_path, "model.ep.*.msgpack")),
                   key=_ckpt_epoch)
    target = os.path.join(ckpt_path, CKPT_TEMPLATE.format(ckpt_name))
    pos = ckpts.index(target)
    assert pos - infer_cfg.avg_num + 1 >= 0

    avg_policy: Optional[str] = infer_cfg.get("avg_policy")
    if avg_policy and os.path.isdir(avg_policy):
        avg_policy = os.path.join(avg_policy, "train.log")
    if avg_policy is None or not os.path.isfile(avg_policy):
        pickup = ckpts[pos - infer_cfg.avg_num + 1: pos + 1]
    else:
        history = parse_valid_history(avg_policy)
        if history:
            # key losses by the epoch in each checkpoint's filename — the
            # save interval need not equal the valid interval
            losses = [_loss_for_epoch(history, _ckpt_epoch(c))
                      for c in ckpts[: pos + 1]]
        else:  # epoch-less log (foreign format): positional zip fallback
            losses = parse_valid_losses(avg_policy)
            if len(losses) != pos + 1:
                logger.warning(
                    "avg_policy log has %d valid entries for %d checkpoints "
                    "and no epoch markers; N-best selection may misalign",
                    len(losses), pos + 1)
        # nan valid losses sort last so diverged epochs never enter the average
        ckpt_loss = sorted(
            zip(ckpts[: pos + 1], losses[: pos + 1]),
            key=lambda cl: (np.isnan(cl[1]), cl[1]))
        picked = ckpt_loss[: infer_cfg.avg_num]
        pickup = [c for c, _ in picked]
        check_avg_spread([l for _, l in picked])

    logger.info("loading average checkpoint from:\n\t%s", "\n\t".join(pickup))
    return _average_params(pickup)


def check_avg_spread(losses: List[float], tol: float = 0.5) -> bool:
    """Warn when the N-best checkpoints' valid losses oscillate.

    Parameter averaging assumes the selected checkpoints sit in one basin;
    when their valid losses spread widely (e.g. glancing-trained Paraformer
    checkpoints oscillate in function space and 10-best averaging scored
    WORSE than the last checkpoint — BENCHMARKS.md), the average can be
    worse than the single best. Returns True (and warns) when relative
    spread exceeds ``tol``.
    """
    vals = np.asarray([l for l in losses if np.isfinite(l)], np.float64)
    if vals.size < 2:
        return False
    spread = float(vals.max() - vals.min())
    rel = spread / max(abs(float(vals.min())), 1e-12)
    if rel > tol:
        logger.warning(
            "N-best checkpoints' valid losses spread %.3g..%.3g (%.0f%% of "
            "best): averaging across oscillating checkpoints can score "
            "worse than the single best — compare with model_avg=false",
            vals.min(), vals.max(), 100.0 * rel)
        return True
    return False


# -------------------------- full train-state checkpoints (resume support)

def save_train_state(path: str, state: Any) -> None:
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def restore_train_state(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def cast_floats(tree: Any, dtype=jnp.float32) -> Any:
    def cast(leaf):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            return arr.astype(dtype)
        return arr

    return jax.tree.map(cast, tree)
