"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's process-per-GPU NCCL topology
(liteasr/distributed/utils.py:17-139, liteasr/config/__init__.py:60-70):

* data parallelism is the ``dp`` axis of a ``jax.sharding.Mesh``; the gradient
  all-reduce is a ``psum`` XLA inserts automatically because the loss is a
  mean over a dp-sharded batch with replicated params,
* tensor parallelism is a second ``tp`` axis (extension beyond reference
  parity) — param shardings ride it,
* multi-host bootstrap goes through ``jax.distributed.initialize`` and
  per-host batch shards are assembled with
  ``jax.make_array_from_process_local_data`` (replaces DistributedSampler).
"""

import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_MESH: Optional[Mesh] = None


def distributed_init(dist_cfg) -> None:
    """Multi-host init (reference distributed_init, utils.py:65-92)."""
    if dist_cfg and dist_cfg.get("coordinator_address"):
        jax.distributed.initialize(
            coordinator_address=dist_cfg["coordinator_address"],
            num_processes=dist_cfg.get("num_processes"),
            process_id=dist_cfg.get("process_id"),
        )
        logger.info("jax.distributed initialized: process %d / %d",
                    jax.process_index(), jax.process_count())


def get_mesh(dp: int = -1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build (or fetch the cached) ('dp', 'sp', 'tp') mesh."""
    global _MESH
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, (
        f"dp({dp}) * tp({tp}) * sp({sp}) != device count ({n})")
    if _MESH is not None and _MESH.devices.shape == (dp, sp, tp):
        return _MESH
    device_array = mesh_utils.create_device_mesh((dp, sp, tp),
                                                 devices=devices)
    _MESH = Mesh(device_array, axis_names=("dp", "sp", "tp"))
    return _MESH


def current_mesh() -> Mesh:
    """The mesh in use (trainer's, if one exists), else an all-dp mesh."""
    return _MESH if _MESH is not None else get_mesh()


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def batch_shardings(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Per-leaf shardings: features shard time over 'sp' too (sequence
    parallelism); 1-D per-utterance leaves shard only over 'dp'."""
    row = NamedSharding(mesh, P("dp"))
    seq = NamedSharding(mesh, P("dp", "sp"))
    return {
        key: seq if np.ndim(val) >= 2 and key == "xs" else row
        for key, val in batch.items()
    }


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host batch onto the mesh: rows over 'dp', feature time over
    'sp' (no-op when sp == 1).

    Single-process: a plain device_put split. Multi-process: each host
    contributes its local shard (per-host manifest sharding upstream).
    """
    shardings = batch_shardings(mesh, batch)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(shardings[k], v)
        for k, v in batch.items()
    }


def is_master() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_dp_size(mesh: Mesh) -> int:
    """Rows of the dp axis this process feeds (for batch-padding multiples)."""
    dp = mesh.shape["dp"]
    return max(1, dp // jax.process_count())
