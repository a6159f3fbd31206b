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


def to_host(x) -> np.ndarray:
    """Full numpy value of a (possibly process-spanning) array.

    Single-process or fully-replicated arrays are a plain ``device_get``;
    arrays whose shards live on other processes (dp row shards, tp param
    shards) go through ``multihost_utils.process_allgather`` — a COLLECTIVE,
    so in multi-process runs every process must reach this call in the same
    order (the trigger/event system guarantees lockstep; see
    Trainer.save_model / Trainer.inference).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable \
            and not x.is_fully_replicated:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def gather_tree(tree):
    """Host (numpy) copy of a state pytree; collective per leaf when shards
    span processes. Every process must call it (see :func:`to_host`)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    return jax.tree.map(to_host, tree)


def scatter_rows(arr: np.ndarray, sharding: NamedSharding):
    """Place a FULL host array onto a row sharding when every process holds
    the complete value (batch decode builds the whole padded batch from
    shared manifests). Each process contributes only its local row block."""
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    idx_map = sharding.addressable_devices_indices_map(arr.shape)
    spans = [(sl[0].start or 0,
              arr.shape[0] if sl[0].stop is None else sl[0].stop)
             for sl in idx_map.values()]
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    assert sum(e - s for s, e in set(spans)) == hi - lo, (
        "non-contiguous local row block; mesh device order is not "
        "process-major")
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(arr[lo:hi]), arr.shape)


def shard_tree(tree, shardings):
    """Place a fully host-resident pytree onto (possibly process-spanning)
    shardings. Every process must hold the complete value of every leaf —
    resume reads the same checkpoint file on every host — and contributes
    only its addressable shards (single-process: plain device_put)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree onto the mesh. Multi-process (or resharding from
    tp shards) goes through a jitted identity so GSPMD inserts the
    all-gathers; single-process is a plain device_put."""
    repl = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    return jax.jit(lambda t: t, out_shardings=repl)(tree)


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
