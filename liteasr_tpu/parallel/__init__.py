"""Device mesh + sharding layer (replaces the reference's NCCL DDP stack,
liteasr/distributed/)."""

from liteasr_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    is_master,
    process_count,
    process_index,
    local_dp_size,
    distributed_init,
    to_host,
    gather_tree,
    scatter_rows,
    shard_tree,
    replicate_tree,
)
