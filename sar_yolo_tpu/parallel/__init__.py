from .mesh import (
    get_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
    init_distributed,
    get_global_mesh,
    process_shard,
    host_local_batch_to_global,
    sync_flag,
)

__all__ = [
    "get_mesh", "shard_batch", "replicate", "batch_sharding",
    "replicated_sharding", "init_distributed", "get_global_mesh",
    "process_shard", "host_local_batch_to_global", "sync_flag",
]
