from .mesh import (
    make_mesh,
    env_sharding,
    replicated_sharding,
    shard_batched,
    replicate,
    put_global,
    init_distributed,
    process_index,
    is_coordinator,
)

__all__ = [
    "make_mesh",
    "env_sharding",
    "replicated_sharding",
    "shard_batched",
    "replicate",
    "put_global",
    "init_distributed",
    "process_index",
    "is_coordinator",
]
