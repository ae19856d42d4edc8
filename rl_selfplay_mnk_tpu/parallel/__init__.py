from .mesh import (
    make_mesh,
    env_sharding,
    replicated_sharding,
    shard_batched,
    replicate,
    init_distributed,
)

__all__ = [
    "make_mesh",
    "env_sharding",
    "replicated_sharding",
    "shard_batched",
    "replicate",
    "init_distributed",
]
