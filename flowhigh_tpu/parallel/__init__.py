from .distributed import (
    initialize,
    local_batch_slice,
    make_global_mesh,
    shard_global_batch,
)
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "param_shardings",
    "shard_batch", "initialize", "make_global_mesh", "local_batch_slice",
    "shard_global_batch",
]
