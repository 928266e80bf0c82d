from .mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to,
    param_shardings,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_batch_to",
    "param_shardings",
    "replicate_tree",
    "replicated",
    "shard_batch",
]
