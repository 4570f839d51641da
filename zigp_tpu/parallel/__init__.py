from .mesh import batch_sharding, make_mesh, replicate, replicated, shard_batch
from .step import make_sharded_train_step

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "make_sharded_train_step",
]
