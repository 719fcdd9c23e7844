from .mesh import make_mesh
from .sharding import (
    partition_batch,
    partition_params,
    make_sharded_train_step,
    shard_dataset_batch,
)
from .collectives import psum_compressed

__all__ = [
    "make_mesh",
    "partition_batch",
    "partition_params",
    "make_sharded_train_step",
    "shard_dataset_batch",
    "psum_compressed",
]
