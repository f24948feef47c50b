from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_dp_train_step,
    cross_replica_mean,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
    "cross_replica_mean",
]
