"""SPMD scale-out over a jax.sharding.Mesh.

The reference's entire distributed surface is data parallelism + loss
reduction over NCCL (SURVEY.md §2.3: DataParallel in the shipped confs, DDP
+ dist.reduce in basicsr). The TPU-native equivalent: one jitted train step
with the batch sharded over a 1-D 'data' mesh axis and parameters
replicated; XLA inserts the gradient all-reduce (psum) over ICI. Multi-host
runs only need jax.distributed.initialize() before building the mesh.

Also provides EnlargedSampler-equivalent deterministic rank sharding for
data loading (reference: basicsr/data/data_sampler.py:6-48) — with jit-level
batch sharding each host feeds its local slice.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "data"):
    return NamedSharding(mesh, P(axis_name))


def cross_replica_mean(tree, axis_name: str = "data"):
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), tree)


def make_dp_train_step(step_fn: Callable, mesh: Mesh, axis_name: str = "data"):
    """Wrap a single-device train step (params, opt_state, *batch) ->
    (params, opt_state, loss) into a batch-sharded SPMD step.

    Parameters/optimizer state are replicated; every array in *batch is
    sharded on its leading axis. XLA's SPMD partitioner inserts the gradient
    all-reduce — no hand-written collectives (the NCCL-allreduce analogue
    rides ICI automatically).
    """
    repl = replicate(mesh)
    shard = shard_batch(mesh, axis_name)

    def sharded(params, opt_state, *batch):
        return step_fn(params, opt_state, *batch)

    return jax.jit(
        sharded,
        in_shardings=(repl, repl) + tuple(shard for _ in range(2)),
        out_shardings=None,
    )


class EnlargedSampler:
    """Rank-sharded, epoch-seeded shuffled index sampler with dataset
    enlargement (reference: basicsr/data/data_sampler.py:6-48)."""

    def __init__(self, num_samples: int, num_replicas: int, rank: int, ratio: int = 1):
        self.num_samples_raw = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.num_samples = int(np.ceil(num_samples * ratio / num_replicas))
        self.total_size = self.num_samples * num_replicas
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self):
        g = np.random.default_rng(self.epoch)
        order = g.permutation(self.total_size)
        order = order % self.num_samples_raw
        return order[self.rank : self.total_size : self.num_replicas]

    def __iter__(self):
        return iter(self.indices())

    def __len__(self):
        return self.num_samples
