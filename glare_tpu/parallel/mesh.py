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


def make_mesh_2d(
    n_data: int, n_model: int, axis_names: tuple = ("data", "model")
) -> Mesh:
    """2-D device mesh for hybrid data x model sharding. On real hardware the
    device order should follow the ICI topology (jax.devices() already does on
    a TPU slice), so the inner 'model' axis rides the fastest links."""
    devs = jax.devices()[: n_data * n_model]
    return Mesh(np.asarray(devs).reshape(n_data, n_model), axis_names)


def auto_shardings(tree, mesh: Mesh, axis_names=("data",), min_size: int = 2 ** 12):
    """FSDP/TP-style parameter sharding rule: for each leaf, assign each mesh
    axis (in order) to the largest still-unassigned array dim divisible by
    that axis' size. Small leaves (< min_size elements) stay replicated —
    the all-gather latency would dominate any memory win.

    This is the ZeRO-3/FSDP analogue done the XLA way: parameters and
    optimizer state live sharded; the SPMD partitioner inserts the
    all-gathers before use and reduce-scatters on the gradients — no
    hand-written collectives (reference's distribution surface is
    NCCL DDP, basicsr/utils/dist_util.py; this goes beyond it).
    """

    def rule(x):
        if not hasattr(x, "shape") or x.size < min_size:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        taken = set()
        for ax_name in axis_names:
            ax_size = mesh.shape[ax_name]
            cands = [
                d
                for d in range(x.ndim)
                if d not in taken and x.shape[d] % ax_size == 0 and x.shape[d] > 1
            ]
            if not cands:
                continue
            d = max(cands, key=lambda d: x.shape[d])
            spec[d] = ax_name
            taken.add(d)
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, tree)


def make_fsdp_train_step(
    step_fn: Callable,
    mesh: Mesh,
    params,
    opt_state,
    n_batch_args: int = 2,
    data_axis: str = "data",
    param_axes: Optional[tuple] = None,
):
    """Wrap (params, opt_state, *batch) -> (params, opt_state, loss) so that
    params + optimizer state are FSDP-sharded (see auto_shardings) and the
    batch is sharded over the data axis. Returns (jitted_step, shardings)
    where shardings = (param_sh, opt_sh, batch_sh) for device_put-ing inputs.
    """
    if param_axes is None:
        param_axes = tuple(n for n in mesh.axis_names)
    param_sh = auto_shardings(params, mesh, axis_names=param_axes)
    opt_sh = auto_shardings(opt_state, mesh, axis_names=param_axes)
    batch_sh = NamedSharding(mesh, P(data_axis))

    step = jax.jit(
        step_fn,
        in_shardings=(param_sh, opt_sh) + (batch_sh,) * n_batch_args,
        out_shardings=(param_sh, opt_sh, NamedSharding(mesh, P())),
    )
    return step, (param_sh, opt_sh, batch_sh)


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
