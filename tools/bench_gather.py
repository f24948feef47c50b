"""Microbench: TPU gather formulations for the DCN exact-tail path.

The hybrid DCN's tail (ops/dcn.py:_bilinear_gather_rows) gathers Cg=32-wide
channel rows via take_along_axis with the index broadcast over the channel
dim — which XLA can lower as a per-ELEMENT gather. This compares:

  a) take_along_axis broadcast (current)
  b) jnp.take row-gather per group ([N, Cg] rows, slice_sizes [1, Cg])
  c) jnp.take row-gather on fused [N, C] rows with per-group index offsets
     folded into a single gather from [N*G, Cg]

Usage: python -m tools.bench_gather [--n 2097152] [--s 262144]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024)  # ~BP at 620x420 B=8
    ap.add_argument("--s", type=int, default=256 * 1024)  # slots (12.5%)
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--cg", type=int, default=32)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    N, S, G, Cg, K = args.n, args.s, args.g, args.cg, args.k
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(np.random.rand(N, G, Cg), dt)
    idx = jnp.asarray(np.random.randint(0, N, (S * K, G)), jnp.int32)

    bytes_moved = S * K * G * Cg * x.dtype.itemsize * 4  # 4 corners worth

    @jax.jit
    def f_tala(x, idx):
        xe = x[None]  # [1, N, G, Cg]
        i = idx[None, ..., None]  # [1, S*K, G, 1]
        acc = jnp.zeros((1, S * K, G, Cg), x.dtype)
        for _ in range(4):
            acc = acc + jnp.take_along_axis(xe, i, axis=1)
        return acc

    @jax.jit
    def f_take_per_group(x, idx):
        xg = jnp.moveaxis(x, 1, 0)  # [G, N, Cg]
        outs = []
        for g in range(G):
            acc = jnp.zeros((S * K, Cg), x.dtype)
            for _ in range(4):
                acc = acc + jnp.take(xg[g], idx[:, g], axis=0)
            outs.append(acc)
        return jnp.stack(outs, axis=1)

    @jax.jit
    def f_take_fused(x, idx):
        xf = jnp.moveaxis(x, 1, 0).reshape(G * N, Cg)  # group-major rows
        off = jnp.arange(G, dtype=jnp.int32) * N
        flat = (idx + off[None, :]).reshape(-1)  # [S*K*G]
        acc = jnp.zeros((S * K * G, Cg), x.dtype)
        for _ in range(4):
            acc = acc + jnp.take(xf, flat, axis=0)
        return acc.reshape(S * K, G, Cg)

    for name, fn in [("take_along_axis bcast", f_tala),
                     ("jnp.take per-group", f_take_per_group),
                     ("jnp.take fused rows", f_take_fused)]:
        dt_s = timeit(fn, x, idx)
        print(f"{name:24s} {dt_s * 1e3:8.2f} ms  "
              f"{bytes_moved / dt_s / 1e9:7.1f} GB/s effective")


if __name__ == "__main__":
    main()
