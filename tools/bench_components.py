"""Per-component stage-3 timing on the real chip.

Times latent_half (cond encoder + 28-step flow inverse), vq decode
(Pallas VQ + VQGAN decoder), and aft_half (AFT deformable decoder incl.
the two DCN warps) as separate jits, plus the fused whole-pipeline jit,
at the 620x420 protocol shape. Each phase is timed with a host readback
barrier (block_until_ready is a no-op on this backend — PERF_NOTES.md).

Usage: python -m tools.bench_components [--batch 1] [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from tools.flops_audit import build_stage3


def _time(fn, args, iters, warmup=2, label=""):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:28s} {dt * 1e3:8.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dcn_impl", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    netG, vq, params, vq_vars, lq = build_stage3(
        args.height, args.width, args.dtype, args.dcn_impl
    )
    if args.batch > 1:
        lq = np.broadcast_to(np.asarray(lq), (args.batch, *lq.shape[1:]))
        lq = jax.numpy.asarray(lq.copy())

    latent = jax.jit(lambda p, x: netG.apply({"params": p}, x, method=netG.latent_half))
    decode = jax.jit(lambda v, x: vq.apply(v, x, method=vq.decode))
    aft = jax.jit(
        lambda p, x, c, m: netG.apply({"params": p}, x, c, m, method=netG.aft_half)
    )

    def full(p, v, x):
        z, enc = netG.apply({"params": p}, x, method=netG.latent_half)
        _, _, code = vq.apply(v, z, method=vq.decode)
        return netG.apply({"params": p}, z, code, enc["mid_feat"], method=netG.aft_half)

    full = jax.jit(full)

    print(f"stage-3 components @ {args.height}x{args.width} B={args.batch} "
          f"({args.dtype}, dcn={args.dcn_impl})")
    t_lat = _time(latent, (params, lq), args.iters, label="latent_half (enc+flow^-1)")
    x, enc = latent(params, lq)
    t_dec = _time(decode, (vq_vars, x), args.iters, label="vq decode")
    dec = decode(vq_vars, x)
    t_aft = _time(aft, (params, x, dec[2], enc["mid_feat"]), args.iters,
                  label="aft_half (AFT + 2x DCN)")
    t_full = _time(full, (params, vq_vars, lq), args.iters, label="FULL fused")

    def split(p, v, x):
        z, enc = latent(p, x)
        _, _, code = decode(v, z)
        return aft(p, z, code, enc["mid_feat"])

    t_split = _time(split, (params, vq_vars, lq), args.iters,
                    label="FULL split (3 dispatches)")
    print(f"  {'sum of parts':28s} {(t_lat + t_dec + t_aft) * 1e3:8.1f} ms")
    print(f"  full throughput: fused {args.batch / t_full:.2f} img/s | "
          f"split {args.batch / t_split:.2f} img/s")


if __name__ == "__main__":
    main()
