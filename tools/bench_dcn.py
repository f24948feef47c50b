"""Micro-benchmark for the Pallas DCN kernel at GLARE's AFT warp shapes.

Level-0 warp: x [1, 420, 620, 128], G=4, O=128 (the stage-3 hot op,
reference deformableDecoder_arch.py:283). Timing via host readback — the
axon backend's block_until_ready is a no-op (PERF_NOTES.md)."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="pallas", choices=["pallas", "xla", "chain"])
    p.add_argument("--rows_per_step", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--H", type=int, default=420)
    p.add_argument("--W", type=int, default=620)
    p.add_argument("--C", type=int, default=128)
    p.add_argument("--O", type=int, default=128)
    p.add_argument("--G", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--max_offset", type=int, default=2)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = p.parse_args()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((args.batch, args.H, args.W, args.C)).astype(np.float32))
    if args.dtype == "bfloat16":
        # the e2e inference path feeds the kernel bf16 activations: bf16
        # band DMA + single-pass bf16 MXU dot (f32 accumulation)
        x = x.astype(jnp.bfloat16)
    off = jnp.asarray((1.5 * rng.standard_normal((args.batch, args.H, args.W, args.G, 9, 2))).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (args.batch, args.H, args.W, args.G, 9)).astype(np.float32))
    w = jnp.asarray((0.1 * rng.standard_normal((3, 3, args.C, args.O))).astype(np.float32))

    if args.impl == "pallas":
        from glare_tpu.ops.dcn_pallas import modulated_deform_conv_pallas as op
        f = jax.jit(lambda *a: op(*a, max_offset=args.max_offset,
                                  rows_per_step=args.rows_per_step))
    elif args.impl == "chain":
        from glare_tpu.ops.dcn import modulated_deform_conv_chain as op
        f = jax.jit(lambda *a: op(*a, max_offset=args.max_offset))
    else:
        from glare_tpu.ops.dcn import modulated_deform_conv as op
        f = jax.jit(lambda *a: op(*a))

    t0 = time.perf_counter()
    out = f(x, off, mask, w)
    _ = np.asarray(out[0, 0, 0, 0])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s out={out.shape}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = f(x, off, mask, w)
    _ = np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.impl} {args.H}x{args.W}x{args.C} G={args.G} O={args.O}: {dt*1e3:.1f} ms/op")


if __name__ == "__main__":
    main()
