"""Sweep the fused attention kernel's (bq, bk) block shapes at the
stage-3 decoder shape (B=8, n=16275 -> 16384 padded, c=512, bf16).

Isolated-kernel numbers have failed to predict E2E before (PERF_NOTES),
but for kernel-internal block-shape selection the integration is identical
across candidates, so the relative ordering transfers; the winner is then
confirmed e2e with bench.py.

Usage: python -m tools.bench_attn_sweep [--b 8] [--n 16275] [--c 512]
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np
import jax.numpy as jnp

from glare_tpu.ops.attn_pallas import flash_attention_nhc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=16275)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(args.b, args.n, args.c), jnp.bfloat16)
    k = jnp.asarray(rng.rand(args.b, args.n, args.c), jnp.bfloat16)
    v = jnp.asarray(rng.rand(args.b, args.n, args.c), jnp.bfloat16)
    flops = 4 * args.b * args.n * args.n * args.c

    ref = None
    for bq, bk, pipe in [(1024, 1024, False), (1024, 1024, True),
                         (512, 1024, True), (1024, 2048, True),
                         (512, 2048, True), (2048, 1024, True),
                         (1024, 512, True), (256, 2048, False)]:
        try:
            fn = lambda: flash_attention_nhc(q, k, v, bq=bq, bk=bk,
                                             pipeline=pipe)
            out = fn()
            np.asarray(out[0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            np.asarray(out[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.iters
            tf = flops / dt / 1e12
            line = (f"bq={bq:5d} bk={bk:5d} pipe={int(pipe)}  "
                    f"{dt * 1e3:7.2f} ms  {tf:6.1f} TFLOP/s")
            if ref is None:
                ref = np.asarray(out, np.float32)
                line += "  (reference output)"
            else:
                rel = (np.max(np.abs(np.asarray(out, np.float32) - ref))
                       / np.max(np.abs(ref)))
                line += f"  rel-vs-first {rel:.2e}"
            print(line, flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            print(f"bq={bq:5d} bk={bk:5d} pipe={int(pipe)}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
