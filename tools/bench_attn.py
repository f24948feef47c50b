"""Isolate the attention share of the stage-3 decoders on the real chip.

Times (a) one AttnBlock standalone at the decoder latent shape, (b) the
VQGAN decoder as configured (4 attn blocks @16k tokens), (c) the same
decoder with attn_resolutions=() — the difference is the true in-graph
attention cost, which isolated-kernel numbers have twice failed to
predict on this backend (PERF_NOTES.md).

Usage: python -m tools.bench_attn [--q_chunk 2048] [--softmax_bf16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters=10, warmup=2, label=""):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:44s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main():
    from glare_tpu.modules.encoder_decoder import Decoder
    from glare_tpu.nn.layers import AttnBlock

    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=105)
    ap.add_argument("--w", type=int, default=155)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--q_chunk", type=int, default=2048)
    ap.add_argument("--softmax_bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, args.h, args.w, args.c), jnp.bfloat16)

    blk = AttnBlock(dtype=jnp.bfloat16, q_chunk=args.q_chunk,
                    softmax_bf16=args.softmax_bf16, use_fused=False)
    p = blk.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: blk.apply(p, x))
    _time(f, (p, x), args.iters,
          label=f"AttnBlock @{args.h * args.w} tokens c={args.c} "
                f"qc={args.q_chunk}")

    blk_fused = AttnBlock(dtype=jnp.bfloat16, use_fused=True)
    ff = jax.jit(lambda p, x: blk_fused.apply(p, x))
    _time(ff, (p, x), args.iters,
          label=f"AttnBlock FUSED kernel @{args.h * args.w} tokens")

    z = jnp.asarray(rng.randn(1, args.h, args.w, 3), jnp.bfloat16)
    for attn_res, label in (((64,), "Decoder WITH 4 attn blocks"),
                            ((), "Decoder NO attn")):
        dec = Decoder(attn_resolutions=attn_res, dtype=jnp.bfloat16)
        dp = jax.jit(dec.init)(jax.random.PRNGKey(0), z)
        df = jax.jit(lambda p, x, dec=dec: dec.apply(p, x)[0])
        _time(df, (dp, z), args.iters, label=label)


if __name__ == "__main__":
    main()
