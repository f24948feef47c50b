"""Microbench the decoder building blocks at the stage-3 level shapes.

Per-level conv3x3, GroupNorm32, swish, Upsample, and full ResnetBlock
timings with achieved TFLOP/s — finds where the conv trunk's MFU goes
(the attention-free VQGAN decoder measures ~12% MFU, tools/bench_attn.py).

Usage: python -m tools.bench_convs
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    from glare_tpu.nn.layers import Conv, GroupNorm32, ResnetBlock, Upsample, swish

    rng = np.random.RandomState(0)
    levels = [
        ("L2 105x155x512", (1, 105, 155, 512)),
        ("L1 210x310x256", (1, 210, 310, 256)),
        ("L0 420x620x128", (1, 420, 620, 128)),
        ("L0 aligned 424x624x128", (1, 424, 624, 128)),
        ("L2 aligned 112x160x512", (1, 112, 160, 512)),
    ]
    for name, shp in levels:
        b, h, w, c = shp
        x = jnp.asarray(rng.randn(*shp), jnp.bfloat16)

        conv = Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16)
        cp = conv.init(jax.random.PRNGKey(0), x)
        dt = _time(jax.jit(lambda p, x: conv.apply(p, x)), (cp, x))
        tf = 2 * b * h * w * c * c * 9 / 1e12
        print(f"{name}: conv3x3 {dt*1e3:7.2f} ms  {tf/dt:6.1f} TFLOP/s "
              f"({100*tf/dt/197:.0f}% MFU)", flush=True)

        gn = GroupNorm32()
        gp = gn.init(jax.random.PRNGKey(0), x)
        dt = _time(jax.jit(lambda p, x: gn.apply(p, x)), (gp, x))
        gb = 2 * x.size * 2 / 1e9  # bf16 read+write
        print(f"{name}: groupnorm {dt*1e3:7.2f} ms  ~{gb/dt:5.0f} GB/s eff", flush=True)

        rb = ResnetBlock(dtype=jnp.bfloat16)
        rp = rb.init(jax.random.PRNGKey(0), x)
        dt = _time(jax.jit(lambda p, x: rb.apply(p, x)), (rp, x))
        tf2 = 2 * tf
        print(f"{name}: resblock {dt*1e3:7.2f} ms  {tf2/dt:6.1f} TFLOP/s "
              f"({100*tf2/dt/197:.0f}% MFU)", flush=True)

        up = Upsample(dtype=jnp.bfloat16)
        upp = up.init(jax.random.PRNGKey(0), x)
        dt = _time(jax.jit(lambda p, x: up.apply(p, x)), (upp, x))
        tfu = 2 * b * (2 * h) * (2 * w) * c * c * 9 / 1e12
        print(f"{name}: upsample {dt*1e3:7.2f} ms  {tfu/dt:6.1f} TFLOP/s "
              f"({100*tfu/dt/197:.0f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
