#!/usr/bin/env python
"""Benchmark: stage-3 GLARE inference throughput at the 600x400 protocol
shape (padded to 620x420 per infer_dataset_lol.py) on one TPU chip.

Prints ONE JSON line:
  {"metric": "stage3_infer_600x400" if args.warp_mode == "dcn" else "stage3_infer_600x400_flowwarp", "value": N, "unit": "img/s",
   "vs_baseline": N / 200.0}

Baseline: BASELINE.md speed target >200 img/s per v5e chip. bf16 compute,
Pallas VQ kernel on TPU, batched.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--height", type=int, default=420)
    parser.add_argument("--width", type=int, default=620)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--warp_mode", default="dcn", choices=["dcn", "flow"],
                        help="AFT alignment: exact DCNv2 parity or the "
                             "gather-free TPU-fast flow variant")
    args = parser.parse_args()

    from glare_tpu.modules.vqllflow_deformable import VQLLFLOWDeformable
    from glare_tpu.modules.vqmodel import VQModel

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    netG = VQLLFLOWDeformable(K=12, L=2, dtype=dtype, warp_mode=args.warp_mode)
    vq = VQModel(dtype=dtype)

    b, h, w = args.batch, args.height, args.width

    def init_all(rng):
        rngs = jax.random.split(rng, 3)
        init_lr = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vq_vars = vq.init(rngs[0], init_lr)
        g_params = netG.init(rngs[1], init_lr, method=VQLLFLOWDeformable.latent_half)[
            "params"
        ]
        x0, enc0 = netG.apply(
            {"params": g_params}, init_lr, method=VQLLFLOWDeformable.latent_half
        )
        _, _, code0 = vq.apply(vq_vars, x0, method=vq.decode)
        aft_params = netG.init(
            rngs[2], x0, code0, enc0["mid_feat"], method=VQLLFLOWDeformable.aft_half
        )["params"]
        return {**g_params, **aft_params}, vq_vars

    params, vq_vars = jax.jit(init_all)(jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, vq_vars, lq):
        x, lr_enc = netG.apply({"params": params}, lq, method=netG.latent_half)
        _, _, code_out = vq.apply(vq_vars, x, method=vq.decode)
        return netG.apply(
            {"params": params}, x, code_out, lr_enc["mid_feat"], method=netG.aft_half
        )

    lq = jnp.asarray(
        np.log(np.clip(np.random.RandomState(0).rand(b, h, w, 3).astype(np.float32), 1e-3, None))
    )

    def host_sync(o):
        # block_until_ready() is a no-op on the axon backend (PERF_NOTES.md);
        # a host readback is the only reliable execution barrier.
        return np.asarray(o[0, 0, 0, 0])

    for _ in range(args.warmup):
        host_sync(forward(params, vq_vars, lq))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = forward(params, vq_vars, lq)
    host_sync(out)
    dt = time.perf_counter() - t0

    img_per_s = args.batch * args.iters / dt
    print(
        json.dumps(
            {
                "metric": "stage3_infer_600x400" if args.warp_mode == "dcn" else "stage3_infer_600x400_flowwarp",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / 200.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
