"""Op-level device profile of the stage-1 VQ-GAN training step (round-4
verdict weak #8 / next #7: BENCH_MODES_r04 claims 11.4% MFU for
stage1_train_256 with no trace behind it — "measured" is not
"characterized").

Captures a ``jax.profiler`` trace around full GAN iterations (generator
step incl. codebook/pixel/perceptual/GAN losses + the spectral-norm
discriminator step + EMA) at the shipped conf's shapes
(confs/stage1_HQ_pretrain.yml geometry; reference pipeline:
defor_cuda_ext/basicsr/models/dehaze_vq_model.py:139-221) and aggregates
per-HLO-category device time with XLA's own model_flops/bytes_accessed —
same aggregation as tools/profile_stage3.py. Host gaps between device
events are reported too: the r04 hypothesis is launch/dispatch overhead
(many small jits per iteration), which shows up as device idle, not as a
slow category.

Usage: python -m tools.profile_stage1 [--batch 4] [--iters 3]
Writes PROFILE_STAGE1_r05.json next to the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from tools.profile_stage3 import aggregate_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--gt_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--log_dir", default="/tmp/glare_stage1_trace")
    ap.add_argument("--out", default="PROFILE_STAGE1_r05.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from bench import V5E_F32_TFLOPS
    from glare_tpu.sr.models.vq_model import VQDehazeModel

    b, s = args.batch, args.gt_size
    import tempfile

    tmp_dir = tempfile.mkdtemp(prefix="glare_prof_s1_")
    opt = {
        "is_train": True,
        "manual_seed": 0,
        "network_g": {
            "type": "VQWeightDehazeNet",
            "gt_resolution": s,
            "norm_type": "gn",
            "act_type": "silu",
            "use_quantize": True,
            "codebook_params": [[s // 4, 1024, 512]],
            "LQ_stage": False,
            "use_weight": False,
        },
        "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 512},
        "datasets": {"train": {"gt_size": s}},
        "path": {"models": f"{tmp_dir}/models",
                 "training_states": f"{tmp_dir}/states"},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-4},
            "optim_d": {"type": "Adam", "lr": 1e-4},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "perceptual_opt": {
                "type": "PerceptualLoss",
                "layer_weights": {"relu1_2": 1.0, "relu2_2": 1.0,
                                  "relu3_3": 1.0},
                "perceptual_weight": 1.0, "style_weight": 0,
            },
            "gan_opt": {"type": "GANLoss", "gan_type": "hinge",
                        "loss_weight": 0.1},
            "codebook_opt": {"loss_weight": 1.0},
            "net_d_init_iters": 0,
        },
        "val": {"metrics": {"psnr": {"type": "psnr", "better": "higher"}}},
    }
    model = VQDehazeModel(opt)
    rng = np.random.RandomState(0)
    data = {"lq": jnp.asarray(rng.rand(b, s, s, 3), jnp.float32),
            "gt": jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)}

    # warm every jit (g step, zgt encode, d step, EMA, loss reduce)
    it = 0
    for _ in range(2):
        it += 1
        logs = model.optimize_parameters(it, data)
    _ = float(logs["l_g_total"])

    os.makedirs(args.log_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.log_dir):
        for _ in range(args.iters):
            it += 1
            logs = model.optimize_parameters(it, data)
        _ = float(logs["l_g_total"])
    wall = time.perf_counter() - t0

    n_img = args.iters * b
    rows, total_t, total_f, top_ops = aggregate_trace(args.log_dir, n_img)
    wall_ms_img = wall / n_img * 1e3
    device_ms_img = total_t / n_img
    out = {
        "what": ("stage-1 VQ-GAN train step device profile "
                 f"(b={b}, {s}px, f32, g+d+EMA), {args.iters} iters traced"),
        "wall_ms_per_img": round(wall_ms_img, 2),
        "device_ms_per_img": round(device_ms_img, 2),
        "host_gap_ms_per_img": round(wall_ms_img - device_ms_img, 2),
        "measured_tflop_per_img": round(total_f / n_img / 1e12, 2),
        "device_tflops_rate": round(total_f / total_t * 1e-9, 1),
        # wall-clock MFU at the f32 peak (the step runs f32 params/activations)
        "mfu_wall_f32": round(
            (total_f / n_img) / (wall_ms_img / 1e3) / (V5E_F32_TFLOPS * 1e12),
            4),
        "breakdown": rows,
        "top_ops": top_ops,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in list(out)[:6]}, indent=1))
    print(f"full profile -> {args.out}")


if __name__ == "__main__":
    main()
