"""Training drive for the R-dial evidence base (round-3 verdict #7).

Synthesizes a LOL-layout dataset, trains stage-2 briefly (warm-start
source), then stage-3 for >= 500 iters at 256 px with the shipped chain-DCN
default, and runs tools/offset_histogram on the final checkpoint at the
620x420 protocol shape — producing the per-warp + combined stats that
OFFSET_HIST_r04.json commits. The r03 evidence base was 60 iters at 128 px
on 15 images; this drive is the "harden it" rerun.

Usage: python -m tools.train_offset_drive [--root /tmp/glare_offsets]
       [--s2_iters 200] [--s3_iters 500]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def synth_lol(root, n_train=30, n_eval=4, hw=(400, 600), seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    for split, n in [("our485", n_train), ("eval15", n_eval)]:
        for sub in ("low", "high"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
        for i in range(n):
            # structured content: gradients + blobs, not white noise —
            # offsets learned on pure noise are not representative
            yy, xx = np.mgrid[0:hw[0], 0:hw[1]].astype(np.float32)
            img = np.stack([
                0.5 + 0.5 * np.sin(xx / (20 + 10 * rng.rand()) + rng.rand() * 6),
                0.5 + 0.5 * np.sin(yy / (25 + 10 * rng.rand()) + rng.rand() * 6),
                rng.rand() * np.ones_like(xx),
            ], -1)
            for _ in range(6):
                cy, cx = rng.randint(0, hw[0]), rng.randint(0, hw[1])
                r = int(rng.randint(20, 80))
                col = [float(c) for c in rng.rand(3)]
                cv2.circle(img, (int(cx), int(cy)), r, col, -1)
            hi = np.clip(img * 255, 0, 255).astype(np.uint8)
            lo = (hi * rng.uniform(0.05, 0.2)).astype(np.uint8)
            cv2.imwrite(os.path.join(root, split, "high", f"{i:03d}.png"), hi)
            cv2.imwrite(os.path.join(root, split, "low", f"{i:03d}.png"), lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/glare_offsets")
    ap.add_argument("--s2_iters", type=int, default=600)
    ap.add_argument("--s3_iters", type=int, default=500)
    ap.add_argument("--s2_gt", type=int, default=256,
                    help="stage-2 drive crop; matching stage-3's 256 keeps the\n                    frozen flow in-distribution (a 160-px stage-2 made the\n                    256-px stage-3 forward non-finite at iter 1)")
    args = ap.parse_args()

    import yaml

    data_root = os.path.join(args.root, "LOLdataset")
    if not os.path.exists(os.path.join(data_root, "our485", "low")):
        synth_lol(data_root)
        print("synth dataset written", flush=True)

    def patch(conf_path, name, out_path, **over):
        opt = yaml.safe_load(open(conf_path))
        opt["name"] = name
        for split in ("train", "val"):
            opt["datasets"][split]["root"] = data_root
        opt["dataroot_GT"] = os.path.join(data_root, "eval15", "high")
        opt["dataroot_LR"] = os.path.join(data_root, "eval15", "low")
        opt["train"]["val_freq"] = 10 ** 9
        opt["use_tb_logger"] = False
        for k, v in over.items():
            ks = k.split(".")
            node = opt
            for kk in ks[:-1]:
                node = node.setdefault(kk, {})
            node[ks[-1]] = v
        with open(out_path, "w") as f:
            yaml.safe_dump(opt, f)
        return opt

    def run(script, conf, niter):
        cmd = [sys.executable, script, "--opt", conf, "--niter", str(niter)]
        print("running:", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)

    # ---- stage 2 (short; warm-start source) ------------------------------
    s2_conf = os.path.join(args.root, "drive_s2.yml")
    patch("confs/train_stage2_LOL.yml", "offsetdrive_s2", s2_conf,
          **{"datasets.train.GT_size": args.s2_gt,
             "datasets.train.batch_size": 4,
             "logger.save_checkpoint_freq": float(args.s2_iters)})
    s2_ckpt = f"experiments/offsetdrive_s2/models/{args.s2_iters}_G.flax"
    if not os.path.exists(s2_ckpt):
        run("train_stage2.py", s2_conf, args.s2_iters)
    assert os.path.exists(s2_ckpt), s2_ckpt
    print(f"stage-2 drive done: {s2_ckpt}", flush=True)

    # ---- stage 3 (>= 500 iters at 256 px, shipped chain default) ---------
    s3_conf = os.path.join(args.root, "drive_s3.yml")
    opt3 = yaml.safe_load(open("confs/train_stage3_LOL.yml"))
    pretrained_vq = (opt3.get("path") or {}).get("pretrained_vqgan")
    over3 = {"datasets.train.GT_size": 256,
             "datasets.train.batch_size": 2,
             "path.pretrain_model_G": s2_ckpt,
             # frequent states: the trainer's NaN-recovery reloads the last
             # state and continues (an undertrained frozen flow can emit a
             # wild latent on an unlucky crop early in the drive)
             "logger.save_checkpoint_freq": 50.0,
             "train.lr_G": 2.5e-5}
    if not (pretrained_vq and os.path.exists(pretrained_vq)):
        over3["path.pretrained_vqgan"] = ""  # fresh-init VQ (none shipped)
    patch("confs/train_stage3_LOL.yml", "offsetdrive_s3", s3_conf, **over3)
    s3_ckpt = f"experiments/offsetdrive_s3/models/{args.s3_iters}_G.flax"
    if not os.path.exists(s3_ckpt):
        run("train_stage3.py", s3_conf, args.s3_iters)
    assert os.path.exists(s3_ckpt), s3_ckpt
    print(f"stage-3 drive done: {s3_ckpt}", flush=True)

    # ---- offset histogram at the protocol shape --------------------------
    cmd = [sys.executable, "-m", "tools.offset_histogram",
           "--ckpt", s3_ckpt,
           "--images", os.path.join(data_root, "eval15", "low"),
           "--height", "420", "--width", "620", "--n", "4"]
    print("running:", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
