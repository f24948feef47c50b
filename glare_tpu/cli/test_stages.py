"""Checkpoint-sweep evaluators (reference: code/test_stage2.py:81-194 and
code/test_stage3.py:104-221).

Iterate every ``*_G.flax`` under an experiment's models dir, run eval15,
report adjusted + unadjusted PSNR/SSIM (and LPIPS when weights are
available), and write a per-checkpoint CSV.

Stage 2: the netG output is a latent; it is decoded through the frozen
VQGAN (flow^-1 -> quantize/codebook retrieval -> decoder), input padded to
a multiple of 2 (test_stage2.py:141-145).
Stage 3: input reflect-padded bottom/left by 20 px then cropped back
(test_stage3.py:131-140).
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..measure import Measure
from ..options import dict_to_nonedict, parse
from ..models import create_model
from ..utils.imgproc import impad, imread, imwrite, log_transform
from ..utils.metrics import PSNR, calculate_ssim, gray_mean_adjust, img_as_ubyte
from ..utils.util import natsorted, opt_get


def run_checkpoint_sweep(stage, conf_path, models_dir=None):
    opt = parse(conf_path, is_train=False)
    opt["gpu_ids"] = None
    opt = dict_to_nonedict(opt)
    model = create_model(opt)

    if models_dir is None:
        models_dir = os.path.join(
            "experiments", f"train_stage{stage}_LOL", "models"
        )
    ckpts = natsorted(glob.glob(os.path.join(models_dir, "*_G.flax")))
    if not ckpts:
        print(f"No checkpoints under {models_dir}")
        return None

    lr_paths = natsorted(glob.glob(os.path.join(opt["dataroot_LR"], "*.png")))
    hr_paths = natsorted(glob.glob(os.path.join(opt["dataroot_GT"], "*.png")))
    measure = Measure()

    rows = []
    for ckpt in ckpts:
        model.load_network(ckpt)
        metrics = evaluate_once(stage, model, opt, lr_paths, hr_paths, measure)
        row = OrderedDict(checkpoint=os.path.basename(ckpt), **metrics)
        rows.append(row)
        print(", ".join(f"{k}: {v}" for k, v in row.items()))

    df = pd.DataFrame(rows)
    out_csv = os.path.join(models_dir, f"test_stage{stage}_metrics.csv")
    df.to_csv(out_csv, index=False)
    print(f"Wrote {out_csv}")
    return df


def evaluate_once(stage, model, opt, lr_paths, hr_paths, measure, save_dir=None):
    psnrs, ssims, lpips_l, psnrs_adj, ssims_adj = [], [], [], [], []
    log_low = opt_get(opt, ["datasets", "train", "log_low"], False)
    for lr_path, hr_path in zip(lr_paths, hr_paths):
        lr = imread(lr_path)
        hr = imread(hr_path)
        h, w, _ = lr.shape

        if stage == 3:
            lr_p = impad(lr, bottom=20, left=20)
        else:
            # pad to multiple of 4 for the latent stride
            pad_h = (-h) % 4
            pad_w = (-w) % 4
            lr_p = impad(lr, bottom=pad_h, right=pad_w)

        lr_t = lr_p.astype(np.float32) / 255.0
        if log_low:
            lr_t = log_transform(lr_t)
        sr = model.get_sr(jnp.asarray(lr_t)[None])
        if stage == 2:
            sr = model.decode_latent(sr)
            sr = np.asarray(sr)[0][:h, :w]
        else:
            sr = np.asarray(sr)[0][:h, 20:]

        restored = np.clip(sr, 0, 1)
        target = hr.astype(np.float64) / 255.0
        psnrs.append(PSNR(target, restored))
        ssims.append(calculate_ssim(img_as_ubyte(target), img_as_ubyte(np.clip(restored, 0, 1))))
        adj = gray_mean_adjust(restored, target)
        psnrs_adj.append(PSNR(target, adj))
        ssims_adj.append(calculate_ssim(img_as_ubyte(target), img_as_ubyte(adj)))
        lpips_l.append(measure.lpips(img_as_ubyte(adj), img_as_ubyte(target)))
        if save_dir:
            imwrite(os.path.join(save_dir, os.path.basename(hr_path)), img_as_ubyte(adj))

    return {
        "PSNR": float(np.mean(psnrs)),
        "SSIM": float(np.mean(ssims)),
        "PSNR_adj": float(np.mean(psnrs_adj)),
        "SSIM_adj": float(np.mean(ssims_adj)),
        "LPIPS": float(np.mean(lpips_l)),
    }


def main(stage):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", default="./confs/LOL.yml" if stage == 3 else "./confs/train_stage2_LOL.yml")
    parser.add_argument("--models_dir", default=None)
    args = parser.parse_args()
    run_checkpoint_sweep(stage, args.opt, args.models_dir)
