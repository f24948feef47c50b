"""Unpaired enhancement CLI (reference: code/infer_unpaired.py:81-136):
reflect-pad to a multiple of 16, enhance, crop back, assert shape, save."""

from __future__ import annotations

import argparse
import glob
import os

import jax.numpy as jnp
import numpy as np

from ..utils.imgproc import auto_padding, imread, imwrite, log_transform
from ..utils.metrics import img_as_ubyte
from ..utils.util import natsorted, opt_get
from .infer_paired import load_model


def main(default_conf="./confs/LOL.yml"):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", default=default_conf)
    parser.add_argument("-n", "--name", default="unpaired")
    args = parser.parse_args()
    conf = os.path.basename(args.opt).replace(".yml", "")
    model, opt = load_model(args.opt)

    lr_dir = opt["dataroot_unpaired"]
    lr_paths = natsorted(
        glob.glob(os.path.join(lr_dir, "*.png"))
        + glob.glob(os.path.join(lr_dir, "*.jpg"))
        + glob.glob(os.path.join(lr_dir, "*.bmp"))
    )
    assert lr_paths, f"no images under {lr_dir}"
    test_dir = os.path.join("results", conf, args.name)
    os.makedirs(test_dir, exist_ok=True)

    for lr_path in lr_paths:
        lr = imread(lr_path)
        raw_shape = lr.shape
        lr, padding_params = auto_padding(lr, times=16)
        lr_t = lr.astype(np.float32) / 255.0
        if opt_get(opt, ["datasets", "train", "log_low"], False):
            lr_t = log_transform(lr_t)
        sr = np.asarray(model.get_sr(lq=jnp.asarray(lr_t)[None], heat=None))[0]
        h1, h2, w1, w2 = padding_params
        sr = sr[h1 : sr.shape[0] - h2, w1 : sr.shape[1] - w2, :]
        assert sr.shape == raw_shape, (sr.shape, raw_shape)
        out = img_as_ubyte(np.clip(sr, 0, 1))
        imwrite(os.path.join(test_dir, os.path.basename(lr_path)), out)
        print(f"{lr_path} -> {test_dir}")
