"""Metric harness (reference: code/Measure.py:17-109).

``Measure.measure(imgA, imgB)`` -> (psnr, ssim, lpips) on uint8 HWC RGB.
LPIPS requires converted AlexNet weights (see utils/lpips_jax.py); without
them it reports NaN. Also a dir-vs-dir CLI: ``python -m glare_tpu.measure
-dirA a -dirB b``.
"""

from __future__ import annotations

import argparse
import glob
import math
import os
import time
from collections import OrderedDict

import numpy as np

from .utils.metrics import calculate_psnr, calculate_ssim
from .utils.util import natsorted


def t(img):
    """uint8 HWC -> NHWC float in [-1, 1] (reference: Measure.py:66-67)."""
    img = np.asarray(img).astype(np.float32) / 255.0 * 2 - 1
    return img[None, ...]


class Measure:
    def __init__(self, net="alex", use_gpu=False):
        self._lpips_fn = None
        self._lpips_tried = False

    def measure(self, imgA, imgB):
        return [f(imgA, imgB) for f in [self.psnr, self.ssim, self.lpips]]

    def lpips(self, imgA, imgB, model=None):
        if not self._lpips_tried:
            from .utils.lpips_jax import load_lpips

            self._lpips_fn = load_lpips()
            self._lpips_tried = True
            if self._lpips_fn is None:
                import logging

                logging.getLogger("base").warning(
                    "LPIPS weights unavailable (set GLARE_LPIPS_NPZ); reporting NaN"
                )
        if self._lpips_fn is None:
            return float("nan")
        import jax.numpy as jnp

        return float(self._lpips_fn(jnp.asarray(t(imgA)), jnp.asarray(t(imgB))))

    def psnr(self, imgA, imgB):
        return calculate_psnr(imgA, imgB)

    def ssim(self, imgA, imgB):
        return calculate_ssim(imgA, imgB)


def format_result(psnr, ssim, lpips):
    return f"{psnr:0.2f}, {ssim:0.3f}, {lpips:0.3f}"


def measure_dirs(dirA, dirB, use_gpu=False, verbose=False):
    vprint = print if verbose else (lambda x: None)

    t_init = time.time()
    paths_A = natsorted(glob.glob(os.path.join(dirA, "**", "*.png"), recursive=True))
    paths_B = natsorted(glob.glob(os.path.join(dirB, "**", "*.png"), recursive=True))
    vprint(f"Measuring: {dirA} vs {dirB}")

    import cv2

    measure = Measure(use_gpu=use_gpu)
    results = []
    for pathA, pathB in zip(paths_A, paths_B):
        imgA = cv2.imread(pathA)[:, :, ::-1]
        imgB = cv2.imread(pathB)[:, :, ::-1]
        result = OrderedDict(name=os.path.basename(pathA))
        result["psnr"], result["ssim"], result["lpips"] = measure.measure(imgA, imgB)
        results.append(result)
        vprint(format_result(result["psnr"], result["ssim"], result["lpips"]))

    psnr = np.mean([r["psnr"] for r in results])
    ssim = np.mean([r["ssim"] for r in results])
    lpips_v = np.mean([r["lpips"] for r in results])
    vprint(f"Final Result: {format_result(psnr, ssim, lpips_v)}, {time.time() - t_init:0.1f}s")
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-dirA", default="", type=str)
    parser.add_argument("-dirB", default="", type=str)
    parser.add_argument("-v", action="store_true")
    args = parser.parse_args()
    assert args.dirA and args.dirB
    measure_dirs(args.dirA, args.dirB, use_gpu=False, verbose=True)
