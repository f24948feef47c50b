"""Registered evaluation metrics (reference: basicsr/metrics/*).

Note: the reference ships metric CLIs that import `basicsr.metrics` symbols
which were never vendored (non-functional as shipped; SURVEY.md §2.2).
These are working equivalents: PSNR/SSIM with crop_border and Y-channel
options registered in METRIC_REGISTRY. NIQE/FID require pretrained
statistics (pristine-corpus MVG / Inception) unavailable offline and raise
informative errors.
"""

from __future__ import annotations

import numpy as np

from ..utils.matlab_functions import bgr2ycbcr, rgb2ycbcr
from ..utils.metrics import calculate_psnr as _psnr_255
from ..utils.metrics import calculate_ssim as _ssim_255
from .registry import METRIC_REGISTRY


def _prep(img, crop_border, test_y_channel, input_order="HWC"):
    img = np.asarray(img)
    if input_order == "CHW":
        img = img.transpose(1, 2, 0)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel and img.ndim == 3 and img.shape[2] == 3:
        imgf = img.astype(np.float32) / 255.0 if img.dtype == np.uint8 else img
        img = rgb2ycbcr(imgf, y_only=True) * 255.0
    return img


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border=0, input_order="HWC", test_y_channel=False, **_):
    """PSNR in the [0,255] convention (reference: metrics/psnr_ssim.py)."""
    a = _prep(img, crop_border, test_y_channel, input_order)
    b = _prep(img2, crop_border, test_y_channel, input_order)
    return _psnr_255(a, b)


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border=0, input_order="HWC", test_y_channel=False, **_):
    """MATLAB-style SSIM (reference: metrics/psnr_ssim.py)."""
    a = _prep(img, crop_border, test_y_channel, input_order)
    b = _prep(img2, crop_border, test_y_channel, input_order)
    return _ssim_255(a, b)


@METRIC_REGISTRY.register()
def calculate_niqe(img, crop_border=0, input_order="HWC", convert_to="y", **kw):
    """Working NIQE (reference CLI: metrics/calculate_niqe.py imports a
    never-vendored basicsr.metrics — this is the functional equivalent,
    implemented in glare_tpu.utils.niqe). Pristine-model parameters come from
    $GLARE_NIQE_PARAMS (.npz or modelparameters.mat), an explicit
    ``pris_params=(mu, cov)``, or ``glare_tpu.utils.niqe.fit_niqe_params``;
    without any of those it raises an informative error."""
    from ..utils.niqe import calculate_niqe as _niqe

    return _niqe(img, crop_border=crop_border, input_order=input_order,
                 convert_to=convert_to, **kw)


# FID lives in metrics_fid.py (frechet distance + stats + the stats-file
# workflow of the reference CLIs); importing registers `calculate_fid`
from . import metrics_fid  # noqa: F401,E402


def build_metric(name):
    return METRIC_REGISTRY.get(name)
