"""Differentiable SSIM / MS-SSIM loss (reference: pytorch_msssim/__init__.py).

Semantics kept: 11x11 sigma=1.5 Gaussian window, *valid* (no-pad) grouped
convolution, per-level avg-pool-2 pyramid with weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333], ``normalize=True`` maps both
ssim and cs through (x+1)/2 (stage-3 training uses normalize=True,
VQLLFLOWD_model.py:221). NHWC inputs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size=11, sigma=1.5):
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2)) for x in range(window_size)]
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w2d)


def _filter_valid(img, window):
    """Depthwise valid conv with a 2D window; img NHWC."""
    c = img.shape[-1]
    k = window.shape[0]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 per group
    return jax.lax.conv_general_dilated(
        img,
        kernel.astype(img.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(img1, img2, window_size=11, val_range=1.0, full=False):
    """Mean SSIM over the batch; differentiable. Inputs NHWC in [0, 1]."""
    h, w = img1.shape[1], img1.shape[2]
    real_size = min(window_size, h, w)
    window = _gaussian_window(real_size)

    mu1 = _filter_valid(img1, window)
    mu2 = _filter_valid(img2, window)
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter_valid(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter_valid(img2 * img2, window) - mu2_sq
    sigma12 = _filter_valid(img1 * img2, window) - mu1_mu2

    C1 = (0.01 * val_range) ** 2
    C2 = (0.03 * val_range) ** 2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    ret = jnp.mean(ssim_map)
    if full:
        return ret, cs
    return ret


def msssim(img1, img2, window_size=11, val_range=1.0, normalize=False):
    """5-level MS-SSIM (reference: pytorch_msssim/__init__.py:71-104)."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], jnp.float32)
    levels = weights.shape[0]
    mssim = []
    mcs = []
    for _ in range(levels):
        sim, cs = ssim(img1, img2, window_size=window_size, val_range=val_range, full=True)
        mssim.append(sim)
        mcs.append(cs)
        img1 = jax.lax.reduce_window(
            img1, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        img2 = jax.lax.reduce_window(
            img2, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0

    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    pow1 = mcs ** weights
    pow2 = mssim ** weights
    # protocol quirk kept bug-for-bug: the reference computes
    # prod(pow1[:-1] * pow2[-1]) (pytorch_msssim/__init__.py:100-103), which
    # broadcasts the last-level ssim term into all four cs factors, i.e.
    # prod(pow1[:-1]) * pow2[-1]**4 — not the canonical MS-SSIM combination.
    return jnp.prod(pow1[:-1] * pow2[-1])
