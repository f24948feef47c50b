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
    """Depthwise valid conv with a 2D window; img NHWC.

    precision=HIGHEST: these convs feed variance estimates E[x^2]-mu^2
    whose true magnitude can sit far below C2=9e-4. On TPU the default
    f32 conv precision is bf16 multiplies (~8e-3 relative error), which
    drove sigma1+sigma2+C2 negative on real 256px training batches and
    NaN'd the stage-3 loss through the fractional pow in msssim (round-4
    offset-drive crash, experiments/offsetdrive_s3_archived_*). The
    reference computes these in full f32 CUDA; HIGHEST restores that.
    """
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
        precision=jax.lax.Precision.HIGHEST,
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
    # variances are >= 0 in exact arithmetic; clamp the E[x^2]-mu^2
    # cancellation residue so v2 = sigma1+sigma2+C2 stays >= C2 > 0 and
    # cs stays in [-1, 1] (up to rounding) — see _filter_valid docstring
    sigma1_sq = jnp.maximum(_filter_valid(img1 * img1, window) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_filter_valid(img2 * img2, window) - mu2_sq, 0.0)
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

    return _combine(jnp.stack(mssim), jnp.stack(mcs), weights, normalize)


def _combine(mssim, mcs, weights, normalize):
    """Per-level ssim/cs -> scalar MS-SSIM (split out for the NaN
    regression test, tests/test_msssim_robustness.py)."""
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    # safe pow: ssim/cs live in [-1, 1] only up to float rounding, so the
    # (x+1)/2 normalization can still hand a (slightly) negative base to a
    # fractional exponent -> NaN. That NaN killed the round-4 stage-3
    # offset drive at iter 1 (ssim_loss: nan). Clamp to a tiny positive
    # floor: forward effect is nil for in-range values (bases ~0.5..1) and
    # the gradient stays finite (d/dx x^w -> inf at x=0 for w<1).
    eps = jnp.asarray(1e-6, mssim.dtype)
    pow1 = jnp.maximum(mcs, eps) ** weights
    pow2 = jnp.maximum(mssim, eps) ** weights
    # protocol quirk kept bug-for-bug: the reference computes
    # prod(pow1[:-1] * pow2[-1]) (pytorch_msssim/__init__.py:100-103), which
    # broadcasts the last-level ssim term into all four cs factors, i.e.
    # prod(pow1[:-1]) * pow2[-1]**4 — not the canonical MS-SSIM combination.
    return jnp.prod(pow1[:-1] * pow2[-1])
