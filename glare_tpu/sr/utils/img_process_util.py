"""USM sharpening (reference: basicsr/utils/img_process_util.py).

``usm_sharp`` is the numpy/cv2 path (identical protocol); ``filter2D`` and
``USMSharp`` are the batched device versions, NHWC in JAX with a depthwise
reflect-padded convolution instead of the reference's per-image grouped
NCHW conv.
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def usm_sharp(img, weight=0.5, radius=50, threshold=10):
    """Unsharp masking on one HWC float32 [0,1] image
    (reference: img_process_util.py:34-61)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype("float32")
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def filter2D(img, kernel):
    """Batched 2-D filtering, NHWC (reference: img_process_util.py:7-31).

    img:    [B, H, W, C]
    kernel: [k, k] (shared) or [B, k, k] (per-sample)
    """
    kernel = jnp.asarray(kernel, img.dtype)
    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError("Wrong kernel size")
    B, H, W, C = img.shape
    pad = k // 2
    x = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    if kernel.ndim == 2:
        # depthwise conv: one shared kernel over all channels
        w = jnp.tile(kernel[:, :, None, None], (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
    # per-sample kernels: vmap the single-image depthwise conv over batch
    def one(xi, ki):
        w = jnp.tile(ki[:, :, None, None], (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            xi[None], w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )[0]

    return jax.vmap(one)(x, kernel)


class USMSharp:
    """Device USM sharpener (reference: img_process_util.py:64-83), NHWC."""

    def __init__(self, radius=50, sigma=0):
        if radius % 2 == 0:
            radius += 1
        self.radius = radius
        kernel = cv2.getGaussianKernel(radius, sigma)
        self.kernel = jnp.asarray(np.outer(kernel, kernel), jnp.float32)

    def __call__(self, img, weight=0.5, threshold=10):
        blur = filter2D(img, self.kernel)
        residual = img - blur
        mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
        soft_mask = filter2D(mask, self.kernel)
        sharp = jnp.clip(img + weight * residual, 0, 1)
        return soft_mask * sharp + (1 - soft_mask) * img
