"""Normalizing-flow primitive layers (NHWC, flax.linen).

Parity targets in the reference:
  * ActNorm2d with data-dependent init          — FlowActNorms.py:10-113
  * InvertibleConv1x1 (QR init, slogdet logdet) — Permutations.py:12-59
  * flow.Conv2d (+ActNorm), flow.Conv2dZeros    — flow.py:13-70
  * GaussianDiag                                — flow.py:73-112
  * squeeze2d/unsqueeze2d/SqueezeLayer          — flow.py:115-159

Conventions:
  * arrays are NHWC; per-channel parameters have shape [C].
  * ``logdet`` is a per-sample vector [B].
  * ``reverse`` is a static Python bool (separate traces for encode/decode).
  * data-dependent ActNorm init: call the model once with ``ddinit=True`` and
    ``mutable=['actnorm_init']``; each ActNorm writes its batch statistics to
    the 'actnorm_init' collection *and* uses them immediately (replicating
    torch's sequential in-place init). Merge into params with
    :func:`merge_actnorm_init`.

The reference's inf-retry jitter around slogdet/inverse
(Permutations.py:24-42) is not replicated: with C=3 latent channels the
closed-form f32 path is stable; NaN/inf guards live in the loss masks.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any
LOG2PI = float(np.log(2 * np.pi))


def pixels(x):
    """Spatial pixel count of an NHWC tensor (reference: thops.py pixels)."""
    return x.shape[1] * x.shape[2]


def sum_per_sample(x):
    """Sum over all non-batch axes -> [B]."""
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def split_feature_cross(h):
    """'cross' split: even channels, odd channels (reference: thops.py:39-47).

    Returns (a, b) = (h[..., 0::2], h[..., 1::2]).
    """
    return h[..., 0::2], h[..., 1::2]


def cat_feature(a, b):
    return jnp.concatenate([a, b], axis=-1)


class ActNorm2d(nn.Module):
    """Per-channel learned bias + log-scale with data-dependent init
    (reference: FlowActNorms.py:10-113)."""

    num_features: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, logdet=None, reverse=False, ddinit=False):
        assert x.shape[-1] == self.num_features, (x.shape, self.num_features)
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        logs = self.param("logs", nn.initializers.zeros, (self.num_features,))

        if ddinit:
            xf = x.astype(jnp.float32)
            b_init = -jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean((xf + b_init) ** 2, axis=(0, 1, 2))
            l_init = jnp.log(self.scale / (jnp.sqrt(var) + 1e-6))
            iv_b = self.variable("actnorm_init", "bias", lambda: b_init)
            iv_l = self.variable("actnorm_init", "logs", lambda: l_init)
            iv_b.value = b_init
            iv_l.value = l_init
            bias, logs = b_init, l_init

        bias = bias.astype(x.dtype)
        scale = jnp.exp(logs).astype(x.dtype)
        if not reverse:
            x = (x + bias) * scale
        else:
            x = x * jnp.exp(-logs).astype(x.dtype) - bias

        if logdet is not None:
            dlogdet = jnp.sum(logs) * pixels(x)
            logdet = logdet - dlogdet if reverse else logdet + dlogdet
        return x, logdet


def _qr_init(key, shape, dtype=jnp.float32):
    a = jax.random.normal(key, shape, jnp.float32)
    q, _ = jnp.linalg.qr(a)
    return q.astype(dtype)


def _det_and_inv(w):
    """Closed-form determinant and inverse for the tiny channel-mixing
    matrices the flow uses (C<=3). Avoids jnp.linalg's general LU lowering,
    which bloats the HLO 28x across the unrolled flow steps on TPU."""
    c = w.shape[0]
    if c == 1:
        det = w[0, 0]
        inv = (1.0 / det)[None, None]
        return det, inv
    if c == 2:
        det = w[0, 0] * w[1, 1] - w[0, 1] * w[1, 0]
        inv = jnp.array([[w[1, 1], -w[0, 1]], [-w[1, 0], w[0, 0]]]) / det
        return det, inv
    if c == 3:
        cof00 = w[1, 1] * w[2, 2] - w[1, 2] * w[2, 1]
        cof01 = w[1, 2] * w[2, 0] - w[1, 0] * w[2, 2]
        cof02 = w[1, 0] * w[2, 1] - w[1, 1] * w[2, 0]
        det = w[0, 0] * cof00 + w[0, 1] * cof01 + w[0, 2] * cof02
        adj = jnp.array(
            [
                [cof00, w[0, 2] * w[2, 1] - w[0, 1] * w[2, 2], w[0, 1] * w[1, 2] - w[0, 2] * w[1, 1]],
                [cof01, w[0, 0] * w[2, 2] - w[0, 2] * w[2, 0], w[0, 2] * w[1, 0] - w[0, 0] * w[1, 2]],
                [cof02, w[0, 1] * w[2, 0] - w[0, 0] * w[2, 1], w[0, 0] * w[1, 1] - w[0, 1] * w[1, 0]],
            ]
        )
        return det, adj / det
    det = jnp.linalg.det(w)
    return det, jnp.linalg.inv(w)


class InvertibleConv1x1(nn.Module):
    """1x1 invertible channel-mixing conv (reference: Permutations.py:12-59).

    logdet = log|det W| * pixels. Reverse applies W^{-1} (closed-form f32
    adjugate at C<=3; the reference's float64 inverse + slogdet-retry hacks
    are unnecessary at this size).
    """

    num_channels: int

    @nn.compact
    def __call__(self, x, logdet=None, reverse=False):
        w = self.param("weight", _qr_init, (self.num_channels, self.num_channels))
        w32 = w.astype(jnp.float32)
        det, w_inv = _det_and_inv(w32)
        dlogdet = jnp.log(jnp.abs(det)) * pixels(x)
        if not reverse:
            # torch: out[o] = sum_i W[o, i] * in[i]
            z = jnp.einsum("bhwi,oi->bhwo", x, w.astype(x.dtype))
            if logdet is not None:
                logdet = logdet + dlogdet
        else:
            z = jnp.einsum("bhwi,oi->bhwo", x, w_inv.astype(x.dtype))
            if logdet is not None:
                logdet = logdet - dlogdet
        return z, logdet


def _normal_init(std):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Conv2dNormed(nn.Module):
    """3x3 (or 1x1) same-pad conv, weight~N(0, 0.05), no bias, followed by
    ActNorm (reference: flow.py:13-52)."""

    features: int
    kernel_size: tuple = (3, 3)
    weight_std: float = 0.05

    @nn.compact
    def __call__(self, x, ddinit=False):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", _normal_init(self.weight_std), (kh, kw, x.shape[-1], self.features)
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=[((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y, _ = ActNorm2d(self.features, name="actnorm")(y, None, reverse=False, ddinit=ddinit)
        return y


class Conv2dZeros(nn.Module):
    """Zero-init conv with output scaling exp(logs*3) (reference: flow.py:55-70)."""

    features: int
    kernel_size: tuple = (3, 3)
    logscale_factor: float = 3.0

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.zeros, (kh, kw, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        logs = self.param("logs", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=[((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias.astype(x.dtype)
        return y * jnp.exp(logs * self.logscale_factor).astype(x.dtype)


class GaussianDiag:
    """Diagonal-Gaussian likelihood helpers (reference: flow.py:73-112)."""

    @staticmethod
    def likelihood(mean, logs, x):
        if mean is None and logs is None:
            return -0.5 * (x ** 2 + LOG2PI)
        return -0.5 * (logs * 2.0 + ((x - mean) ** 2) / jnp.exp(logs * 2.0) + LOG2PI)

    @staticmethod
    def logp(mean, logs, x):
        return sum_per_sample(GaussianDiag.likelihood(mean, logs, x))

    @staticmethod
    def sample(key, mean, logs, eps_std=1.0):
        eps = jax.random.normal(key, mean.shape, mean.dtype) * eps_std
        return mean + jnp.exp(logs) * eps

    @staticmethod
    def sample_eps(key, shape, eps_std=1.0, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * eps_std


def squeeze2d(x, factor=2):
    """Space-to-channel with torch GLARE channel order (C, fy, fx)
    (reference: flow.py:115-128), on NHWC input."""
    if factor == 1:
        return x
    b, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/f, W/f, C, fy, fx
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def unsqueeze2d(x, factor=2):
    """Inverse of :func:`squeeze2d` (reference: flow.py:131-145)."""
    if factor == 1:
        return x
    b, h, w, c = x.shape
    f2 = factor ** 2
    assert c % f2 == 0, c
    x = x.reshape(b, h, w, c // f2, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, fy, W, fx, C/f2
    return x.reshape(b, h * factor, w * factor, c // f2)


class SqueezeLayer(nn.Module):
    factor: int = 2

    def __call__(self, x, logdet=None, reverse=False):
        if not reverse:
            return squeeze2d(x, self.factor), logdet
        return unsqueeze2d(x, self.factor), logdet


def merge_actnorm_init(params, actnorm_stats):
    """Overwrite ActNorm params with data-dependent statistics.

    `actnorm_stats` is the 'actnorm_init' collection returned by an apply
    with ``ddinit=True, mutable=['actnorm_init']``; its tree is a sub-tree of
    `params` with the same paths for bias/logs leaves.
    """

    def merge(p, s):
        if not isinstance(s, dict):
            return s
        out = dict(p)
        for k, v in s.items():
            if k in out:
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    return merge(p, flax.core.unfreeze(actnorm_stats) if hasattr(actnorm_stats, "unfreeze") else actnorm_stats)
