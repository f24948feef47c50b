"""Generic arch utilities (reference: basicsr/archs/arch_util.py).

NHWC/JAX equivalents of the BasicSR helpers the vendored tree ships:
``make_layer`` / ``ResidualBlockNoBN`` / ``Upsample`` (pixel-shuffle head,
arch_util.py:47-114), ``flow_warp`` / ``resize_flow`` (video-SR warping,
:116-187), ``pixel_unshuffle`` (:189-206) and ``default_init_weights``
(:17-44, expressed as flax initializers). Channel orderings match torch's
NCHW layouts exactly (the (c, sy, sx) interleave of pixel_(un)shuffle), so
converted checkpoints keep working; tested against torch in
tests/test_arch_util.py.

``trunc_normal_`` (arch_util.py:208-270) lives in sr/archs/swin.py with the
Swin blocks that use it; the ``DCNv2Pack`` defined there is covered by
glare_tpu.ops.dcn.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import Conv

Dtype = Any


def scaled_kaiming_init(scale=1.0, mode="fan_in"):
    """default_init_weights (arch_util.py:17-44): kaiming_normal then
    ``weight.data *= scale`` — as a flax kernel initializer (HWIO)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, _ = shape
        fan = kh * kw * (cin if mode == "fan_in" else shape[-1])
        std = (2.0 / fan) ** 0.5  # kaiming_normal, a=0
        return scale * std * jax.random.normal(key, shape, dtype)

    return init


def make_layer(basic_block: Callable[[], nn.Module], num_basic_block: int):
    """arch_util.py:47-60 — stacked same-type blocks. Returns the module
    list; flax modules compose by calling them in sequence."""
    return [basic_block() for _ in range(num_basic_block)]


class ResidualBlockNoBN(nn.Module):
    """arch_util.py:63-92: x + res_scale * conv2(relu(conv1(x))).

    ``pytorch_init=False`` (the default) uses the BasicSR scaled-kaiming
    init (scale 0.1); True keeps torch's default conv init.
    """

    num_feat: int = 64
    res_scale: float = 1.0
    pytorch_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pytorch_init:
            conv1 = Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                         name="conv1")
            conv2 = Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                         name="conv2")
        else:
            conv1 = Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                         kernel_init=scaled_kaiming_init(0.1), name="conv1")
            conv2 = Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                         kernel_init=scaled_kaiming_init(0.1), name="conv2")
        identity = x
        out = conv2(jax.nn.relu(conv1(x)))
        return identity + out * self.res_scale


def pixel_shuffle(x, scale):
    """torch F.pixel_shuffle in NHWC: [B, H, W, C*s^2] -> [B, H*s, W*s, C]
    with torch's channel interleave c*s^2 + sy*s + sx."""
    B, H, W, C = x.shape
    s = scale
    c = C // (s * s)
    x = x.reshape(B, H, W, c, s, s)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # B, H, sy, W, sx, c
    return x.reshape(B, H * s, W * s, c)


def pixel_unshuffle(x, scale):
    """arch_util.py:189-206 in NHWC: [B, H, W, C] -> [B, H/s, W/s, C*s^2],
    output channel index = c*s^2 + sy*s + sx (torch parity)."""
    B, H, W, C = x.shape
    s = scale
    assert H % s == 0 and W % s == 0
    x = x.reshape(B, H // s, s, W // s, s, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # B, h, w, c, sy, sx
    return x.reshape(B, H // s, W // s, C * s * s)


class Upsample(nn.Module):
    """arch_util.py:94-114: conv-to-C*r^2 + pixel_shuffle per factor-of-2
    (or one x3 step). Scale must be 2^n or 3."""

    scale: int
    num_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # 2^n
            n = scale.bit_length() - 1
            for i in range(n):
                x = Conv(4 * self.num_feat, (3, 3), padding=1,
                         dtype=self.dtype, name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = Conv(9 * self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                     name="conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(
                f"scale {scale} is not supported. Supported scales: 2^n and 3."
            )
        return x


def flow_warp(x, flow, interp_mode="bilinear", padding_mode="zeros",
              align_corners=True):
    """arch_util.py:116-147 — grid_sample(x, grid + flow).

    x [B, H, W, C]; flow [B, H, W, 2] as (dx, dy) pixel displacements (the
    BasicSR convention: flow[..., 0] moves along W). Unbounded offsets;
    both align_corners conventions match grid_sample (True is the reference
    default). A utility (video-SR alignment), not a GLARE hot path — the
    bounded hot ops are ops.dcn / ops.warp."""
    B, H, W, C = x.shape
    assert flow.shape[:3] == (B, H, W) and flow.shape[3] == 2
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    px = gx[None] + flow[..., 0].astype(jnp.float32)  # [B, H, W]
    py = gy[None] + flow[..., 1].astype(jnp.float32)
    if not align_corners:
        # The reference normalizes pixel coords with the align_corners=True
        # convention (v = 2p/max(S-1,1) - 1) and then lets grid_sample
        # denormalize them with the align_corners=False one
        # (p' = ((v+1)*S - 1)/2), which nets out to a scale-and-shift of the
        # sample positions: p' = p*S/max(S-1,1) - 0.5.
        px = px * (W / max(W - 1, 1)) - 0.5
        py = py * (H / max(H - 1, 1)) - 0.5

    if interp_mode == "nearest":
        ys = [jnp.round(py)]
        xs = [jnp.round(px)]
        wts = [jnp.ones_like(py)]
    else:
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ys = [y0, y0, y0 + 1, y0 + 1]
        xs = [x0, x0 + 1, x0, x0 + 1]
        wy1 = py - y0
        wx1 = px - x0
        wts = [(1 - wy1) * (1 - wx1), (1 - wy1) * wx1,
               wy1 * (1 - wx1), wy1 * wx1]

    flat = x.reshape(B, H * W, C)
    out = jnp.zeros((B, H * W, C), x.dtype)
    for yy, xx, w in zip(ys, xs, wts):
        if padding_mode == "border":
            valid = jnp.ones_like(w, bool)
        else:  # zeros
            valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, H * W)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        out = out + vals * (w * valid).reshape(B, H * W, 1).astype(x.dtype)
    return out.reshape(B, H, W, C)


def _interp_axis(x, out_size, axis, mode, align_corners):
    """torch F.interpolate semantics along one spatial axis (separable)."""
    in_size = x.shape[axis]
    if mode == "nearest":
        # torch's legacy 'nearest': src = floor(dst * in/out)
        idx = jnp.floor(
            jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
        ).astype(jnp.int32)
        return jnp.take(x, jnp.clip(idx, 0, in_size - 1), axis=axis)
    if align_corners:
        pos = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / max(out_size - 1, 1))
    else:
        # half-pixel centers, clamped at 0 like torch's
        # upsample_bilinear2d(align_corners=False)
        pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (
            in_size / out_size) - 0.5
        pos = jnp.maximum(pos, 0.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = pos - i0.astype(jnp.float32)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    return (jnp.take(x, i0, axis=axis) * (1.0 - w1)
            + jnp.take(x, i1, axis=axis) * w1)


def resize_flow(flow, size_type, sizes: Sequence, interp_mode="bilinear",
                align_corners=False):
    """arch_util.py:150-187: resize a [B, H, W, 2] flow field and rescale
    its (dx, dy) values by the resolution ratio.

    interp_mode: 'bilinear' (align_corners honored, torch F.interpolate
    semantics incl. the align_corners=False half-pixel clamp) or 'nearest'
    (torch's floor convention; note the reference as shipped *errors* here,
    since F.interpolate forbids passing align_corners with mode='nearest').
    Other modes raise rather than silently degrading."""
    if interp_mode not in ("bilinear", "nearest"):
        raise ValueError(
            f"interp_mode must be 'bilinear' or 'nearest', got {interp_mode!r}")
    B, H, W, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(H * sizes[0]), int(W * sizes[1])
    elif size_type == "shape":
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError(f"size_type must be ratio or shape, got {size_type}")
    ratio_h = out_h / H
    ratio_w = out_w / W
    scaled = flow.astype(jnp.float32) * jnp.asarray(
        [ratio_w, ratio_h], jnp.float32
    )
    out = _interp_axis(scaled, out_h, 1, interp_mode, align_corners)
    return _interp_axis(out, out_w, 2, interp_mode, align_corners)
