"""Legacy architecture modules present in the reference but unused by the
shipped GLARE confs — re-implemented NHWC/flax for drop-in completeness.

Coverage (reference file -> here):
  * ``code/models/modules/RRDBNet_arch.py`` -> :class:`ResidualDenseBlock5C`,
    :class:`RRDB`, :class:`RRDBNet` (ESRGAN encoder alternative to
    ConEncoder1; ``get_steps`` returns the ``fea_up*`` pyramid).
  * ``code/models/modules/color_encoder.py`` -> :class:`ColorEncoder`
    (U-Net reflectance head producing a blurred color map).
  * ``code/models/modules/base_layers.py`` -> :class:`Conv2D`,
    :class:`ConvTranspose2D`, :class:`ConvBNRelu`, :class:`DoubleConv`,
    :class:`ResConv`, :class:`MSIA`, :class:`ChannelAttention`,
    :class:`SpatialAttention`, :class:`CBAM`, :func:`pad_concat`.
  * ``code/models/modules/loss.py`` -> :func:`charbonnier_sum_loss`,
    :class:`LegacyGANLoss`, :func:`gradient_penalty_loss`.
  * ``code/models/modules/glow_arch.py`` (``f_conv2d_bias``) is folded into
    the flow upsampler head (see flow_upsampler.py docstring) — no separate
    class is needed.

Reference bugs are replicated bit-for-bit where a caller could observe them
(they are part of the trained-network function):
  * CBAM.forward returns the channel-attended tensor and DISCARDS the
    spatial-attention product (base_layers.py:175-178).
  * ResConv applies ``bn1`` twice — ``bn2`` exists but is never used
    (base_layers.py:86-88).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Conv

Dtype = Any


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _kaiming_scaled_init(scale):
    """torch mutil.initialize_weights: kaiming_normal(fan_in) * scale
    (RRDBNet_arch.py:24)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        std = (2.0 / fan_in) ** 0.5
        return jax.random.normal(key, shape, dtype) * std * scale

    return init


class _ConvInit(nn.Module):
    """3x3 conv with the 0.1-scaled kaiming init of the RDB blocks."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", _kaiming_scaled_init(0.1), (3, 3, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dtype)


class ResidualDenseBlock5C(nn.Module):
    """Dense block: 5 convs on growing concat, 0.2-scaled residual
    (reference: RRDBNet_arch.py:12-32)."""

    nf: int = 64
    gc: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x1 = _lrelu(_ConvInit(self.gc, self.dtype, name="conv1")(x))
        x2 = _lrelu(_ConvInit(self.gc, self.dtype, name="conv2")(
            jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(_ConvInit(self.gc, self.dtype, name="conv3")(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(_ConvInit(self.gc, self.dtype, name="conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _ConvInit(self.nf, self.dtype, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (reference: RRDBNet_arch.py:35-48)."""

    nf: int
    gc: int = 32
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """ESRGAN-style RRDB trunk with the GLARE-specific stride-2 stem and
    feature pyramid (reference: RRDBNet_arch.py:51-134).

    ``__call__(x, get_steps=True)`` returns the ``fea_up*`` dict the flow
    network consumes; ``block_idxs`` mirrors
    ``network_G.flow.stackRRDB.blocks``; ``fea_up0`` mirrors the conf flag.
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scale: int = 4
    block_idxs: Sequence[int] = ()
    fea_up0: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, get_steps: bool = False):
        fea = Conv(self.nf, (3, 3), strides=(2, 2), padding=1,
                   dtype=self.dtype, name="conv_first")(x)

        block_results = {}
        for idx in range(self.nb):
            fea = RRDB(self.nf, self.gc, self.dtype, name=f"trunk_{idx}")(fea)
            if idx in self.block_idxs:
                block_results[f"block_{idx}"] = fea
        trunk = Conv(self.nf, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="trunk_conv")(fea)
        fea = nn.max_pool(fea, (2, 2), strides=(2, 2))
        last_lr_fea = fea + trunk

        def up2(z):
            b, h, w, c = z.shape
            return jax.image.resize(z, (b, 2 * h, 2 * w, c), method="nearest")

        # the reference's nn.LeakyReLU(inplace=True) MUTATES the fea_up*
        # tensors after they are captured (RRDBNet_arch.py:91-95), so the
        # get_steps dict actually holds POST-activation values despite the
        # "# raw" comments — replicated here
        fea = _lrelu(Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                          name="upconv1")(up2(last_lr_fea)))
        fea_up2 = fea
        fea = _lrelu(Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                          name="upconv2")(up2(fea)))
        fea_up4 = fea

        fea_up8 = fea_up16 = fea_up32 = None
        if self.scale >= 8:
            fea = _lrelu(Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                              name="upconv3")(fea))
            fea_up8 = fea
        if self.scale >= 16:
            fea = _lrelu(Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                              name="upconv4")(fea))
            fea_up16 = fea
        if self.scale >= 32:
            fea = _lrelu(Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                              name="upconv5")(fea))
            fea_up32 = fea

        out = Conv(self.out_nc, (3, 3), padding=1, dtype=self.dtype,
                   name="conv_last")(
            _lrelu(Conv(self.nf, (3, 3), padding=1, dtype=self.dtype,
                        name="HRconv")(fea)))

        if not get_steps:
            return out

        results = {
            "last_lr_fea": last_lr_fea,
            "fea_up1": last_lr_fea,
            "fea_up2": fea_up2,
            "fea_up4": fea_up4,
            "fea_up8": fea_up8,
            "fea_up16": fea_up16,
            "fea_up32": fea_up32,
            "out": out,
        }

        def down_bilinear(z, factor):
            # torch F.interpolate(..., mode='bilinear', align_corners=False)
            # does NOT antialias on downscale
            b, h, w, c = z.shape
            return jax.image.resize(
                z, (b, h // factor, w // factor, c), method="bilinear",
                antialias=False,
            )

        if self.fea_up0:
            results["fea_up0"] = down_bilinear(last_lr_fea, 2)
        results["fea_up-1"] = down_bilinear(last_lr_fea, 4)
        results.update(block_results)
        return results


# ---------------------------------------------------------------- base_layers


class Conv2D(nn.Module):
    """3x3 conv + LeakyReLU(0.01)/ReLU (reference: base_layers.py:91-103;
    torch's nn.LeakyReLU default slope is 0.01)."""

    features: int
    activation: str = "lrelu"
    strides: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=1, dtype=self.dtype, name="conv")(x)
        return jax.nn.relu(y) if self.activation == "relu" else _lrelu(y, 0.01)


class ConvTranspose2D(nn.Module):
    """2x2 stride-2 transposed conv + activation
    (reference: base_layers.py:106-118)."""

    features: int
    activation: str = "lrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(
            self.features, (2, 2), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="deconv",
        )(x)
        return jax.nn.relu(y) if self.activation == "relu" else _lrelu(y, 0.01)


class ConvBNRelu(nn.Module):
    """conv -> BatchNorm(momentum .99) -> activation
    (reference: base_layers.py:41-54)."""

    features: int
    activation: str = "lrelu"
    kernel: int = 3
    use_running_average: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, (self.kernel, self.kernel),
                 padding=self.kernel // 2, dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(
            use_running_average=self.use_running_average, momentum=0.99,
            name="bn",
        )(y)
        return jax.nn.relu(y) if self.activation == "relu" else _lrelu(y, 0.01)


class DoubleConv(nn.Module):
    """Two Conv2D blocks (reference: base_layers.py:57-66)."""

    features: int
    activation: str = "lrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = Conv2D(self.features, self.activation, dtype=self.dtype, name="c1")(x)
        return Conv2D(self.features, self.activation, dtype=self.dtype, name="c2")(x)


class ChannelAttention(nn.Module):
    """Global avg+max pooled shared MLP -> sigmoid
    (reference: base_layers.py:139-153)."""

    ratio: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mlp1 = Conv(c // self.ratio, (1, 1), padding=0, use_bias=False,
                    dtype=self.dtype, name="mlp1")
        mlp2 = Conv(c, (1, 1), padding=0, use_bias=False, dtype=self.dtype,
                    name="mlp2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = mlp2(jax.nn.relu(mlp1(avg))) + mlp2(jax.nn.relu(mlp1(mx)))
        return jax.nn.sigmoid(out)


class SpatialAttention(nn.Module):
    """Channel-mean/max concat -> conv -> sigmoid
    (reference: base_layers.py:156-167)."""

    kernel_size: int = 3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], -1)
        y = Conv(1, (self.kernel_size, self.kernel_size), padding=1,
                 use_bias=False, dtype=self.dtype, name="conv")(y)
        return jax.nn.sigmoid(y)


class CBAM(nn.Module):
    """Channel then spatial attention — NOTE the reference returns the
    channel-attended tensor and discards the spatial product
    (base_layers.py:175-178); replicated."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(dtype=self.dtype, name="ca")(x) * x
        _ = SpatialAttention(dtype=self.dtype, name="sa")(x) * x
        return x


class ResConv(nn.Module):
    """conv-bn-act -> CBAM -> conv -> bn1 AGAIN (reference bug, bn2 unused:
    base_layers.py:86-88) + residual."""

    features: int
    activation: str = "lrelu"
    use_running_average: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        act = jax.nn.relu if self.activation == "relu" else _lrelu
        bn1 = nn.BatchNorm(use_running_average=self.use_running_average,
                           momentum=0.8, name="bn1")
        h = Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                 name="conv1")(x)
        h = act(bn1(h))
        h = CBAM(dtype=self.dtype, name="cbam")(h)
        h = Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                 name="conv2")(h)
        return bn1(h) + x


class MSIA(nn.Module):
    """Multi-scale illumination attention (reference: base_layers.py:5-38)."""

    filters: int
    activation: str = "lrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, r, i_att):
        r_att = r * i_att
        m1 = ConvBNRelu(self.filters, self.activation, dtype=self.dtype,
                        name="cbr1")(r_att)
        d2 = nn.max_pool(r_att, (2, 2), strides=(2, 2))
        m2 = ConvTranspose2D(self.filters, self.activation, dtype=self.dtype,
                             name="deconv2")(
            ConvBNRelu(self.filters, self.activation, dtype=self.dtype,
                       name="cbr2")(d2))
        d4 = nn.max_pool(d2, (2, 2), strides=(2, 2))
        m4 = ConvBNRelu(self.filters, self.activation, kernel=1,
                        dtype=self.dtype, name="cbr4")(d4)
        m4 = ConvTranspose2D(self.filters, self.activation, dtype=self.dtype,
                             name="deconv41")(m4)
        m4 = ConvTranspose2D(self.filters, self.activation, dtype=self.dtype,
                             name="deconv42")(m4)
        cat = jnp.concatenate([r, m1, m2, m4], -1)
        return Conv2D(self.filters, dtype=self.dtype, name="out")(cat)


def pad_concat(x, y):
    """Center-pad y to x's spatial size, concat channels
    (reference: base_layers.py:181-189)."""
    dy = x.shape[1] - y.shape[1]
    dx = x.shape[2] - y.shape[2]
    y = jnp.pad(y, [(0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2),
                    (0, 0)])
    return jnp.concatenate([x, y], -1)


# -------------------------------------------------------------- color_encoder


class ColorEncoder(nn.Module):
    """U-Net reflectance head -> sigmoid -> avg-blur color map
    (reference: color_encoder.py:52-103). ``avg_kernel_size`` mirrors
    ``opt['avg_kernel_size']``."""

    nf: int = 64
    avg_kernel_size: int = 5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        conv_input = Conv2D(self.nf, dtype=self.dtype, name="conv_input")(x)
        p1 = nn.max_pool(conv_input, (2, 2), strides=(2, 2))
        c1 = Conv2D(self.nf * 2, dtype=self.dtype, name="conv_r1")(p1)
        p2 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = Conv2D(self.nf * 4, dtype=self.dtype, name="conv_r2")(p2)
        d1 = ConvTranspose2D(self.nf * 2, dtype=self.dtype, name="deconv_r1")(c2)
        c3 = Conv2D(self.nf * 2, dtype=self.dtype, name="conv_r3")(
            pad_concat(c1, d1))
        d2 = ConvTranspose2D(self.nf, dtype=self.dtype, name="deconv_r2")(c3)
        c4 = Conv2D(self.nf, dtype=self.dtype, name="conv_r4")(
            pad_concat(conv_input, d2))
        c5 = Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_r5")(c4)
        r_out = jax.nn.sigmoid(c5)
        # avg_pool2d(kernel, stride=1, padding=k//2) == same-size blur
        k = self.avg_kernel_size
        blurred = jax.lax.reduce_window(
            r_out, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)],
        ) / float(k * k)
        return blurred


# ---------------------------------------------------------------------- loss


def charbonnier_sum_loss(x, y, eps=1e-6):
    """sum(sqrt(diff^2 + eps)) — note the reference adds eps, NOT eps^2,
    and sums rather than means (loss.py:8-18)."""
    diff = x - y
    return jnp.sum(jnp.sqrt(diff * diff + eps))


class LegacyGANLoss:
    """gan/ragan (BCE-with-logits), lsgan (MSE), wgan-gp sign loss
    (reference: loss.py:22-54)."""

    def __init__(self, gan_type, real_label_val=1.0, fake_label_val=0.0):
        self.gan_type = gan_type.lower()
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        if self.gan_type not in ("gan", "ragan", "lsgan", "wgan-gp"):
            raise NotImplementedError(
                f"GAN type [{self.gan_type}] is not found"
            )

    def __call__(self, logits, target_is_real):
        if self.gan_type == "wgan-gp":
            return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
        label = self.real_label_val if target_is_real else self.fake_label_val
        target = jnp.full_like(logits, label)
        if self.gan_type == "lsgan":
            return jnp.mean((logits - target) ** 2)
        # BCEWithLogits
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )


def gradient_penalty_loss(critic_fn, interp):
    """WGAN-GP penalty: mean((||d critic/d interp||_2 - 1)^2)
    (reference: loss.py:57-77) — the autograd.grad dance is a one-line
    jax.grad here."""

    def scalar_crit(z):
        return jnp.sum(critic_fn(z))

    g = jax.grad(scalar_crit)(interp)
    g = g.reshape(g.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(g * g, axis=1) + 1e-20)
    return jnp.mean((norm - 1.0) ** 2)
