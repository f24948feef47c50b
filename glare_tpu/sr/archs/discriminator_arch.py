"""UNet discriminator with spectral norm
(reference: basicsr/archs/discriminator_arch.py:8-66, Real-ESRGAN).

Spectral normalization is implemented directly: a persistent power-iteration
vector `u` lives in the 'spectral' variable collection and is updated (one
iteration per call) when that collection is mutable — the functional
equivalent of torch's spectral_norm hook.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import torch_conv_bias_init, torch_conv_kernel_init
from ..registry import ARCH_REGISTRY

Dtype = Any


class SNConv(nn.Module):
    """Conv2d with spectral weight normalization."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (kh, kw, in_ch, self.features)
        )
        w2d = kernel.reshape(-1, self.features)  # [fan_in, out]
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0), (self.features,)),
        )
        u = u_var.value
        # one power iteration (stop-gradient, as in torch)
        v = w2d @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w2d.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        u_new = jax.lax.stop_gradient(u_new)
        v = jax.lax.stop_gradient(v)
        sigma = v @ (w2d @ u_new)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        kernel_sn = kernel / sigma

        y = jax.lax.conv_general_dilated(
            x, kernel_sn.astype(x.dtype),
            window_strides=self.strides,
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_bias_init(kh * kw * in_ch), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator with skip connections and spectral norm."""

    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        lrelu = lambda t: jax.nn.leaky_relu(t, 0.2)
        nf = self.num_feat

        x0 = lrelu(SNConv(nf, (3, 3), (1, 1), 1, name="conv0")(x, update_stats))
        x1 = lrelu(SNConv(nf * 2, (4, 4), (2, 2), 1, name="conv1")(x0, update_stats))
        x2 = lrelu(SNConv(nf * 4, (4, 4), (2, 2), 1, name="conv2")(x1, update_stats))
        x3 = lrelu(SNConv(nf * 8, (4, 4), (2, 2), 1, name="conv3")(x2, update_stats))

        def up(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, h * 2, w * 2, c), method="bilinear")

        x4 = lrelu(SNConv(nf * 4, (3, 3), (1, 1), 1, name="conv4")(up(x3), update_stats))
        if self.skip_connection:
            x4 = x4 + x2
        x5 = lrelu(SNConv(nf * 2, (3, 3), (1, 1), 1, name="conv5")(up(x4), update_stats))
        if self.skip_connection:
            x5 = x5 + x1
        x6 = lrelu(SNConv(nf, (3, 3), (1, 1), 1, name="conv6")(up(x5), update_stats))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(SNConv(nf, (3, 3), (1, 1), 1, name="conv7")(x6, update_stats))
        out = lrelu(SNConv(nf, (3, 3), (1, 1), 1, name="conv8")(out, update_stats))
        out = SNConv(1, (3, 3), (1, 1), 1, name="conv9")(out, update_stats)
        return out
