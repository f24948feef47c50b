"""RIDCP building blocks (reference: basicsr/archs/ridcp_utils.py).

NormLayer/ActLayer dispatch, pre-activation ResBlock, CombineQuantBlock.
NHWC flax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import Conv, GroupNorm32

Dtype = Any


def act_layer(x, act_type="leakyrelu"):
    act_type = act_type.lower()
    if act_type == "relu":
        return jax.nn.relu(x)
    if act_type == "leakyrelu":
        return jax.nn.leaky_relu(x, 0.2)
    if act_type == "silu":
        return jax.nn.silu(x)
    if act_type == "gelu":
        return jax.nn.gelu(x)
    if act_type == "none":
        return x
    raise ValueError(f"activation type {act_type} not supported")


class NormLayer(nn.Module):
    norm_type: str = "gn"

    @nn.compact
    def __call__(self, x):
        t = self.norm_type.lower()
        if t == "gn":
            return GroupNorm32()(x)
        if t == "bn":
            return nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x).astype(x.dtype)
        if t == "in":
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if t == "none":
            return x
        raise ValueError(f"Norm type {t} not supported")


class ResBlock(nn.Module):
    """Pre-activation residual block (reference: ridcp_utils.py:66-85)."""

    out_channels: int
    norm_type: str = "gn"
    act_type: str = "leakyrelu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = NormLayer(self.norm_type, name="norm1")(x)
        h = act_layer(h, self.act_type)
        h = Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = NormLayer(self.norm_type, name="norm2")(h)
        h = act_layer(h, self.act_type)
        h = Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return h + x


class CombineQuantBlock(nn.Module):
    """Concat (resized) prev-scale quant features, 3x3 conv
    (reference: ridcp_utils.py:87-99)."""

    out_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, input1, input2=None):
        if input2 is not None:
            b, h, w, _ = input1.shape
            input2 = jax.image.resize(
                input2, (input2.shape[0], h, w, input2.shape[-1]), method="nearest"
            )
            x = jnp.concatenate([input1, input2.astype(input1.dtype)], axis=-1)
        else:
            x = input1
        return Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
