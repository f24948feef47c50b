"""Conditional affine coupling (reference: FlowAffineCouplingsAblation.py:10-151).

CondAffineSeparatedAndCond, two sub-transforms per step:
  (a) feature-conditional affine on ALL channels: (shift, scale) = F(ft)
  (b) self-conditional affine on the co-half:     (shift, scale) = F([z1, ft])
scale = sigmoid(raw + 2) + eps;  'cross' channel split for (shift, scale).

The optional ``le_curve`` power-curve branch (off in all shipped confs) is
implemented for config parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .flow_layers import (
    Conv2dNormed,
    Conv2dZeros,
    split_feature_cross,
    cat_feature,
    sum_per_sample,
)


class FNet(nn.Module):
    """Conv(+ActNorm)->ReLU->1x1(+ActNorm)->ReLU->Conv2dZeros
    (reference: FlowAffineCouplingsAblation.py:143-151)."""

    out_channels: int
    hidden_channels: int = 64
    kernel_hidden: int = 1
    n_hidden_layers: int = 1

    @nn.compact
    def __call__(self, x, ddinit=False):
        x = Conv2dNormed(self.hidden_channels, (3, 3), name="conv_in")(x, ddinit=ddinit)
        x = jax.nn.relu(x)
        for i in range(self.n_hidden_layers):
            x = Conv2dNormed(
                self.hidden_channels,
                (self.kernel_hidden, self.kernel_hidden),
                name=f"conv_hidden_{i}",
            )(x, ddinit=ddinit)
            x = jax.nn.relu(x)
        x = Conv2dZeros(self.out_channels, (3, 3), name="conv_zeros")(x)
        return x


class CondAffineSeparatedAndCond(nn.Module):
    in_channels: int
    in_channels_rrdb: int = 64
    hidden_channels: int = 64
    affine_eps: float = 0.0001
    le_curve: bool = False

    @property
    def channels_for_nn(self):
        return self.in_channels // 2

    @property
    def channels_for_co(self):
        return self.in_channels - self.channels_for_nn

    def _scale_shift(self, h):
        shift, scale = split_feature_cross(h)
        scale = jax.nn.sigmoid(scale + 2.0) + self.affine_eps
        return scale, shift

    @nn.compact
    def __call__(self, z, logdet=None, reverse=False, ft=None, ddinit=False):
        assert z.shape[-1] == self.in_channels, (z.shape, self.in_channels)
        f_features = FNet(
            self.in_channels * 2, self.hidden_channels, name="fFeatures"
        )
        f_affine = FNet(
            self.channels_for_co * 2, self.hidden_channels, name="fAffine"
        )
        if self.le_curve:
            f_curve = FNet(self.in_channels, self.hidden_channels, name="fCurve")

        ft = ft.astype(z.dtype)

        if not reverse:
            # (a) feature conditional
            scale_ft, shift_ft = self._scale_shift(f_features(ft, ddinit=ddinit))
            z = (z + shift_ft) * scale_ft
            if logdet is not None:
                logdet = logdet + sum_per_sample(jnp.log(scale_ft))

            if self.le_curve:
                alpha = jax.nn.relu(f_curve(ft, ddinit=ddinit)) + self.affine_eps
                if logdet is not None:
                    logdet = logdet + sum_per_sample(
                        jnp.log(alpha * jnp.power(jnp.abs(z), alpha - 1)) + self.affine_eps
                    )
                z = jnp.power(jnp.abs(z), alpha) * jnp.sign(z)

            # (b) self conditional
            z1, z2 = self._split(z)
            scale, shift = self._scale_shift(
                f_affine(cat_feature(z1, ft), ddinit=ddinit)
            )
            z2 = (z2 + shift) * scale
            if logdet is not None:
                logdet = logdet + sum_per_sample(jnp.log(scale))
            z = cat_feature(z1, z2)
        else:
            # (b) self conditional, inverted
            z1, z2 = self._split(z)
            scale, shift = self._scale_shift(f_affine(cat_feature(z1, ft), ddinit=ddinit))
            z2 = z2 / scale - shift
            z = cat_feature(z1, z2)
            if logdet is not None:
                logdet = logdet - sum_per_sample(jnp.log(scale))

            if self.le_curve:
                alpha = jax.nn.relu(f_curve(ft, ddinit=ddinit)) + self.affine_eps
                z = jnp.power(jnp.abs(z), 1.0 / alpha) * jnp.sign(z)

            # (a) feature conditional, inverted
            scale_ft, shift_ft = self._scale_shift(f_features(ft, ddinit=ddinit))
            z = z / scale_ft - shift_ft
            if logdet is not None:
                logdet = logdet - sum_per_sample(jnp.log(scale_ft))

        return z, logdet

    def _split(self, z):
        return z[..., : self.channels_for_nn], z[..., self.channels_for_nn :]
