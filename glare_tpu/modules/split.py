"""Split2d: channel split with a learned conditional-Gaussian prior over the
consumed half (reference: Split.py:10-72). Disabled in shipped confs
(``flow.split.enable: false``) but kept for config parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .flow_layers import Conv2dZeros, GaussianDiag, split_feature_cross


class Split2d(nn.Module):
    num_channels: int
    logs_eps: float = 0.0
    consume_ratio: float = 0.5
    cond_channels: int = 0

    @property
    def num_channels_consume(self):
        return int(round(self.num_channels * self.consume_ratio))

    @property
    def num_channels_pass(self):
        return self.num_channels - self.num_channels_consume

    def split2d_prior(self, z, ft):
        if ft is not None:
            z = jnp.concatenate([z, ft.astype(z.dtype)], axis=-1)
        h = Conv2dZeros(self.num_channels_consume * 2, name="conv")(z)
        mean, logs = split_feature_cross(h)
        return mean, logs

    @nn.compact
    def __call__(self, z, logdet=None, reverse=False, eps=None, eps_std=None, ft=None, rng=None):
        if not reverse:
            z1 = z[..., : self.num_channels_pass]
            z2 = z[..., self.num_channels_pass :]
            mean, logs = self.split2d_prior(z1, ft)
            eps_out = (z2 - mean) / jnp.exp(logs + self.logs_eps)
            if logdet is not None:
                logdet = logdet + GaussianDiag.logp(mean, logs + self.logs_eps, z2)
            return z1, logdet, eps_out
        else:
            z1 = z
            mean, logs = self.split2d_prior(z1, ft)
            if eps is None:
                assert rng is not None, "Split2d reverse sampling needs an rng"
                eps = GaussianDiag.sample_eps(rng, mean.shape, eps_std or 0.0, mean.dtype)
            z2 = mean + jnp.exp(logs + self.logs_eps) * eps
            z = jnp.concatenate([z1, z2], axis=-1)
            if logdet is not None:
                logdet = logdet - GaussianDiag.logp(mean, logs + self.logs_eps, z2)
            return z, logdet, None
