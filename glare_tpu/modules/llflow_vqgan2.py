"""Stage-2 network: conditional flow over the VQGAN latent
(reference: LLFlowVQGAN2_arch.py:19-153).

normal_flow(gt_latent, lr):
    lr_enc = ConEncoder1(lr)
    z, logdet = flow.encode(gt_latent | +quant noise, cond=lr_enc)
    nll = -(logdet + logp(color_map, 0, z)) / (ln2 * pixels)
reverse_flow(lr):
    z := lr_enc['color_map']; x = flow.decode(z, cond=lr_enc)  -> VQGAN latent

Config mapping: quant=32 (confs/LOL.yml:36), train_gt_ratio=0.0 so the prior
mean is always the conditional color map (LLFlowVQGAN2_arch.py:108-109).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .condition_encoder import ConEncoder1
from .flow_layers import GaussianDiag, pixels
from .flow_upsampler import FlowUpsamplerNet

Dtype = Any
LOG2 = float(np.log(2.0))


class LLFlowVQGAN2(nn.Module):
    K: int = 12
    L: int = 2
    additional_flow_no_affine: int = 2
    hidden_channels: int = 64
    coupling: str = "CondAffineSeparatedAndCond"
    quant: float = 32.0
    dtype: Dtype = None
    # structural miniaturization knobs (shipped geometry: 128/2) for
    # compile-bound correctness runs (__graft_entry__.dryrun_multichip):
    # same layer/sharding structure at a fraction of the virtual-CPU cost.
    # cond_feat/color_map head widths are ch-independent, so the flow graph
    # is unchanged.
    enc_ch: int = 128
    enc_num_res_blocks: int = 2

    def setup(self):
        self.RRDB = ConEncoder1(dtype=self.dtype, ch=self.enc_ch,
                                num_res_blocks=self.enc_num_res_blocks)
        self.flowUpsamplerNet = FlowUpsamplerNet(
            K=self.K,
            L=self.L,
            additional_flow_no_affine=self.additional_flow_no_affine,
            hidden_channels=self.hidden_channels,
            flow_coupling=self.coupling,
        )

    def __call__(self, lr, gt=None, reverse=True, **kw):
        if reverse:
            return self.reverse_flow(lr, **kw)
        return self.normal_flow(gt, lr, **kw)

    def encode_cond(self, lr, mid_feat=False):
        return self.RRDB(lr, mid_feat=mid_feat)

    def normal_flow(self, gt, lr, lr_enc=None, add_gt_noise=False, noise_rng=None,
                    ddinit=False):
        """Returns (z, nll, logdet). gt is the VQGAN latent [B, h, w, 3]."""
        if lr_enc is None:
            lr_enc = self.RRDB(lr)

        b = gt.shape[0]
        pix = pixels(gt)
        logdet = jnp.zeros((b,), jnp.float32)
        z = gt.astype(jnp.float32)

        if add_gt_noise:
            assert noise_rng is not None
            z = z + (jax.random.uniform(noise_rng, z.shape) - 0.5) / self.quant
            logdet = logdet + float(-np.log(self.quant) * pix)

        z, logdet = self.flowUpsamplerNet.encode(
            z, lr_enc, logdet=logdet, ddinit=ddinit
        )

        mean = lr_enc["color_map"].astype(jnp.float32)
        objective = logdet + GaussianDiag.logp(mean, jnp.float32(0.0), z)
        nll = -objective / (LOG2 * pix)
        return z, nll, logdet

    def reverse_flow(self, lr, lr_enc=None, eps_std=None, add_gt_noise=False):
        """Returns (x_latent, logdet). The latent seed is the conditional
        color map (LLFlowVQGAN2_arch.py:141)."""
        if lr_enc is None:
            lr_enc = self.RRDB(lr)
        b = lr.shape[0]
        pix = pixels(lr)
        logdet = jnp.zeros((b,), jnp.float32)
        if add_gt_noise:
            logdet = logdet - float(-np.log(self.quant) * pix)

        z = lr_enc["color_map"].astype(jnp.float32)
        x, logdet = self.flowUpsamplerNet.decode(z, lr_enc, logdet=logdet, eps_std=eps_std)
        return x, logdet
