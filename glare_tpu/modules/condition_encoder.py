"""Conditional encoder over the log-domain low-light input
(reference: ConditionEncoder.py:14-57).

A VQGAN-shaped Encoder produces a 3-channel latent-resolution feature map;
two heads derive:
  * ``cond_feat``:  Conv3->64 + sigmoid   (coupling conditioning)
  * ``color_map``:  Conv3->3              (flow prior mean / reverse seed)
  * ``mid_feat``:   the encoder's pre-downsample skip features
                    (for the AFT decoder's Mix blocks)

Note: the reference forward's ``mid_feat`` parameter is shadowed by the
encoder's returned list, so mid features are in practice always computed
and returned (ConditionEncoder.py:46-55); we keep them optional to avoid
dead compute in stage 2.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from flax import linen as nn

from ..nn.layers import Conv
from .encoder_decoder import Encoder

Dtype = Any


class ConEncoder1(nn.Module):
    resolution: int = 256
    z_channels: int = 3
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (64,)
    dropout: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mid_feat: bool = False):
        enc_out = Encoder(
            ch=self.ch,
            out_ch=self.out_ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            dropout=self.dropout,
            in_channels=self.in_channels,
            resolution=self.resolution,
            z_channels=self.z_channels,
            double_z=False,
            dtype=self.dtype,
            name="encoder",
        )(x, mid_feat=True)
        enc_feat, skips = enc_out

        cond_feat = Conv(64, (3, 3), padding=1, dtype=self.dtype, name="cond_conv")(enc_feat)
        cond_feat = jax.nn.sigmoid(cond_feat)
        color_map = Conv(3, (3, 3), padding=1, dtype=self.dtype, name="color_conv")(enc_feat)

        results = {"cond_feat": cond_feat, "color_map": color_map}
        if mid_feat:
            results["mid_feat"] = skips
        return results
