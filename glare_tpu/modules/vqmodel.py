"""Frozen VQGAN prior (reference: VQModel_arch.py:14-101).

encode(x) = quant_conv(encoder(x))                      (VQModel_arch.py:74-79)
decode(h) = decoder(post_quant_conv(quantize(h)))       (VQModel_arch.py:81-91)
            -> (dec, emb_loss, code_decoder_output)

The reference's pytorch-lightning training steps and VGG semantic-loss hook
are not part of the GLARE inference path; stage-1 training lives in
``glare_tpu.sr`` instead. NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn

from ..nn.layers import Conv
from .encoder_decoder import Decoder, Encoder
from .quantize import VectorQuantizer2

Dtype = Any


class VQModel(nn.Module):
    resolution: int = 256
    n_embed: int = 8192
    embed_dim: int = 3
    z_channels: int = 3
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (64,)
    dropout: float = 0.0
    dtype: Dtype = None
    vq_backend: str = "auto"

    def setup(self):
        self.encoder = Encoder(
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
        )
        self.decoder = Decoder(
            ch=self.ch,
            out_ch=self.out_ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            dropout=self.dropout,
            in_channels=self.in_channels,
            resolution=self.resolution,
            z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.quantize = VectorQuantizer2(
            n_e=self.n_embed, e_dim=self.embed_dim, beta=0.25, backend=self.vq_backend
        )
        self.quant_conv = Conv(self.embed_dim, (1, 1), padding=0, dtype=self.dtype)
        self.post_quant_conv = Conv(self.z_channels, (1, 1), padding=0, dtype=self.dtype)

    def encode(self, x):
        h = self.encoder(x)
        h = self.quant_conv(h)
        return h, None  # (latent, vgg_feat placeholder) as in reference

    def decode(self, h):
        quant, emb_loss, _info = self.quantize(h)
        quant2 = self.post_quant_conv(quant)
        dec, code_decoder_output = self.decoder(quant2)
        return dec, emb_loss, code_decoder_output

    def __call__(self, x):
        h, _ = self.encode(x)
        dec, diff, _ = self.decode(h)
        return dec, diff
