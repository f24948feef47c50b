"""ldm-style VQGAN Encoder/Decoder in flax (NHWC).

Parity target: ``/root/reference/code/models/modules/encoder_decoder.py``
(Encoder:342-442, Decoder:445-551). GLARE-specific behaviors kept:

  * Encoder optionally returns ``enc_feat``: the pre-downsample skip
    features per level (encoder_decoder.py:406-442), used by the AFT
    decoder's Mix blocks as ``mid_feat``.
  * Decoder returns ``code_decoder_output``: hidden states at levels != 2
    after their res blocks, before upsampling (encoder_decoder.py:532-539),
    used by the AFT decoder's WarpBlocks.
  * Attention is applied at levels whose *config-derived* resolution is in
    ``attn_resolutions`` — resolution bookkeeping follows the configured
    ``resolution`` (256), not the runtime input size, exactly as the
    reference does (its runtime shape asserts are commented out).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

from flax import linen as nn

from ..nn.layers import AttnBlock, Conv, Downsample, GroupNorm32, ResnetBlock, Upsample, swish

Dtype = Any


class Encoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (64,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 3
    double_z: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mid_feat: bool = False):
        num_resolutions = len(self.ch_mult)
        curr_res = self.resolution
        enc_feat = []

        h = Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_resolutions - 1:
                enc_feat.append(h)
                h = Downsample(
                    self.resamp_with_conv, dtype=self.dtype, name=f"down_{i_level}_downsample"
                )(h)
                curr_res //= 2

        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h)

        h = GroupNorm32(name="norm_out")(h)
        h = swish(h)
        out_channels = 2 * self.z_channels if self.double_z else self.z_channels
        h = Conv(out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        if mid_feat:
            return h, enc_feat
        return h


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (64,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 3
    give_pre_end: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, z) -> Tuple[Any, list]:
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)
        code_decoder_output = []

        h = Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)

            if i_level != 2:
                code_decoder_output.append(h)

            if i_level != 0:
                h = Upsample(
                    self.resamp_with_conv, dtype=self.dtype, name=f"up_{i_level}_upsample"
                )(h)
                curr_res *= 2

        if self.give_pre_end:
            return h, code_decoder_output

        h = GroupNorm32(name="norm_out")(h)
        h = swish(h)
        h = Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h, code_decoder_output
