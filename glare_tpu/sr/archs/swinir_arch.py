"""Full SwinIR restoration network
(reference: defor_cuda_ext/basicsr/archs/network_swinir.py:619-867).

The RIDCP LQ stage only uses the RSTB stack (sr/archs/swin.py); this module
completes the file's public surface: the SwinIR class with all four
reconstruction heads — 'pixelshuffle', 'pixelshuffledirect', 'nearest+conv'
(x4) and '' (residual denoising head) — plus '1conv'/'3conv' residual
connections, ape, patch_norm, mean/img_range normalization and
pad-to-window-multiple input handling.

TPU-first: NHWC end to end; pixel-shuffle is a reshape/transpose (torch
PixelShuffle channel-order preserved so converted checkpoints work); token
ops ride the swin.py blocks (batched-einsum window attention).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import Conv
from ..registry import ARCH_REGISTRY
from .arch_util import Upsample, pixel_shuffle
from .swin import RSTB

Dtype = Any

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    """SwinIR (reference: network_swinir.py:619 SwinIR). NHWC.

    Differences from the reference surface: img_size/use_checkpoint are
    accepted but unused (shapes are static under jit; remat is a caller
    concern), drop rates are inference-irrelevant and ignored.
    """

    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ape: bool = False
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""
    resi_connection: str = "1conv"
    dtype: Dtype = None

    def _conv_after_body(self, x):
        if self.resi_connection == "1conv":
            return Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                        name="conv_after_body")(x)
        # '3conv': compressed bottleneck with leaky relus (reference :734-738)
        y = Conv(self.embed_dim // 4, (3, 3), padding=1, dtype=self.dtype,
                 name="cab_conv0")(x)
        y = nn.leaky_relu(y, 0.2)
        y = Conv(self.embed_dim // 4, (1, 1), padding=0, dtype=self.dtype,
                 name="cab_conv1")(y)
        y = nn.leaky_relu(y, 0.2)
        return Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="cab_conv2")(y)

    def _forward_features(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        if self.patch_norm:
            tokens = nn.LayerNorm(dtype=jnp.float32, name="patch_norm")(
                tokens).astype(x.dtype)
        if self.ape:
            ape = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, h * w, self.embed_dim),
            )
            tokens = tokens + ape.astype(tokens.dtype)
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            tokens = RSTB(
                dim=self.embed_dim, depth=depth, num_heads=heads,
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                resi_connection=self.resi_connection,
                dtype=self.dtype, name=f"layer_{i}",
            )(tokens, (h, w))
        tokens = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            tokens).astype(x.dtype)
        return tokens.reshape(b, h, w, c)

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        ws = self.window_size
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)],
                        mode="reflect")

        mean = jnp.asarray(
            _RGB_MEAN if self.in_chans == 3 else (0.0,), x.dtype)
        x = (x - mean) * self.img_range

        num_feat = 64
        if self.upsampler == "pixelshuffle":
            x = Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_first")(x)
            x = self._conv_after_body(self._forward_features(x)) + x
            x = Conv(num_feat, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_before_upsample")(x)
            x = nn.leaky_relu(x, 0.01)
            x = Upsample(self.upscale, num_feat, dtype=self.dtype,
                         name="upsample")(x)
            x = Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_last")(x)
        elif self.upsampler == "pixelshuffledirect":
            x = Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_first")(x)
            x = self._conv_after_body(self._forward_features(x)) + x
            x = Conv(self.in_chans * self.upscale ** 2, (3, 3), padding=1,
                     dtype=self.dtype, name="upsample_conv")(x)
            x = pixel_shuffle(x, self.upscale)
        elif self.upsampler == "nearest+conv":
            assert self.upscale == 4, "nearest+conv only supports x4"
            x = Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_first")(x)
            x = self._conv_after_body(self._forward_features(x)) + x
            x = Conv(num_feat, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_before_upsample")(x)
            x = nn.leaky_relu(x, 0.01)
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.leaky_relu(Conv(num_feat, (3, 3), padding=1,
                                   dtype=self.dtype, name="conv_up1")(x), 0.2)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.leaky_relu(Conv(num_feat, (3, 3), padding=1,
                                   dtype=self.dtype, name="conv_up2")(x), 0.2)
            x = nn.leaky_relu(Conv(num_feat, (3, 3), padding=1,
                                   dtype=self.dtype, name="conv_hr")(x), 0.2)
            x = Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                     name="conv_last")(x)
        else:
            # denoising / artifact removal: residual head (reference :833-837)
            x_first = Conv(self.embed_dim, (3, 3), padding=1, dtype=self.dtype,
                           name="conv_first")(x)
            res = self._conv_after_body(self._forward_features(x_first)) + x_first
            x = x + Conv(self.in_chans, (3, 3), padding=1, dtype=self.dtype,
                         name="conv_last")(res)

        x = x / self.img_range + mean
        return x[:, : H * self.upscale, : W * self.upscale, :]
