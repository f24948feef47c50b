"""RIDCP weighted-codebook VQ autoencoder
(reference: basicsr/archs/dehaze_vq_weight_arch.py:241-594, registered as
VQWeightDehazeNet; GLARE trains its stage-1 codebook prior with this).

Structure (channel_query_dict {256:64, 128:128, <=64:256}):
  * MultiScaleEncoder: 4x4 in-conv + per-level (stride-2 conv + 2 ResBlocks),
    plus 4 RSTB swin blocks in the LQ stage (:179-220)
  * weighted VectorQuantizer (glare_tpu.modules.quantize) at the deepest
    scale, with before_quant 1x1 and CombineQuantBlock after (:380-400)
  * decoder_group of DecoderBlocks (upsample + conv + 2 ResBlocks) (:365-370)
  * optional MultiScaleDecoder with WarpBlock DCN alignment for the LQ-stage
    residual branch (:241-298)
  * test(): flip-reflect pad to x32 (:563-583); test_tile(): Real-ESRGAN
    halo tiling (:501-561) — provided as wrappers in the trainer.

NHWC flax; the DCN warp rides glare_tpu.ops.dcn.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...modules.quantize import WeightedVectorQuantizer
from ...modules.deformable_decoder import DCNv2Pack
from ...nn.layers import Conv
from ..registry import ARCH_REGISTRY
from .ridcp_utils import CombineQuantBlock, ResBlock, act_layer
from .swin import SwinLayers

Dtype = Any

CHANNEL_QUERY_DICT = {8: 256, 16: 256, 32: 256, 64: 256, 128: 128, 256: 64, 512: 32}


class MultiScaleEncoder(nn.Module):
    max_depth: int
    input_res: int = 256
    norm_type: str = "gn"
    act_type: str = "silu"
    LQ_stage: bool = True
    swin_embed_dim: int = 256
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = Conv(
            CHANNEL_QUERY_DICT[self.input_res], (4, 4), padding=1,
            dtype=self.dtype, name="in_conv",
        )(x)
        res = self.input_res
        for i in range(self.max_depth):
            out_ch = CHANNEL_QUERY_DICT[res // 2]
            x = Conv(out_ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name=f"down_{i}_conv")(x)
            x = ResBlock(out_ch, self.norm_type, self.act_type, dtype=self.dtype,
                         name=f"down_{i}_res1")(x)
            x = ResBlock(out_ch, self.norm_type, self.act_type, dtype=self.dtype,
                         name=f"down_{i}_res2")(x)
            res //= 2
        if self.LQ_stage:
            x = SwinLayers(embed_dim=self.swin_embed_dim, dtype=self.dtype,
                           name="swin_layers")(x)
        return x


class DecoderBlock(nn.Module):
    out_channels: int
    norm_type: str = "gn"
    act_type: str = "silu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        x = Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        x = ResBlock(self.out_channels, self.norm_type, self.act_type,
                     dtype=self.dtype, name="res1")(x)
        x = ResBlock(self.out_channels, self.norm_type, self.act_type,
                     dtype=self.dtype, name="res2")(x)
        return x


class WarpBlock(nn.Module):
    """Offset conv + DCNv2 alignment (reference: dehaze_vq_weight_arch.py:241-252)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x_vq, x_residual):
        c = x_vq.shape[-1]
        side = Conv(c, (3, 3), padding=1, dtype=self.dtype, name="offset")(
            jnp.concatenate([x_vq, x_residual.astype(x_vq.dtype)], axis=-1)
        )
        return DCNv2Pack(c, deformable_groups=4, dtype=self.dtype, name="dcn")(x_vq, side)


class MultiScaleDecoder(nn.Module):
    """LQ-stage residual decoder with warp alignment
    (reference: dehaze_vq_weight_arch.py:255-298)."""

    max_depth: int
    input_res: int = 256
    norm_type: str = "gn"
    act_type: str = "silu"
    only_residual: bool = False
    use_warp: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, code_decoder_output):
        res = self.input_res // 2 ** self.max_depth
        for i in range(self.max_depth):
            out_ch = CHANNEL_QUERY_DICT[res * 2]
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_conv")(x)
            x = ResBlock(out_ch, self.norm_type, self.act_type, dtype=self.dtype,
                         name=f"up_{i}_res1")(x)
            x = ResBlock(out_ch, self.norm_type, self.act_type, dtype=self.dtype,
                         name=f"up_{i}_res2")(x)
            if not self.only_residual:
                if self.use_warp:
                    x_vq = WarpBlock(dtype=self.dtype, name=f"warp_{i}")(
                        code_decoder_output[i], x
                    )
                    x = x + x_vq * (jnp.mean(x) / jnp.mean(x_vq))
                else:
                    x = x + code_decoder_output[i]
            res *= 2
        return x


@ARCH_REGISTRY.register()
class VQWeightDehazeNet(nn.Module):
    in_channel: int = 3
    codebook_params: Sequence[Sequence[float]] = ((64, 1024, 512),)
    gt_resolution: int = 256
    LQ_stage: bool = False
    norm_type: str = "gn"
    act_type: str = "silu"
    use_quantize: bool = True
    use_residual: bool = True
    only_residual: bool = False
    use_weight: bool = False
    use_warp: bool = True
    weight_alpha: float = 1.0
    use_semantic_loss: bool = False
    semantic_dim: int = 256
    dtype: Dtype = None

    @property
    def codebook_scale(self):
        return int(self.codebook_params[0][0])

    @property
    def max_depth(self):
        return int(math.log2(self.gt_resolution // self.codebook_scale))

    def setup(self):
        cps = np.asarray(self.codebook_params, np.float64)
        scales = cps[:, 0].astype(int)
        emb_nums = cps[:, 1].astype(int)
        emb_dims = cps[:, 2].astype(int)

        self.multiscale_encoder = MultiScaleEncoder(
            max_depth=self.max_depth,
            input_res=self.gt_resolution,
            norm_type=self.norm_type,
            act_type=self.act_type,
            LQ_stage=self.LQ_stage,
            swin_embed_dim=CHANNEL_QUERY_DICT[int(scales[0])],
            dtype=self.dtype,
        )
        if self.LQ_stage and self.use_residual:
            self.multiscale_decoder = MultiScaleDecoder(
                max_depth=self.max_depth,
                input_res=self.gt_resolution,
                norm_type=self.norm_type,
                act_type=self.act_type,
                only_residual=self.only_residual,
                use_warp=self.use_warp,
                dtype=self.dtype,
            )

        decoder_group = []
        res = self.gt_resolution // 2 ** self.max_depth
        out_ch = None
        for i in range(self.max_depth):
            out_ch = CHANNEL_QUERY_DICT[res * 2]
            decoder_group.append(
                DecoderBlock(out_ch, self.norm_type, self.act_type, dtype=self.dtype)
            )
            res *= 2
        self.decoder_group = decoder_group
        self.out_conv = Conv(3, (3, 3), padding=1, dtype=self.dtype)
        self.residual_conv = Conv(3, (3, 3), padding=1, dtype=self.dtype)

        quantizers, before_quant, after_quant = [], [], []
        for s in range(len(scales)):
            quantizers.append(
                WeightedVectorQuantizer(
                    n_e=int(emb_nums[s]),
                    e_dim=int(emb_dims[s]),
                    LQ_stage=self.LQ_stage,
                    use_weight=self.use_weight,
                    weight_alpha=self.weight_alpha,
                )
            )
            scale_in_ch = CHANNEL_QUERY_DICT[int(scales[s])]
            before_quant.append(Conv(int(emb_dims[s]), (1, 1), padding=0, dtype=self.dtype))
            after_quant.append(CombineQuantBlock(scale_in_ch, dtype=self.dtype))
        self.quantize_group = quantizers
        self.before_quant_group = before_quant
        self.after_quant_group = after_quant
        self._scales = tuple(int(x) for x in scales)

        # semantic cluster head for HQ pretraining (reference:
        # dehaze_vq_weight_arch.py:402-410 — 1x1 conv + ReLU projecting the
        # quantized latent onto frozen VGG features; the VGG forward lives in
        # the trainer). The reference taps vgg19 relu4_4; we tap our VGG16
        # relu3_3 (deepest available offline), same mechanism.
        if self.use_semantic_loss:
            self.conv_semantic = Conv(self.semantic_dim, (1, 1), padding=0,
                                      dtype=self.dtype)

    def encode_and_decode(self, x, gt_indices=None, weight_alpha=None):
        enc_feats = self.multiscale_encoder(x)

        codebook_loss_list = []
        indices_list = []
        code_decoder_output = []

        quant_idx = 0
        prev_dec_feat = None
        prev_quant_feat = None
        feat_to_quant = None
        z_quant = None

        h = enc_feats
        for i in range(self.max_depth):
            cur_res = self.gt_resolution // 2 ** self.max_depth * 2 ** i
            if cur_res in self._scales:
                if prev_dec_feat is not None:
                    before = jnp.concatenate([h, prev_dec_feat], axis=-1)
                else:
                    before = h
                feat_to_quant = self.before_quant_group[quant_idx](before)
                gt_i = gt_indices[quant_idx] if gt_indices is not None else None
                z_quant, cb_loss, indices = self.quantize_group[quant_idx](
                    feat_to_quant, gt_indices=gt_i, weight_alpha=weight_alpha
                )
                if not self.use_quantize:
                    z_quant = feat_to_quant
                h = self.after_quant_group[quant_idx](z_quant, prev_quant_feat)
                codebook_loss_list.append(cb_loss)
                indices_list.append(indices)
                quant_idx += 1
                prev_quant_feat = z_quant

            h = self.decoder_group[i](h)
            code_decoder_output.append(h)
            prev_dec_feat = h

        out_img = self.out_conv(h)
        out_img_residual = None
        if self.LQ_stage and self.use_residual:
            src = enc_feats if self.only_residual else jax.lax.stop_gradient(enc_feats)
            residual_feature = self.multiscale_decoder(src, code_decoder_output)
            out_img_residual = self.residual_conv(residual_feature)

        codebook_loss = sum(codebook_loss_list) if codebook_loss_list else 0.0
        return (
            out_img,
            out_img_residual,
            codebook_loss,
            feat_to_quant,
            z_quant,
            indices_list,
        )

    def __call__(self, x, gt_indices=None, weight_alpha=None):
        return self.encode_and_decode(x, gt_indices=gt_indices, weight_alpha=weight_alpha)

    def semantic_embed(self, z_quant):
        """Project quantized features for the semantic cluster loss."""
        import jax as _jax

        return _jax.nn.relu(self.conv_semantic(z_quant))

    def decode_indices(self, indices):
        """indices [B, h, w] -> image (reference: dehaze_vq_weight_arch.py:489-498)."""
        b, h, w = indices.shape
        z_q = self.quantize_group[0].embed(indices, shape=(b, h, w, -1))
        x = self.after_quant_group[0](z_q)
        for m in self.decoder_group:
            x = m(x)
        return self.out_conv(x)
