"""Adaptive Feature Transformation (AFT) decoder
(reference: deformableDecoder_arch.py).

  * :class:`DCNv2Pack` — modulated deformable conv whose offsets/masks are
    predicted from a *different* feature map (deformableDecoder_arch.py:132-152),
    zero-initialized so it starts as a plain conv.
  * :class:`WarpBlock` — offset conv + DCNv2 alignment of VQGAN decoder
    features to the current hidden state (:279-290).
  * :class:`Mix` — learned sigmoid-scalar blend (:579-590).
  * :class:`MultiScaleDecoder2` — VQGAN-shaped decoder fusing
    (flow latent, VQGAN code_decoder_output, conditional-encoder mid_feat)
    (:413-576). Instantiated with ch=128 (VQLLFLOWDeformable_arch.py:29-32).

The reference constructs ``scale``/``bias``/``enc`` submodules and a
``conv_out`` in MultiScaleDecoder2 that its forward never uses
(:489-519,476); they are intentionally not replicated.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import AttnBlock, Conv, GroupNorm32, ResnetBlock, Upsample, swish
from ..ops.dcn import modulated_deform_conv

Dtype = Any


class DCNv2Pack(nn.Module):
    """Modulated deformable conv, offsets from a side feature map.

    conv_offset is zero-initialized (reference: deform_conv.py:369-373) so
    the op degenerates to mask=sigmoid(0)=0.5 times a regular conv at init.

    impl: 'xla' (exact, unbounded offsets), 'pallas' (Pallas kernel with
    offsets clamped to +-2 px; ~2.5x faster at GLARE shapes, PERF_NOTES.md),
    'chain' (clamped dense select-chain, gather-free and autodiff-dense —
    the training-path formulation, see ops/dcn.py), or 'hybrid' (exact
    semantics at near-clamped speed: fast clamped base path + compacted
    exact gather for the measured out-of-band tail, see
    ops/dcn.py:modulated_deform_conv_hybrid).
    """

    features: int
    deformable_groups: int = 4
    kernel_size: int = 3
    dtype: Dtype = None
    impl: str = "xla"
    # im2col chunk for the XLA op: 16384 is fastest for inference; training
    # passes 4096 (via remat) or the backward's lane-padded gather temps
    # exceed one v5e's HBM (see ops/dcn.py)
    pixels_per_chunk: int = 16384
    # clamp radius for the 'pallas'/'chain'/'hybrid' impls (ignored by exact
    # 'xla'). 2 covers GLARE's learned-offset regime; 4 widens the safety
    # margin at (2R+1)^2-cell cost (both impls verified at R=4,
    # PERF_NOTES.md). The 'pallas' impl also accepts a [G][K] nested tuple
    # of PER-TAP radii (from a per-(g,k) offset audit, OFFSET_HIST per_gk):
    # each tap unrolls only its own (2R_gk+1)^2 cells — the cost-optimal
    # exact configuration when drift is tap-specific (ops/dcn_pallas.py).
    max_offset: Any = 2
    # 'hybrid'/'hybrid_gather' only: fraction of row blocks (hybrid) or
    # pixels (hybrid_gather) the exact-tail buffer can hold (exactness
    # guaranteed while the out-of-band fraction stays below it; overflow
    # keeps the clamped value)
    hybrid_capacity: float = 0.125
    # 'hybrid' only: the tail pass's clamp radius — exact for offsets up to
    # this. Default 8 covers p999+ of measured checkpoints
    # (OFFSET_HIST_r03.json: p999 6.5, max 11.1); auto_configure_dcn raises
    # it from the loaded checkpoint's audit. 'hybrid_gather' is unbounded.
    hybrid_tail_offset: int = 8
    # sow the raw [B,H,W,G,K,2] offsets for distribution audits
    # (audit_dcn_offsets / tools/offset_histogram.py). Off by default: under
    # a capturing apply the sow would materialize ~150 MB/batch at the
    # protocol shape, turning the cheap [2]-counter exactness guard into a
    # bandwidth hit.
    audit_offsets: bool = False

    @nn.compact
    def __call__(self, x, feat):
        k = self.kernel_size
        K = k * k
        G = self.deformable_groups
        B, H, W, C = x.shape

        raw = Conv(
            G * 3 * K, (k, k), padding=k // 2, zero_init=True,
            dtype=self.dtype, name="conv_offset",
        )(feat)
        raw = raw.astype(jnp.float32)
        o1, o2, m = jnp.split(raw, 3, axis=-1)
        offset = jnp.stack(
            [o1.reshape(B, H, W, G, K), o2.reshape(B, H, W, G, K)], axis=-1
        )
        mask = jax.nn.sigmoid(m.reshape(B, H, W, G, K))
        if self.audit_offsets:
            # observability for clamp-safety audits
            # (tools/offset_histogram.py); traced away unless the caller
            # also captures intermediates
            self.sow("intermediates", "offsets", offset)

        weight = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32,
                -1.0 / (C * K) ** 0.5, 1.0 / (C * K) ** 0.5,
            ),
            (k, k, C, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.impl in ("pallas", "chain"):
            # clamped impls are exact only while |offset| <= R: report the
            # violating-tap count in the same [blocks, taps] format as the
            # cascade so the infer CLI's exactness guard covers this path
            # too (auto_configure_dcn may pick a plain wide clamp per warp —
            # offsets are input-dependent, the audit radius has a 1 px
            # margin, and anything beyond silently clamps without this).
            # Traced away unless the caller captures intermediates.
            if isinstance(self.max_offset, (tuple, list)):
                thresh = jnp.asarray(
                    np.array(self.max_offset, np.float32)
                )[None, None, None, :, :]
            else:
                thresh = float(self.max_offset)
            overflow = jnp.stack([
                jnp.zeros((), jnp.int32),
                jnp.sum((jnp.max(jnp.abs(offset), axis=-1)
                         > thresh).astype(jnp.int32)),
            ])
            self.sow("intermediates", "dcn_overflow", overflow)
        if self.impl == "pallas":
            from ..ops.dcn_pallas import modulated_deform_conv_pallas

            mo = self.max_offset
            if isinstance(mo, (tuple, list)):  # hashable for the jit cache
                mo = tuple(tuple(int(r) for r in row) for row in mo)
            return modulated_deform_conv_pallas(
                x, offset, mask, weight, bias, max_offset=mo
            ).astype(x.dtype)
        if self.impl == "chain":
            from ..ops.dcn import modulated_deform_conv_chain

            mo = self.max_offset
            if isinstance(mo, (tuple, list)):  # chain op is uniform-radius
                mo = max(max(row) for row in mo)
            return modulated_deform_conv_chain(
                x, offset, mask, weight, bias, max_offset=mo
            ).astype(x.dtype)
        if self.impl == "hybrid":
            # cascaded band kernel: clamp-R base + row-block-compacted
            # R_tail pass. Exact for |offset| <= hybrid_tail_offset — the
            # fast default for reference-trained weights. On non-TPU
            # backends fall back to the gather hybrid (the Mosaic kernel
            # needs hardware; interpret mode is test-only).
            mo = self.max_offset
            if isinstance(mo, (tuple, list)):  # cascade is uniform-radius
                mo = max(max(row) for row in mo)
            if jax.default_backend() == "tpu":
                from ..ops.dcn_pallas import modulated_deform_conv_pallas_cascade

                out, overflow = modulated_deform_conv_pallas_cascade(
                    x, offset, mask, weight, bias,
                    max_offset=mo,
                    tail_offset=max(self.hybrid_tail_offset, mo + 1),
                    capacity_frac=self.hybrid_capacity,
                    return_overflow=True,
                )
                # [n_overflow_blocks, n_taps_beyond_tail]: nonzero means
                # this image's output is NOT exact DCNv2 — the audit batch's
                # capacity/radius did not generalize. Captured by
                # VQLLFLOWDModel.get_sr so the infer CLI can warn/upgrade.
                self.sow("intermediates", "dcn_overflow", overflow)
                return out.astype(x.dtype)
            from ..ops.dcn import modulated_deform_conv_hybrid

            return modulated_deform_conv_hybrid(
                x, offset, mask, weight, bias, max_offset=mo,
                capacity_frac=self.hybrid_capacity, base="chain",
            ).astype(x.dtype)
        if self.impl == "hybrid_gather":
            # compacted exact-GATHER tail: unbounded offsets (full CUDA
            # semantics) at gather-bound speed (~3.5 img/s e2e at the
            # protocol shape vs ~8+ for 'hybrid'; see ops/dcn.py)
            from ..ops.dcn import modulated_deform_conv_hybrid

            base = "pallas" if jax.default_backend() == "tpu" else "chain"
            mo = self.max_offset
            if isinstance(mo, (tuple, list)):
                mo = max(max(row) for row in mo)
            return modulated_deform_conv_hybrid(
                x, offset, mask, weight, bias, max_offset=mo,
                capacity_frac=self.hybrid_capacity, base=base,
            ).astype(x.dtype)
        return modulated_deform_conv(
            x, offset, mask, weight, bias, padding=k // 2,
            pixels_per_chunk=self.pixels_per_chunk,
        )


class WarpBlock(nn.Module):
    """Align VQGAN features to the hidden state via DCNv2
    (reference: deformableDecoder_arch.py:279-290).

    warp_mode:
      'dcn'  — exact DCNv2 parity (gather-based; default)
      'flow' — TPU-fast bounded group-flow alignment + dense 3x3 conv
               (gather-free; see ops/warp.py for the rationale)
    """

    dtype: Dtype = None
    warp_mode: str = "dcn"
    flow_max_offset: int = 2
    dcn_impl: str = "xla"
    dcn_pixels_per_chunk: int = 16384
    # int, or a [G][K] nested tuple of per-tap radii (pallas impl only)
    dcn_max_offset: Any = 2
    dcn_hybrid_capacity: float = 0.125
    dcn_hybrid_tail_offset: int = 8
    dcn_audit_offsets: bool = False

    @nn.compact
    def __call__(self, x_vq, x_residual):
        c = x_vq.shape[-1]
        side = Conv(c, (3, 3), padding=1, dtype=self.dtype, name="offset")(
            jnp.concatenate([x_vq, x_residual.astype(x_vq.dtype)], axis=-1)
        )
        if self.warp_mode == "flow":
            from ..ops.warp import flow_warp_align

            G = 4
            raw = Conv(G * 2, (3, 3), padding=1, zero_init=True,
                       dtype=self.dtype, name="flow_head")(side)
            B, H, W, _ = raw.shape
            flow = jnp.tanh(raw.astype(jnp.float32)).reshape(B, H, W, G, 2)
            flow = flow * self.flow_max_offset
            aligned = flow_warp_align(x_vq, flow, max_offset=self.flow_max_offset)
            return Conv(c, (3, 3), padding=1, dtype=self.dtype, name="post_conv")(aligned)
        return DCNv2Pack(c, deformable_groups=4, dtype=self.dtype,
                         impl=self.dcn_impl,
                         pixels_per_chunk=self.dcn_pixels_per_chunk,
                         max_offset=self.dcn_max_offset,
                         hybrid_capacity=self.dcn_hybrid_capacity,
                         hybrid_tail_offset=self.dcn_hybrid_tail_offset,
                         audit_offsets=self.dcn_audit_offsets,
                         name="dcn")(x_vq, side)


class Mix(nn.Module):
    """out = sigmoid(w)*fea1 + (1-sigmoid(w))*fea2 with scalar learned w
    (reference: deformableDecoder_arch.py:579-590)."""

    m: float = -0.80

    @nn.compact
    def __call__(self, fea1, fea2):
        w = self.param("w", lambda key: jnp.asarray([self.m], jnp.float32))
        mix_factor = jax.nn.sigmoid(w)[0].astype(fea1.dtype)
        return fea1 * mix_factor + fea2.astype(fea1.dtype) * (1 - mix_factor)


class MultiScaleDecoder2(nn.Module):
    """AFT decoder (reference: deformableDecoder_arch.py:413-576).

    forward(z, code_decoder_output, enc_feat):
      VQGAN-decoder trunk from the flow latent z; at levels != 2:
        h = Mix(enc_feat[level], h)
        x_vq = WarpBlock(code_decoder_output[1-level], h)
        h = h + x_vq * (mean(h) / mean(x_vq))
      final: GroupNorm -> swish -> residual_conv(ch -> 3).
    """

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (64,)
    dropout: float = 0.0
    resolution: int = 256
    z_channels: int = 3
    dtype: Dtype = None
    warp_mode: str = "dcn"
    # The four dcn_* knobs accept either a scalar (shared by both warps) or
    # a 2-tuple indexed by warp id (warp_0 = quarter-res level, warp_1 =
    # half-res level). Offset drift is warp-specific (OFFSET_HIST_r05.json:
    # warp_0 reaches 6.4 px while warp_1 stays under 0.9), so per-warp
    # dispatch lets the 80%-of-cost warp keep the cheap clamped kernel
    # while only the drifted warp pays for a wide radius.
    dcn_impl: Any = "xla"
    dcn_max_offset: Any = 2
    dcn_hybrid_capacity: Any = 0.125
    dcn_hybrid_tail_offset: Any = 8
    dcn_audit_offsets: bool = False
    # per-block rematerialization for training memory (see
    # vqllflow_deformable.VQLLFLOWDeformable.remat)
    remat: bool = False

    @nn.compact
    def __call__(self, z, code_decoder_output, enc_feat):
        RB = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        AB = nn.remat(AttnBlock) if self.remat else AttnBlock
        WB = nn.remat(WarpBlock) if self.remat else WarpBlock
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        h = Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = RB(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(h)
        h = AB(dtype=self.dtype, name="mid_attn_1")(h)
        h = RB(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(h)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = RB(
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
                if curr_res in self.attn_resolutions:
                    h = AB(dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)

            if i_level != 2:
                # the reference forces f32 here because its CUDA DCN ext has
                # no half kernels (deformableDecoder_arch.py:548-551); the
                # TPU op is dtype-generic so we stay in the compute dtype
                wdt = self.dtype or jnp.float32
                h = h.astype(wdt)
                x_code = code_decoder_output[1 - i_level].astype(wdt)
                h = Mix(
                    m=-1.0 if i_level == 1 else -0.6, name=f"mix_{1 - i_level}"
                )(enc_feat[i_level].astype(wdt), h)
                w_idx = 1 - i_level

                def _pw(v, w=w_idx):
                    # scalar -> shared; tuple/list -> per-warp
                    return v[w] if isinstance(v, (tuple, list)) else v

                x_vq = WB(
                    dtype=self.dtype, warp_mode=self.warp_mode,
                    dcn_impl=_pw(self.dcn_impl),
                    dcn_max_offset=_pw(self.dcn_max_offset),
                    dcn_hybrid_capacity=_pw(self.dcn_hybrid_capacity),
                    dcn_hybrid_tail_offset=_pw(self.dcn_hybrid_tail_offset),
                    dcn_audit_offsets=self.dcn_audit_offsets,
                    # training (remat on) needs small DCN chunks for HBM
                    dcn_pixels_per_chunk=4096 if self.remat else 16384,
                    name=f"warp_{w_idx}",
                )(x_code, h)
                h = h + x_vq * (jnp.mean(h) / jnp.mean(x_vq))

            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm32(name="norm_out")(h)
        h = swish(h)
        h = Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="residual_conv")(h)
        return h
