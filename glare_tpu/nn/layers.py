"""Foundation flax.linen layers, NHWC, with torch-matching initialization.

These mirror the ldm-style building blocks of the reference
(``/root/reference/code/models/modules/encoder_decoder.py``):
ResnetBlock (GroupNorm32 + swish), AttnBlock (single-head full spatial
attention), Up/Downsample (nearest x2 / zero-pad stride-2 conv).

Initialization parity: torch ``nn.Conv2d`` defaults to kaiming-uniform with
a=sqrt(5), which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
kernel and bias — replicated here so training-from-scratch dynamics match.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def swish(x):
    return x * jax.nn.sigmoid(x)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape is HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """NHWC conv with torch-default init and optional zero init.

    kernel shape HWIO; `padding` may be int, 'SAME', 'VALID', or explicit.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    zero_init: bool = False
    feature_group_count: int = 1
    dtype: Dtype = None
    kernel_init: Any = None  # optional override (e.g. scaled-kaiming)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kshape = (kh, kw, in_ch // self.feature_group_count, self.features)
        if self.zero_init:
            kinit = nn.initializers.zeros
            binit = nn.initializers.zeros
        else:
            kinit = self.kernel_init or torch_conv_kernel_init
            binit = torch_conv_bias_init(kh * kw * in_ch // self.feature_group_count)
        kernel = self.param("kernel", kinit, kshape)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=tuple(self.strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(dtype)
        return y


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6, affine) in f32 for numerical stability
    (reference: encoder_decoder.py:34-35)."""

    num_groups: int = 32
    epsilon: float = 1e-6
    # GLARE_GN_BF16=1: keep the IO in the network dtype (stats still f32 via
    # explicit accumulation) — halves the 2-pass norm traffic per block.
    # Env read at module-CONSTRUCTION time (default_factory), so set it
    # before building the network; changing it after construction has no
    # effect (perf-experiment switch, not part of the option plumbing).
    bf16_io: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("GLARE_GN_BF16", "0") == "1")

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        if self.bf16_io and x.dtype == jnp.bfloat16:
            # flax computes the mean/var in f32 regardless of `dtype`
            # (normalization._compute_stats), so this only changes the IO
            # precision, and the param tree is identical to the f32 path
            return nn.GroupNorm(
                num_groups=self.num_groups, epsilon=self.epsilon,
                dtype=jnp.bfloat16,
            )(x)
        y = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=jnp.float32
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class Upsample(nn.Module):
    """Nearest x2 then optional 3x3 conv (reference: encoder_decoder.py:38-53)."""

    with_conv: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Asymmetric zero-pad (0,1,0,1) + stride-2 valid conv, or avg-pool
    (reference: encoder_decoder.py:56-75)."""

    with_conv: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.with_conv:
            x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
            x = Conv(c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlock(nn.Module):
    """GroupNorm -> swish -> conv, twice, with 1x1 nin shortcut on channel
    change (reference: encoder_decoder.py:78-137; temb unused in GLARE)."""

    out_channels: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: Dtype = None
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = GroupNorm32(name="norm1")(x)
        h = swish(h)
        h = Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(name="norm2")(h)
        h = swish(h)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=self.deterministic)(h)
        h = Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = Conv(out_ch, (1, 1), padding=0, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full spatial self-attention with 1x1 qkv convs
    (reference: encoder_decoder.py:140-192).

    Softmax and the attention matmuls accumulate in f32. Beyond
    `chunk_threshold` tokens the [n, n] attention matrix never fully
    materializes — at 600x400 protocol inputs the latent has ~16k tokens
    and a dense f32 matrix costs ~1 GB per block, which collapses batched
    throughput. The default large-n path is a fori_loop over query chunks
    (dynamic_slice in / dynamic_update_slice out, both in the natural
    [b, n, c] layout — no transposed copies).

    `use_flash=True` switches the large-n path to the stock Pallas
    flash-attention kernel (online softmax, tokens padded to the 512 query
    block and masked via segment ids — verified 2.6e-4 vs the dense
    reference). Isolated it wins (5.6 vs 8.2 ms at 16k tokens, d=512) but
    IN-GRAPH it regresses stage-3 end-to-end ~30% (PERF_NOTES.md: XLA
    fuses the chunked matmuls with surrounding ops and overlaps them;
    the opaque pallas_call plus pad/unpad copies serialize) — so it stays
    opt-in, off by default.
    """

    dtype: Dtype = None
    chunk_threshold: int = 8192
    # The GLARE_ATTN_* envs are perf-experiment switches read at module-
    # CONSTRUCTION time (default_factory) — set them before building the
    # network; they deliberately bypass the network_G option plumbing
    # (numerics are unchanged for QCHUNK; FLASH/MAT_BF16 are documented
    # negative results kept reproducible, PERF_NOTES.md).
    q_chunk: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("GLARE_ATTN_QCHUNK", "2048")))
    use_flash: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("GLARE_ATTN_FLASH", "0") == "1")
    # Store the [n, n] attention matrix in bf16 END TO END: the QK^T MXU
    # pass emits bf16 scores (instead of f32) and the softmax'd probs are
    # stored bf16 too; max/sum statistics still accumulate in f32. This
    # halves every HBM leg of the score materialization, which is what
    # bounds the chunked path at 16k tokens (profile: softmax loop-fusion
    # bandwidth-saturated at 759 GB/s). Measured e2e 8.06 -> 9.16 img/s
    # (+14%) at 620x420 B=8 bf16; parity vs the f32-score chunked path is
    # 3.9e-3 rel-max — bf16 rounding, matched to the bf16 q/k inputs.
    # Default AUTO: on iff the incoming q/k are bf16 (f32 networks keep
    # f32 scores). GLARE_ATTN_MAT_BF16=1/0 forces it on/off. Round-2's
    # probs-only-bf16 variant (flat e2e) is superseded by this one.
    softmax_bf16: Optional[bool] = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("GLARE_ATTN_MAT_BF16", ""), None))
    # unroll the q-chunk loop when n_chunks <= this (0 = keep the fori_loop).
    # Hypothesis was that unrolling lets XLA pipeline chunk k's softmax with
    # chunk k+1's matmuls (the trace shows the loop body at 147 vs 168
    # TFLOP/s outside loops); MEASURED NEGATIVE at 620x420 B=8:
    # unroll=8 -> 5.87 img/s vs lax.map 7.67 (the live score buffers push
    # the fused graph out of VMEM). Kept as an opt-in reproducibility knob,
    # default off (PERF_NOTES.md round-3 sweep).
    unroll_chunks: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("GLARE_ATTN_UNROLL", "0")))
    # Bespoke fused online-softmax kernel (ops/attn_pallas.py): the [bq, bk]
    # score tile lives only in VMEM, so the softmax's HBM round-trip
    # (~8 ms/img at 620x420, PROFILE_r03.json) disappears entirely.
    # Unlike the stock flash kernel (use_flash, measured -30% e2e) it takes
    # the natural [b, n, c] layout with no head axis or 512-multiple
    # segment-id padding. GLARE_ATTN_FUSED=1/0 forces on/off; default AUTO
    # uses it on TPU for large-n bf16 inputs (inference path — backward
    # would need a custom VJP, so training keeps the chunked path).
    use_fused: Optional[bool] = dataclasses.field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("GLARE_ATTN_FUSED", ""), None))

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h_ = GroupNorm32(name="norm")(x)
        n = h * w
        scale = int(c) ** -0.5

        on_tpu = jax.devices()[0].platform == "tpu"
        qkv_bf16 = (self.dtype == jnp.bfloat16 if self.dtype is not None
                    else x.dtype == jnp.bfloat16)
        fused_ok = (
            (self.use_fused if self.use_fused is not None else qkv_bf16)
            and n > self.chunk_threshold
            and on_tpu
            and c % 128 == 0
        )
        if fused_ok:
            # pad the normalized feature map ONCE to the kernel's block
            # multiple and run the 1x1 projections on the padded tokens —
            # instead of padding q, k, AND v afterwards (3x the pad
            # traffic; ~0.8 GB/batch per 16k-token block at 620x420 B=8).
            # Padded rows project to the bias vector (finite), which the
            # kernel masks by n_true; padded q rows are sliced away below.
            from glare_tpu.ops.attn_pallas import flash_attention_nhc

            pad = (-n) % 2048  # lcm of the kernel's bq/bk choices
            t = h_.reshape(b, n, 1, c)
            if pad:
                t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
            q = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="q")(t)[:, :, 0]
            k = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="k")(t)[:, :, 0]
            v = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="v")(t)[:, :, 0]
            out = flash_attention_nhc(q, k, v, n_true=n).astype(x.dtype)
            out = out[:, :n] if pad else out
            out = out.reshape(b, h, w, c)
            out = Conv(c, (1, 1), padding=0, dtype=self.dtype,
                       name="proj_out")(out)
            return x + out

        q = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="q")(h_)
        k = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="k")(h_)
        v = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="v")(h_)

        q = q.reshape(b, n, c)
        k = k.reshape(b, n, c)
        v = v.reshape(b, n, c)

        flash_ok = (
            self.use_flash
            and n > self.chunk_threshold
            and on_tpu
            and c % 128 == 0
        )
        if flash_ok:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            n_pad = -(-n // 512) * 512
            pad = n_pad - n
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))[:, None]
            kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))[:, None]
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))[:, None]
            seg = jnp.concatenate(
                [jnp.ones((b, n), jnp.int32), jnp.zeros((b, pad), jnp.int32)], 1
            )
            out = flash_attention(
                qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=scale
            )
            out = out[:, 0, :n, :].astype(x.dtype)
        elif n <= self.chunk_threshold:
            # same auto-bf16 score semantics as the chunked path below, so
            # a bf16 network behaves uniformly across image sizes
            mat_bf16 = (self.softmax_bf16 if self.softmax_bf16 is not None
                        else q.dtype == jnp.bfloat16)
            if mat_bf16:
                attn = jnp.einsum("bqc,bkc->bqk", q, k,
                                  preferred_element_type=jnp.bfloat16)
                a = attn.astype(jnp.float32) * scale
                m = jnp.max(a, axis=-1, keepdims=True)
                e = jnp.exp(a - m).astype(jnp.bfloat16)
                s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
                attn = e / s.astype(jnp.bfloat16)
            else:
                attn = jnp.einsum("bqc,bkc->bqk", q, k,
                                  preferred_element_type=jnp.float32)
                attn = jax.nn.softmax(attn * scale, axis=-1)
            out = jnp.einsum(
                "bqk,bkc->bqc", attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            qc = self.q_chunk
            pad = (-n) % qc
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
            n_chunks = qp.shape[1] // qc

            mat_bf16 = (self.softmax_bf16 if self.softmax_bf16 is not None
                        else q.dtype == jnp.bfloat16)

            def one_chunk(q_blk):
                if mat_bf16:
                    # bf16 scores straight off the MXU: the [qc, n] block is
                    # written/read from HBM at half width. exp() runs on the
                    # f32 (score - max) difference, so the only precision
                    # loss is bf16 rounding of the raw scores (~3 decimal
                    # digits), matched to the bf16 q/k that produced them.
                    a = jnp.einsum("bqc,bkc->bqk", q_blk, k,
                                   preferred_element_type=jnp.bfloat16)
                    a = a.astype(jnp.float32) * scale
                    m = jnp.max(a, axis=-1, keepdims=True)
                    e = jnp.exp(a - m).astype(jnp.bfloat16)
                    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
                    a = e / s.astype(jnp.bfloat16)
                else:
                    a = jnp.einsum("bqc,bkc->bqk", q_blk, k,
                                   preferred_element_type=jnp.float32)
                    a = jax.nn.softmax(a * scale, axis=-1)
                return jnp.einsum(
                    "bqk,bkc->bqc", a.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)

            # Loop over chunk *indices* with dynamic_slice/dynamic_update_slice
            # on the token axis: lax.map would need the chunk axis leading,
            # which materializes a transposed copy of q going in and of the
            # stacked output coming out (~0.7 GB/img of pure relayout traffic
            # at 620x420 B=8 across the ten 16k-token blocks). The fori_loop
            # keeps both buffers in their natural [b, n, c] layout; XLA
            # aliases the carried output so the update is in place. Static
            # trip count -> scan lowering, so reverse AD still works.
            def body(i, acc):
                q_blk = jax.lax.dynamic_slice(qp, (0, i * qc, 0), (b, qc, c))
                return jax.lax.dynamic_update_slice(
                    acc, one_chunk(q_blk), (0, i * qc, 0))

            if 0 < n_chunks <= self.unroll_chunks:
                out = jnp.concatenate(
                    [one_chunk(qp[:, i * qc:(i + 1) * qc]) for i in range(n_chunks)],
                    axis=1)
            else:
                out = jax.lax.fori_loop(
                    0, n_chunks, body,
                    jnp.zeros((b, n_chunks * qc, c), x.dtype))
            out = out[:, :n]

        out = out.reshape(b, h, w, c)
        out = Conv(c, (1, 1), padding=0, dtype=self.dtype, name="proj_out")(out)
        return x + out


class ResBlockGN(nn.Module):
    """RIDCP-style ResBlock: GN->swish->conv x2 with 1x1 conv_out shortcut
    (reference: deformableDecoder_arch.py:157-183)."""

    out_channels: int | None = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x_in):
        in_ch = x_in.shape[-1]
        out_ch = self.out_channels or in_ch
        x = GroupNorm32(name="norm1")(x_in)
        x = swish(x)
        x = Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = GroupNorm32(name="norm2")(x)
        x = swish(x)
        x = Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        if in_ch != out_ch:
            x_in = Conv(out_ch, (1, 1), padding=0, dtype=self.dtype, name="conv_out")(x_in)
        return x + x_in
