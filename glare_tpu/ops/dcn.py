"""Modulated deformable convolution (DCNv2) — TPU-native.

This replaces the reference's CUDA extension
(``code/models/modules/ops/dcn/src/deform_conv_cuda_kernel.cu:191+``:
``modulated_deformable_im2col_gpu_kernel`` and its col2im / col2im_coord
backward kernels). Exported op parity:

  * :func:`modulated_deform_conv`  (v2: offsets + sigmoid mask) — the op
    GLARE's AFT decoder uses (DCNv2Pack, deformable_groups=4, 3x3, pad 1).
  * :func:`deform_conv`            (v1: offsets only).

Formulation: bilinear *im2col via XLA row-gathers* + one MXU GEMM, the
TPU-shaped equivalent of the CUDA im2col+GEMM driver
(``deform_conv_cuda.cpp:490-570``). All channels of a deformable group share
a sampling position, so each gather fetches a contiguous [C/G]-channel row —
a lane-aligned, bandwidth-friendly gather. The backward pass (autodiff)
yields exactly the scatter-add / coordinate-gradient math of
``deformable_col2im(_coord)`` for free.

Out-of-range handling matches the CUDA kernel: a sample whose position
falls outside (-1, H) x (-1, W) contributes zero; border samples use
partial bilinear weights (zero padding semantics).

Layouts (native, NHWC):
  x      [B, H, W, C]
  offset [B, H, W, G, K, 2]   (dy, dx) per deformable group g, tap k
  mask   [B, H, W, G, K]      (already sigmoid-ed by the caller)
  weight [kh, kw, C, O]       (HWIO)
  out    [B, Ho, Wo, O]

The torch checkpoint layout (offset channels = cat(o1, o2) then interleaved
per group, deform_conv.py:362-370) maps onto this via a fixed channel
permutation handled by the weight converter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_gather(x_groups, py, px, H, W):
    """Sample grouped channels at fractional positions.

    x_groups: [B, H*W, G, Cg]
    py, px:   [B, P, G, K] fractional sample positions (output-pixel major)
    returns:  [B, P, K, G, Cg]

    Formulated as ONE flat row-major ``jnp.take`` over a [G*B*H*W, Cg]
    view: XLA lowers an integer-array take on axis 0 to a gather with
    slice_sizes [1, Cg] — a true row gather. The previous
    ``take_along_axis`` with the index broadcast over Cg lowered to a
    per-ELEMENT gather (Cg x the index traffic) and measured ~40x slower
    at DCN shapes on this backend (tools/bench_gather.py).
    """
    B, HW, G, Cg = x_groups.shape
    P, K = py.shape[1], py.shape[3]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0  # weight of y0+1
    wx1 = px - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    # CUDA-kernel semantics: positions outside (-1, H) x (-1, W) -> zero
    in_range = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    # group-major rows so (g, b, lin) flattens to one gather axis
    xf = x_groups.transpose(2, 0, 1, 3).reshape(G * B * HW, Cg)
    gb_base = (
        jnp.arange(G, dtype=jnp.int32)[None, None, :, None] * (B * HW)
        + jnp.arange(B, dtype=jnp.int32)[:, None, None, None] * HW
    )  # [B, 1, G, 1]

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W) & in_range
        lin = jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W + jnp.clip(
            xi, 0, W - 1
        ).astype(jnp.int32)
        vals = jnp.take(xf, (gb_base + lin).reshape(-1), axis=0)  # [BPGK, Cg]
        w = (wgt * valid.astype(wgt.dtype)).reshape(-1)
        return vals * w[:, None].astype(vals.dtype)

    out = corner(y0, x0, wy0 * wx0)
    out = out + corner(y0, x0 + 1, wy0 * wx1)
    out = out + corner(y0 + 1, x0, wy1 * wx0)
    out = out + corner(y0 + 1, x0 + 1, wy1 * wx1)
    # [B, P, G, K, Cg] -> [B, P, K, G, Cg]
    return out.reshape(B, P, G, K, Cg).transpose(0, 1, 3, 2, 4)


@functools.partial(
    jax.jit, static_argnames=("stride", "padding", "dilation", "pixels_per_chunk")
)
def modulated_deform_conv(
    x, offset, mask, weight, bias=None, stride=1, padding=1, dilation=1,
    pixels_per_chunk=16384,
):
    """DCNv2 forward. See module docstring for layouts.

    The bilinear im2col buffer is [P, K, C] — at full image resolution that
    is GBs — so output pixels are processed in chunks of `pixels_per_chunk`
    via lax.map (the TPU analogue of the CUDA driver's per-batch im2col
    staging, deform_conv_cuda.cpp:522-545), bounding live memory to one
    chunk's gather + one MXU GEMM. 16384 is fastest for inference; TRAINING must pass
    4096 (DCNv2Pack does when the decoder is built with remat=True) or
    the backward's corner-gather temps — [p*K, G, Cg] with Cg=32 lanes,
    lane-padded 4x by XLA — exceed one v5e's HBM at the stage-3 conf."""
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert wc == C, (weight.shape, x.shape)
    G = offset.shape[3]
    K = kh * kw
    assert offset.shape == (B, H, W, G, K, 2), offset.shape
    assert mask.shape == (B, H, W, G, K), mask.shape
    assert C % G == 0
    Cg = C // G

    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    P = Ho * Wo

    # base sampling grid per output pixel and tap
    hh = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ww = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=jnp.float32) * dilation,
        jnp.arange(kw, dtype=jnp.float32) * dilation,
        indexing="ij",
    )
    ky = ky.reshape(K)
    kx = kx.reshape(K)

    off = offset.astype(jnp.float32)
    if stride != 1:
        off = off[:, ::stride, ::stride]
        mask = mask[:, ::stride, ::stride]
    off = off.reshape(B, P, G, K, 2)
    m = mask.reshape(B, P, G, K)

    base_y = (hh[:, None] + ky[None, :]).reshape(Ho, 1, K) + jnp.zeros((1, Wo, 1))
    base_x = (ww[:, None] + kx[None, :]).reshape(1, Wo, K) + jnp.zeros((Ho, 1, 1))
    base_y = base_y.reshape(1, P, 1, K)
    base_x = base_x.reshape(1, P, 1, K)

    py = base_y + off[..., 0]  # [B, P, G, K]
    px = base_x + off[..., 1]

    x_groups = x.reshape(B, H * W, G, Cg)
    w = weight.reshape(K, G, Cg, O).astype(x.dtype)

    def compute(py_c, px_c, m_c):
        sampled = _bilinear_gather(x_groups, py_c, px_c, H, W)  # [B, p, K, G, Cg]
        sampled = sampled * m_c.transpose(0, 1, 3, 2)[..., None].astype(sampled.dtype)
        return jnp.einsum(
            "bpkgc,kgco->bpo", sampled, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    if P <= pixels_per_chunk:
        out = compute(py, px, m)
    else:
        chunk = pixels_per_chunk
        n_chunks = -(-P // chunk)
        pad = n_chunks * chunk - P

        def to_chunks(a):
            a = jnp.pad(a, [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2))
            a = a.reshape((B, n_chunks, chunk) + a.shape[2:])
            return jnp.moveaxis(a, 1, 0)  # [n_chunks, B, chunk, ...]

        outs = jax.lax.map(
            lambda args: compute(*args), (to_chunks(py), to_chunks(px), to_chunks(m))
        )  # [n_chunks, B, chunk, O]
        out = jnp.moveaxis(outs, 0, 1).reshape(B, n_chunks * chunk, O)[:, :P]

    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, O)


@functools.partial(jax.jit, static_argnames=("max_offset",))
def modulated_deform_conv_chain(x, offset, mask, weight, bias=None, max_offset=2):
    """Clamped-offset DCNv2 as a dense static select-chain — gather-free and
    fully differentiable by XLA autodiff (the training-path formulation).

    For offsets clamped to [-R, R], tap k=(i,j)'s bilinear sample at output
    pixel p has support only on the (2R+1)^2 integer shifts around (i-1, j-1)
    — so the im2col gather (catastrophic on this backend, PERF_NOTES.md)
    becomes 25 static shifted slices weighted by hat functions
    relu(1-|d - s|), exactly the formulation of the Pallas forward kernel
    (ops/dcn_pallas.py) but in XLA, where the *transpose* of a shifted slice
    is a shifted pad — i.e. the backward (the CUDA ext's col2im/col2im_coord,
    deform_conv_cuda_kernel.cu:245-420) is scatter-free and dense too. No
    [*, G, Cg=32] lane-padded temps: everything stays [B, H, W, C].

    3x3, stride 1, dilation 1 (the GLARE hot path: DCNv2Pack
    deformable_groups=4, deformableDecoder_arch.py:283). Boundary semantics
    match the CUDA kernel (zero outside, partial hats at borders) for every
    position reachable with |offset| <= R.
    """
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert (kh, kw) == (3, 3) and wc == C, (weight.shape, x.shape)
    G, K = offset.shape[3], offset.shape[4]
    assert K == 9 and C % G == 0
    Cg = C // G
    R = int(max_offset)

    off = jnp.clip(offset.astype(jnp.float32), -R, R)
    m = mask.astype(jnp.float32)
    pad = R + 1
    xg = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)]).reshape(
        B, H + 2 * pad, W + 2 * pad, G, Cg
    )
    w_taps = weight.reshape(9, C, O)

    out = None
    for i in range(3):
        for j in range(3):
            k = i * 3 + j
            dy = off[..., k, 0]  # [B, H, W, G]
            dx = off[..., k, 1]
            mk = m[..., k]
            wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy)) * mk
                   for sy in range(-R, R + 1)]
            wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
                   for sx in range(-R, R + 1)]
            acc = jnp.zeros((B, H, W, G, Cg), x.dtype)
            for si, sy in enumerate(range(-R, R + 1)):
                r0 = pad + (i - 1) + sy
                for sj, sx in enumerate(range(-R, R + 1)):
                    c0 = pad + (j - 1) + sx
                    w2 = (wys[si] * wxs[sj])[..., None].astype(x.dtype)
                    acc = acc + xg[:, r0:r0 + H, c0:c0 + W] * w2
            t = jnp.einsum(
                "bhwc,co->bhwo", acc.reshape(B, H, W, C), w_taps[k],
                preferred_element_type=jnp.float32,
            )
            out = t if out is None else out + t
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def _bilinear_gather_rows(xf, base_row, py, px, H, W):
    """Row-compacted variant of :func:`_bilinear_gather` for the hybrid op.

    xf:       [N, G, Cg]  input flattened over (batch, H, W)
    base_row: [S]         per-slot row offset (= b * H * W)
    py, px:   [S, G, K]   fractional sample positions
    returns:  [S, K, G, Cg]
    """
    S, G, K = py.shape
    N, _, Cg = xf.shape

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0
    wx1 = px - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1
    in_range = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    # one flat row-major take (see _bilinear_gather for the rationale)
    xf2 = jnp.moveaxis(xf, 1, 0).reshape(G * N, Cg)
    g_base = jnp.arange(G, dtype=jnp.int32)[None, :, None] * N  # [1, G, 1]

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W) & in_range
        lin = jnp.clip(yi, 0, H - 1).astype(jnp.int32) * W + jnp.clip(
            xi, 0, W - 1
        ).astype(jnp.int32)
        idx = g_base + base_row[:, None, None] + lin  # [S, G, K]
        vals = jnp.take(xf2, idx.reshape(-1), axis=0)  # [S*G*K, Cg]
        w = (wgt * valid.astype(wgt.dtype)).reshape(-1)
        return vals * w[:, None].astype(vals.dtype)

    out = corner(y0, x0, wy0 * wx0)
    out = out + corner(y0, x0 + 1, wy0 * wx1)
    out = out + corner(y0 + 1, x0, wy1 * wx0)
    out = out + corner(y0 + 1, x0 + 1, wy1 * wx1)
    # [S, G, K, Cg] -> [S, K, G, Cg]
    return out.reshape(S, G, K, Cg).transpose(0, 2, 1, 3)


@functools.partial(
    jax.jit,
    static_argnames=("max_offset", "capacity_frac", "base", "pixels_per_chunk"),
)
def modulated_deform_conv_hybrid(
    x, offset, mask, weight, bias=None, max_offset=2, capacity_frac=0.125,
    base="chain", pixels_per_chunk=16384,
):
    """Exact-semantics DCNv2 at near-clamped-path speed (inference).

    The measured offset histograms (OFFSET_HIST_r03.json) show out-of-band
    taps are a small *tail* (2.5% beyond 4 px on the audited checkpoint) —
    so instead of paying the exact gather path's cost at every pixel
    (~560 ms/img, PERF_NOTES.md), split per OUTPUT PIXEL:

      * pixels whose 36 taps all fall inside [-R, R] go through the fast
        clamped path (`base`: the Pallas band kernel on TPU or the dense
        select-chain), where clamped == exact by construction;
      * pixels with >=1 out-of-band tap are compacted into a fixed-capacity
        buffer (static shape: `capacity_frac` of all pixels, lane-rounded),
        computed with the exact CUDA-semantics gather path
        (deform_conv_cuda_kernel.cu:261-330 math), and scattered back.

    Exactness holds whenever the out-of-band pixel fraction is <= the
    capacity; overflow pixels degrade gracefully to the clamped value (they
    keep their base-path output). Pick `capacity_frac` from a measured
    histogram (tools/offset_histogram.py) — 0.125 is ~5x the audited tail.

    3x3, stride 1, pad 1 (the GLARE hot path). Differentiable end to end
    (gather/scatter/cumsum all have JVP/VJPs), but the chain op remains the
    training default — this op's value is exact *inference* for weights
    whose offsets exceed the clamp.
    """
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert (kh, kw) == (3, 3) and wc == C, (weight.shape, x.shape)
    G, K = offset.shape[3], offset.shape[4]
    assert K == 9 and C % G == 0
    Cg = C // G
    R = int(max_offset)
    P = H * W
    BP = B * P

    off = offset.astype(jnp.float32)
    oob_tap = (jnp.abs(off[..., 0]) > R) | (jnp.abs(off[..., 1]) > R)
    pix_oob = jnp.any(oob_tap, axis=(3, 4)).reshape(BP)  # [BP]

    # fixed-capacity compaction: slot s holds the s-th out-of-band pixel
    S = min(BP, max(128, -(-int(BP * capacity_frac) // 128) * 128))
    pos = jnp.cumsum(pix_oob.astype(jnp.int32)) - 1
    selected = pix_oob & (pos < S)
    slot = jnp.where(selected, pos, S)
    idx = (
        jnp.full((S,), BP, jnp.int32)
        .at[slot]
        .set(jnp.arange(BP, dtype=jnp.int32), mode="drop")
    )  # unfilled slots stay BP -> dropped at the write-back scatter

    # fast clamped path with selected pixels' taps zeroed (bias added last)
    sel_hw = selected.reshape(B, H, W, 1, 1)
    mask_base = mask * (1.0 - sel_hw).astype(mask.dtype)
    if base == "pallas":
        from .dcn_pallas import modulated_deform_conv_pallas

        out = modulated_deform_conv_pallas(
            x, offset, mask_base, weight, None, max_offset=R
        )
    else:
        out = modulated_deform_conv_chain(
            x, offset, mask_base, weight, None, max_offset=R
        )

    # exact gather path over the compacted pixels
    hh = jnp.arange(H, dtype=jnp.float32) - 1.0
    ww = jnp.arange(W, dtype=jnp.float32) - 1.0
    ky, kx = jnp.meshgrid(
        jnp.arange(3, dtype=jnp.float32), jnp.arange(3, dtype=jnp.float32),
        indexing="ij",
    )
    base_y = (hh[:, None, None] + ky.reshape(K)) + jnp.zeros((1, W, 1))
    base_x = (ww[None, :, None] + kx.reshape(K)) + jnp.zeros((H, 1, 1))
    py = (base_y.reshape(1, P, 1, K) + off.reshape(B, P, G, K, 2)[..., 0]).reshape(
        BP, G, K
    )
    px = (base_x.reshape(1, P, 1, K) + off.reshape(B, P, G, K, 2)[..., 1]).reshape(
        BP, G, K
    )
    m_flat = mask.astype(jnp.float32).reshape(BP, G, K)

    safe = jnp.minimum(idx, BP - 1)
    py_s = jnp.take(py, safe, axis=0)
    px_s = jnp.take(px, safe, axis=0)
    m_s = jnp.take(m_flat, safe, axis=0)
    base_row = (safe // P) * P

    xf = x.reshape(BP, G, Cg)
    w = weight.reshape(K, G, Cg, O).astype(x.dtype)

    def compute(args):
        row_c, py_c, px_c, m_c = args
        sampled = _bilinear_gather_rows(xf, row_c, py_c, px_c, H, W)  # [s,K,G,Cg]
        sampled = sampled * m_c.transpose(0, 2, 1)[..., None].astype(sampled.dtype)
        return jnp.einsum(
            "skgc,kgco->so", sampled, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    chunk = min(pixels_per_chunk, S)
    n_chunks = -(-S // chunk)
    pad = n_chunks * chunk - S

    def to_chunks(a):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    if n_chunks == 1:
        vals = compute((base_row, py_s, px_s, m_s))
    else:
        vals = jax.lax.map(
            compute, (to_chunks(base_row), to_chunks(py_s), to_chunks(px_s),
                      to_chunks(m_s))
        ).reshape(n_chunks * chunk, O)[:S]

    out = out.reshape(BP, O).at[idx].set(vals, mode="drop").reshape(B, H, W, O)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def deform_conv(x, offset, weight, bias=None, stride=1, padding=1, dilation=1):
    """DCNv1 (no modulation): mask == 1 everywhere
    (reference: deform_conv_cuda.cpp:152 deform_conv_forward_cuda)."""
    B, H, W, _ = x.shape
    G, K = offset.shape[3], offset.shape[4]
    mask = jnp.ones((B, H, W, G, K), x.dtype)
    return modulated_deform_conv(
        x, offset, mask, weight, bias, stride=stride, padding=padding, dilation=dilation
    )


def modulated_deform_conv_naive(x, offset, mask, weight, bias=None, padding=1):
    """O(everything) numpy-style oracle for tests: direct per-pixel loops.
    Mirrors the CUDA kernel math literally. Small inputs only."""
    import numpy as np

    x = np.asarray(x, np.float64)
    offset = np.asarray(offset, np.float64)
    mask = np.asarray(mask, np.float64)
    weight = np.asarray(weight, np.float64)
    B, H, W, C = x.shape
    kh, kw, _, O = weight.shape
    G = offset.shape[3]
    Cg = C // G
    out = np.zeros((B, H, W, O))

    def sample(b, py, px, c):
        if py <= -1 or py >= H or px <= -1 or px >= W:
            return 0.0
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        v = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    wy = 1 - abs(py - yy)
                    wx = 1 - abs(px - xx)
                    v += wy * wx * x[b, yy, xx, c]
        return v

    for b in range(B):
        for h in range(H):
            for w_ in range(W):
                for o in range(O):
                    acc = 0.0
                    for i in range(kh):
                        for j in range(kw):
                            k = i * kw + j
                            for c in range(C):
                                g = c // Cg
                                py = h - padding + i + offset[b, h, w_, g, k, 0]
                                px = w_ - padding + j + offset[b, h, w_, g, k, 1]
                                acc += (
                                    sample(b, py, px, c)
                                    * mask[b, h, w_, g, k]
                                    * weight[i, j, c, o]
                                )
                    out[b, h, w_, o] = acc
    if bias is not None:
        out = out + np.asarray(bias, np.float64)
    return out
