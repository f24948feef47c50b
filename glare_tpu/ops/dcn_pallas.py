"""Pallas TPU kernel for modulated deformable convolution (DCNv2).

Replaces the XLA gather formulation in ops/dcn.py for the GLARE hot path
(3x3, stride 1, pad 1, deformable_groups=4) — XLA's gather lowering on this
backend runs at ~100 MB/s (PERF_NOTES.md), while in-kernel
`tpu.dynamic_gather` moves VMEM data at VPU-class speed.

Design (one grid step = one output row x one 128-px column segment):
  * x is zero-padded by (R+2) and pre-transposed to [B, C, Hp, Wp] once in
    XLA, so the kernel band DMA lands channels-on-sublanes with no in-kernel
    transpose. Zero padding reproduces the CUDA boundary semantics exactly
    (partial bilinear weights at borders, zero outside) for offsets clamped
    to [-R, R].
  * per (tap k, group g, corner): the sample row is resolved by a masked
    select over the (2R+5)-row band; the sample column by a lane-dim
    `take_along_axis` within two 128-lane windows.
  * per (k, g): the [Cg, 128px] samples contract with the [Cg, O] weight
    slice on the MXU, accumulating [128px, O].

Offsets are CLAMPED to [-R, R] (max_offset). GLARE's learned offsets are
small (the reference warns when mean |offset| > 50 but trained values are
~1-2 px); the exact unbounded op remains available via ops.dcn.

f32 only in-kernel (dynamic_gather requires index/value bitwidth match).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(py_ref, px_ref, m_ref, w_ref, xt_ref, out_ref, band, samp, acc,
            shifts_all, w2_all, sem, *, R, G, K, Cg, O, band_rows, band_alloc,
            seg):
    b = pl.program_id(0)
    r = pl.program_id(1)
    s = pl.program_id(2)

    C = G * Cg
    GK = G * K
    nsh = 2 * R + 3
    cols = 2 * seg
    # band layout [band_alloc rows, C, 2*seg]: the row axis is untiled, so a
    # fori_loop can index it dynamically. DMA start must be 8-aligned: start
    # at the aligned row below r and carry the residue r_off.
    r0 = (r // 8) * 8
    r_off = (r - r0).astype(jnp.int32)
    dma = pltpu.make_async_copy(
        xt_ref.at[b, pl.ds(r0, band_alloc), :, pl.ds(s * seg, cols)],
        band,
        sem,
    )
    dma.start()

    base = jax.lax.broadcasted_iota(jnp.int32, (GK, seg), 1).astype(jnp.float32)
    px = px_ref[0:GK, :]
    py = py_ref[0:GK, :]
    mm = m_ref[0:GK, :]
    # hoist the bilinear weight surface: it does not depend on the band
    # contents, so compute it once per grid step instead of per (tap, group,
    # row) as full-width [GK, seg] VPU ops rather than [1, seg] slices.
    # pass 1: column hats, replicated across the used rows of w2_all (rows
    # 0 and 2R+4 carry provably-zero row hats — see mat_body)
    for i in range(nsh):
        w_col = jnp.maximum(0.0, 1.0 - jnp.abs(px - base - (i + 1)))
        for dr2 in range(1, 2 * R + 4):
            w2_all[dr2 * nsh + i] = w_col
    # pass 2: fold row hat x modulation mask in place (mask is linear in the
    # bilinear sum, so folding here saves the per-(k,g) post-multiply)
    for dr2 in range(1, 2 * R + 4):
        w_row = jnp.maximum(0.0, 1.0 - jnp.abs(py - float(dr2))) * mm
        for i in range(nsh):
            w2_all[dr2 * nsh + i] = w2_all[dr2 * nsh + i] * w_row

    dma.wait()

    # hoist the shifted band rows: an unaligned lane slice read inside the
    # accumulation loop costs ~40x (lane rotation per use, PERF_NOTES.md);
    # materialize each (row, shift) copy exactly once. Sample rows are
    # provably within [1, 2R+3] (py = ky + P0 + clip(d) with ky in [-1,1],
    # P0 = R+2), so band rows 0 and 2R+4 are never touched — skip them.
    def mat_body(dr2, _):
        row = band[dr2 + r_off]  # [C, 2*seg]; dynamic untiled index: cheap
        for i in range(nsh):
            shifts_all[dr2 * nsh + i] = row[:, i + 1:i + 1 + seg]
        return 0

    jax.lax.fori_loop(1, 2 * R + 4, mat_body, 0)

    # accumulate per (group, tap): a register-carried [Cg, seg] across the
    # statically-valid bilinear support only. For tap (ky, kx) the row hat
    # is non-zero solely for dr2 in [ky+P0-R, ky+P0+R] and the column hat
    # solely for shift i in [kx+P0-R-1, kx+P0+R-1] — (2R+1)^2 cells, not
    # band_rows*nsh: a 2.5x cut of the dominant VPU loop at R=2.
    span = 2 * R + 1
    ky_all = [-1, -1, -1, 0, 0, 0, 1, 1, 1]
    kx_all = [-1, 0, 1, -1, 0, 1, -1, 0, 1]
    P0 = R + 2
    for g in range(G):
        for k in range(K):
            gk = g * K + k
            row0 = ky_all[k] + P0 - R
            sh0 = kx_all[k] + P0 - R - 1
            acc_kg = None
            for jr in range(span):
                for js in range(span):
                    idx = (row0 + jr) * nsh + sh0 + js  # static
                    term = (
                        shifts_all[idx, g * Cg:(g + 1) * Cg, :]
                        * w2_all[idx, gk:gk + 1, :]
                    )
                    acc_kg = term if acc_kg is None else acc_kg + term
            samp[gk * Cg:(gk + 1) * Cg, :] = acc_kg

    # one MXU contraction over all taps/groups: [KG*Cg, seg]^T @ [KG*Cg, O]
    acc[...] = jax.lax.dot_general(
        samp[...], w_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0, 0, 0] = acc[...]


@functools.partial(jax.jit, static_argnames=("max_offset", "interpret"))
def modulated_deform_conv_pallas(x, offset, mask, weight, bias=None,
                                 max_offset=2, interpret=False):
    """DCNv2 with clamped offsets, Pallas kernel. Layouts as ops.dcn:
    x [B,H,W,C], offset [B,H,W,G,K,2], mask [B,H,W,G,K], weight HWIO.
    3x3, stride 1, pad 1 only."""
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert (kh, kw) == (3, 3) and wc == C
    G, K = offset.shape[3], offset.shape[4]
    assert K == 9 and C % G == 0
    Cg = C // G
    R = int(max_offset)
    P0 = R + 2
    band_rows = 2 * R + 5
    band_alloc = -(-(band_rows + 7) // 8) * 8
    seg = 128
    n_seg = -(-W // seg)
    Wp_out = n_seg * seg

    # pad + transpose once in XLA: [B, C, H + 2P0, Wp_out + 2P0]
    # right-pad so every segment's 2*seg-wide band DMA stays in bounds
    right_pad = (Wp_out + seg) - W - P0
    bottom_pad = P0 + (band_alloc - band_rows) + 8
    xp = jnp.pad(
        x.astype(jnp.float32),
        [(0, 0), (P0, bottom_pad), (P0, right_pad), (0, 0)],
    )
    xt = jnp.transpose(xp, (0, 1, 3, 2))  # [B, Hp, C, Wp]

    # band-local sample positions per (g, k): local = t + clip(d, -R, R) + P0
    ky, kx = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij")
    ky = jnp.asarray(ky.reshape(K), jnp.float32)
    kx = jnp.asarray(kx.reshape(K), jnp.float32)
    off = jnp.clip(offset.astype(jnp.float32), -max_offset, max_offset)
    # [B, H, W, G, K] -> band-local float positions
    pyl = ky[None, None, None, None, :] + off[..., 0] + P0
    # px is segment-local: col p within segment + tx + dx + P0, folded into
    # the per-pixel base by the kernel's col iota? -> precompute relative to
    # segment start instead: local col = (p % seg) + tx + dx + P0
    col_in_seg = jnp.arange(W, dtype=jnp.float32) % seg
    pxl = (
        col_in_seg[None, None, :, None, None]
        + kx[None, None, None, None, :]
        + off[..., 1]
        + P0
    )
    mk = mask.astype(jnp.float32)

    def arrange(a):
        # [B, H, W, G, K] -> [B, H, n_seg, 48, seg] (g*K+k on sublanes)
        a = jnp.pad(a, [(0, 0), (0, 0), (0, Wp_out - W), (0, 0), (0, 0)])
        a = a.reshape(B, H, n_seg, seg, G * K)
        a = jnp.transpose(a, (0, 1, 2, 4, 3))
        pad_rows = 48 - G * K
        return jnp.pad(a, [(0, 0)] * 3 + [(0, pad_rows), (0, 0)])

    PY = arrange(pyl)
    PX = arrange(pxl)
    MK = arrange(mk)
    Wk = jnp.transpose(
        weight.astype(jnp.float32).reshape(9, G, Cg, O), (1, 0, 2, 3)
    ).reshape(G * K * Cg, O)

    grid = (B, H, n_seg)
    n_h, n_s = H, n_seg
    out = pl.pallas_call(
        functools.partial(
            _kernel, R=R, G=G, K=K, Cg=Cg, O=O, band_rows=band_rows,
            band_alloc=band_alloc, seg=seg
        ),
        grid=grid,
        in_specs=[
            # 2-D blocks: reading rows of >2-D block refs is dramatically
            # slower in Mosaic (PERF_NOTES.md)
            pl.BlockSpec((48, seg), lambda b, r, s: ((b * n_h + r) * n_s + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, seg), lambda b, r, s: ((b * n_h + r) * n_s + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, seg), lambda b, r, s: ((b * n_h + r) * n_s + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.ANY),   # xt stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, 1, seg, O), lambda b, r, s: (b, r, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, n_seg, seg, O), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((band_alloc, C, 2 * seg), jnp.float32),
            pltpu.VMEM((G * 9 * Cg, seg), jnp.float32),
            pltpu.VMEM((seg, O), jnp.float32),
            pltpu.VMEM((band_rows * (2 * R + 3), C, seg), jnp.float32),
            pltpu.VMEM((band_rows * (2 * R + 3), G * K, seg), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        PY.reshape(B * H * n_seg * 48, seg),
        PX.reshape(B * H * n_seg * 48, seg),
        MK.reshape(B * H * n_seg * 48, seg),
        Wk,
        xt,
    )

    out = out.reshape(B, H, n_seg * seg, O)[:, :, :W, :]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
