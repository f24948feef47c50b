"""Pallas TPU kernel for modulated deformable convolution (DCNv2).

Replaces the XLA gather formulation in ops/dcn.py for the GLARE hot path
(3x3, stride 1, pad 1, deformable_groups=4, reference
deform_conv_cuda_kernel.cu:261-330 semantics) — XLA's gather lowering on
this backend runs at ~100 MB/s (PERF_NOTES.md), while a static select-chain
over a DMA'd row band moves at VPU-class speed.

Design (one grid step = `rows_per_step` output rows x one 128-px column
segment):
  * x is zero-padded by (R+2) and pre-transposed to [B, Hp, C, Wp] once in
    XLA, so the kernel band DMA lands channels-on-sublanes with no
    in-kernel transpose. Zero padding reproduces the CUDA boundary
    semantics exactly (partial bilinear weights at borders, zero outside)
    for offsets clamped to [-R, R].
  * one band DMA serves all rows_per_step output rows (consecutive rows
    share all but one band row); each (band row, lane shift) slice is
    materialized into VMEM scratch exactly once per step.
  * the band is double-buffered: each grid step prefetches the NEXT
    step's band into the other slot before computing, so the DMA rides
    under the select-chain instead of serializing ahead of it.
  * the bilinear hat surface (row hat x col hat x modulation mask) is
    built per output row as full-width [GK, seg] VPU ops.
  * per (group g, tap k): the row/column hats are non-zero only on a
    statically-known (2R+1)^2 cell window around (ky, kx), so the sample
    accumulation unrolls 25 static-index multiply-adds (R=2) into a
    register-carried [Cg, seg] — no dynamic scratch addressing, no RMW.
  * one MXU contraction per row over all taps/groups:
    [KG*Cg, seg]^T @ [KG*Cg, O].

Offsets are CLAMPED to [-R, R] (max_offset). GLARE's learned offsets are
small (the reference warns when mean |offset| > 50 but trained values are
~1-2 px); the exact unbounded op remains available via ops.dcn.

Accumulation is f32 in-kernel (MXU f32, HIGHEST). bf16 inputs keep a
bf16 band through pad/transpose + DMA (halved traffic — there are no
gathers left, so no bitwidth-match constraint) and are cast to f32 at
shift materialization; all other dtypes take the f32 band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KY = [-1, -1, -1, 0, 0, 0, 1, 1, 1]
_KX = [-1, 0, 1, -1, 0, 1, -1, 0, 1]


def _kernel_core(b, rblk, s, step, total, nxt_bundle,
                 py_ref, px_ref, m_ref, w_ref, xt_ref, out_ref, band, samp,
                 acc, shifts_all, w2_all, sem, *, R, G, K, Cg, O, band_alloc,
                 seg, rpb, n_seg, dot_bf16, tap_radii=None):
    """Shared body for the full-grid and selected-blocks entries: computes
    the DCN output for `rpb` output rows x one `seg` column segment of
    image `b`, row block `rblk`. `nxt_bundle` = (b, rblk, s, valid) of the
    NEXT grid step for the band prefetch."""
    C = G * Cg
    GK = G * K
    nsh = 2 * R + 3
    cols = 2 * seg
    P0 = R + 2
    span = 2 * R + 1
    # band layout [2*band_alloc rows, C, 2*seg], two slots double-buffered:
    # the DMA for grid step i+1 is started during step i's compute, so band
    # traffic overlaps the select-chain instead of serializing ahead of it.
    # The row axis is untiled, so a fori_loop can index it dynamically.
    # DMA start must be 8-aligned: start at the aligned row below the
    # block's first output row and carry the residue r_off (uniform across
    # the block's rows).
    slot = jax.lax.rem(step, 2)
    r = rblk * rpb
    r0 = (r // 8) * 8
    r_off = (r - r0).astype(jnp.int32)

    def band_dma(slot_static, b_, rblk_, s_):
        r0_ = ((rblk_ * rpb) // 8) * 8
        return pltpu.make_async_copy(
            xt_ref.at[b_, pl.ds(r0_, band_alloc), :, pl.ds(s_ * seg, cols)],
            band.at[pl.ds(slot_static * band_alloc, band_alloc)],
            sem.at[slot_static],
        )

    # first step primes its own slot
    @pl.when(step == 0)
    def _():
        band_dma(0, b, rblk, s).start()

    # prefetch the next step's band into the other slot
    b_n, rblk_n, s_n, nxt_valid = nxt_bundle
    for cur in (0, 1):
        @pl.when(jnp.logical_and(slot == cur, nxt_valid))
        def _():
            band_dma(1 - cur, b_n, rblk_n, s_n).start()

    base = jax.lax.broadcasted_iota(jnp.int32, (GK, seg), 1).astype(jnp.float32)

    # wait on this step's slot (descriptor reconstructed with identical
    # src/dst/sem — started by the previous step, or just above for step 0)
    for cur in (0, 1):
        @pl.when(slot == cur)
        def _():
            band_dma(cur, b, rblk, s).wait()
    slot_base = slot * band_alloc

    # hoist the shifted band rows: an unaligned lane slice read inside the
    # accumulation loop costs ~40x (lane rotation per use, PERF_NOTES.md);
    # materialize each (row, shift) copy exactly once per step. Sample rows
    # for output row r+ri are provably within [ri+1, ri+2R+3] (py = ky + P0
    # + clip(d) with ky in [-1,1], P0 = R+2), so the union over the block
    # is [1, 2R+3+rpb-1].
    def mat_body(dr2, _):
        # [C, 2*seg]; dynamic untiled index: cheap. The band may be bf16
        # (halved DMA) — cast once here so shifts/accumulation stay f32.
        row = band[slot_base + dr2 + r_off].astype(jnp.float32)
        for i in range(nsh):
            shifts_all[dr2 * nsh + i] = row[:, i + 1:i + 1 + seg]
        return 0

    jax.lax.fori_loop(1, 2 * R + 3 + rpb, mat_body, 0)

    for ri in range(rpb):
        # blocks stack rpb rows of 48 padded sublanes (GK <= 48) each
        px = px_ref[ri * 48:ri * 48 + GK, :]
        py = py_ref[ri * 48:ri * 48 + GK, :]
        mm = m_ref[ri * 48:ri * 48 + GK, :]
        # bilinear weight surface for this output row: row hat x col hat x
        # mask as full-width [GK, seg] VPU ops (row indices here are
        # row-local: dr in [1, 2R+3]).
        for i in range(nsh):
            w_col = jnp.maximum(0.0, 1.0 - jnp.abs(px - base - (i + 1)))
            for dr in range(1, 2 * R + 4):
                w2_all[dr * nsh + i] = w_col
        for dr in range(1, 2 * R + 4):
            w_row = jnp.maximum(0.0, 1.0 - jnp.abs(py - float(dr))) * mm
            for i in range(nsh):
                w2_all[dr * nsh + i] = w2_all[dr * nsh + i] * w_row

        # accumulate per (group, tap) over the statically-valid support:
        # row hat non-zero only for dr in [ky+P0-Rgk, ky+P0+Rgk], col hat
        # only for shifts i in [kx+P0-Rgk-1, kx+P0+Rgk-1] — (2Rgk+1)^2
        # static cells. tap_radii (per-(g,k) audited maxima, e.g.
        # OFFSET_HIST_r05 per_gk) shrinks each tap's unroll independently:
        # warp_0's measured radii cut the cell count 10404 -> ~4500 vs a
        # uniform R=8 at identical (per-tap-clamped) semantics.
        for g in range(G):
            for k in range(K):
                gk = g * K + k
                R_gk = R if tap_radii is None else int(tap_radii[g][k])
                span_gk = 2 * R_gk + 1
                row0 = _KY[k] + P0 - R_gk
                sh0 = _KX[k] + P0 - R_gk - 1
                acc_kg = None
                for jr in range(span_gk):
                    for js in range(span_gk):
                        w2_idx = (row0 + jr) * nsh + sh0 + js       # row-local
                        sh_idx = (ri + row0 + jr) * nsh + sh0 + js  # block-local
                        term = (
                            shifts_all[sh_idx, g * Cg:(g + 1) * Cg, :]
                            * w2_all[w2_idx, gk:gk + 1, :]
                        )
                        acc_kg = term if acc_kg is None else acc_kg + term
                samp[gk * Cg:(gk + 1) * Cg, :] = acc_kg

        # one MXU contraction over all taps/groups. For bf16 networks the
        # operands are rounded to bf16 (f32 accumulation) — one MXU pass
        # instead of HIGHEST's six, and no more precision than the
        # surrounding bf16 convs carry anyway.
        if dot_bf16:
            acc[...] = jax.lax.dot_general(
                samp[...].astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc[...] = jax.lax.dot_general(
                samp[...], w_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[0, ri] = acc[...].astype(out_ref.dtype)


def _kernel(py_ref, px_ref, m_ref, w_ref, xt_ref, out_ref, band, samp, acc,
            shifts_all, w2_all, sem, *, R, G, K, Cg, O, band_alloc, seg, rpb,
            n_rblk, n_seg, n_b, dot_bf16, tap_radii=None):
    """Full-grid entry: every (b, rblk, s) block is computed."""
    b = pl.program_id(0)
    rblk = pl.program_id(1)
    s = pl.program_id(2)
    total = n_b * n_rblk * n_seg
    step = (b * n_rblk + rblk) * n_seg + s
    nxt = step + 1
    nxt_bundle = (
        nxt // (n_seg * n_rblk),
        jax.lax.rem(nxt // n_seg, n_rblk),
        jax.lax.rem(nxt, n_seg),
        nxt < total,
    )
    _kernel_core(b, rblk, s, step, total, nxt_bundle,
                 py_ref, px_ref, m_ref, w_ref, xt_ref, out_ref, band, samp,
                 acc, shifts_all, w2_all, sem, R=R, G=G, K=K, Cg=Cg, O=O,
                 band_alloc=band_alloc, seg=seg, rpb=rpb, n_seg=n_seg,
                 dot_bf16=dot_bf16, tap_radii=tap_radii)


def _kernel_selected(ids_ref, py_ref, px_ref, m_ref, w_ref, xt_ref, base_ref,
                     out_ref, band, samp, acc, shifts_all, w2_all, sem, *,
                     R, G, K, Cg, O, band_alloc, seg, rpb, n_rblk, n_seg,
                     n_sel, dot_bf16):
    """Selected-blocks entry (the hybrid tail): grid is (n_sel, n_seg) and
    ids_ref (scalar-prefetched) maps each selected slot to its flat
    (b * n_rblk + rblk) home. Unfilled slots carry the sacrificial block id
    (the padded last row-block of image 0, cropped by the caller); the
    output buffer is ALIASED to the base pass's, so unselected blocks keep
    their base values.

    `base_ref` is the aliased input ref (unused in-kernel; the alias makes
    the out buffer start as the base output)."""
    del base_ref
    sel = pl.program_id(0)
    s = pl.program_id(1)
    flat = ids_ref[sel]
    b = flat // n_rblk
    rblk = jax.lax.rem(flat, n_rblk)
    total = n_sel * n_seg
    step = sel * n_seg + s
    nxt = step + 1
    sel_n = jnp.minimum(nxt // n_seg, n_sel - 1)
    flat_n = ids_ref[sel_n]
    nxt_bundle = (
        flat_n // n_rblk,
        jax.lax.rem(flat_n, n_rblk),
        jax.lax.rem(nxt, n_seg),
        nxt < total,
    )
    _kernel_core(b, rblk, s, step, total, nxt_bundle,
                 py_ref, px_ref, m_ref, w_ref, xt_ref, out_ref, band, samp,
                 acc, shifts_all, w2_all, sem, R=R, G=G, K=K, Cg=Cg, O=O,
                 band_alloc=band_alloc, seg=seg, rpb=rpb, n_seg=n_seg,
                 dot_bf16=dot_bf16)


def _prep(x, offset, mask, weight, R, rpb, extra_block=False,
          tap_radii=None):
    """Shared host-side prep: pad+transpose the input band source, build
    band-local sample positions, arrange them into kernel blocks.

    extra_block appends one sacrificial row block per image (zero
    positions/masks) — the selected-blocks entry parks unfilled capacity
    slots on image 0's sacrificial block, which the caller crops away.
    """
    B, H, W, C = x.shape
    O = weight.shape[3]
    G, K = offset.shape[3], offset.shape[4]
    Cg = C // G
    P0 = R + 2
    # union of sample rows for a block: [1, 2R+3+rpb-1], plus the residue
    # r_off <= 7 from 8-aligning the DMA start
    band_alloc = -(-(2 * R + 3 + rpb - 1 + 7 + 1) // 8) * 8
    seg = 128
    n_seg = -(-W // seg)
    Wp_out = n_seg * seg
    H_pad = -(-H // rpb) * rpb + (rpb if extra_block else 0)
    n_rblk = H_pad // rpb

    # pad + transpose once in XLA: [B, Hp, C, Wp]
    # right-pad so every segment's 2*seg-wide band DMA stays in bounds;
    # bottom-pad so the last block's band DMA stays in bounds
    right_pad = (Wp_out + seg) - W - P0
    last_r0 = ((H_pad - rpb) // 8) * 8
    bottom_pad = max(last_r0 + band_alloc - H - P0, 0) + 8
    # bf16 inputs stay bf16 through the pad/transpose and the band DMA
    # (halves the formatting traffic and the per-step DMA); the kernel
    # casts rows to f32 at shift materialization, so accumulation precision
    # is unchanged. No gathers remain in this design, so there is no
    # bitwidth-match constraint on the band. Other dtypes go through f32.
    band_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    out_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xp = jnp.pad(
        x.astype(band_dtype),
        [(0, 0), (P0, bottom_pad), (P0, right_pad), (0, 0)],
    )
    xt = jnp.transpose(xp, (0, 1, 3, 2))  # [B, Hp, C, Wp]

    # band-local sample positions per (g, k): local = t + clip(d, -R, R) + P0
    ky = jnp.asarray(np.array(_KY), jnp.float32)
    kx = jnp.asarray(np.array(_KX), jnp.float32)
    if tap_radii is None:
        off = jnp.clip(offset.astype(jnp.float32), -R, R)
    else:
        # per-(g,k) clamp radius, broadcast over [B, H, W, G, K, 2]
        r_gk = jnp.asarray(np.array(tap_radii, np.float32))[
            None, None, None, :, :, None]
        off = jnp.clip(offset.astype(jnp.float32), -r_gk, r_gk)
    # [B, H, W, G, K] -> row-local float positions (row hat evaluated
    # against dr in [1, 2R+3])
    pyl = ky[None, None, None, None, :] + off[..., 0] + P0
    col_in_seg = jnp.arange(W, dtype=jnp.float32) % seg
    pxl = (
        col_in_seg[None, None, :, None, None]
        + kx[None, None, None, None, :]
        + off[..., 1]
        + P0
    )
    mk = mask.astype(jnp.float32)

    def arrange(a):
        # [B, H, W, G, K] -> [B*n_rblk*n_seg, rpb*48, seg] blocks
        # (g*K+k on sublanes; rpb rows stacked per block)
        a = jnp.pad(a, [(0, 0), (0, H_pad - H), (0, Wp_out - W), (0, 0), (0, 0)])
        a = a.reshape(B, H_pad, n_seg, seg, G * K)
        a = jnp.transpose(a, (0, 1, 2, 4, 3))  # [B, H_pad, n_seg, GK, seg]
        pad_rows = 48 - G * K
        a = jnp.pad(a, [(0, 0)] * 3 + [(0, pad_rows), (0, 0)])
        a = a.reshape(B, n_rblk, rpb, n_seg, 48, seg)
        a = jnp.transpose(a, (0, 1, 3, 2, 4, 5))  # [B, n_rblk, n_seg, rpb, 48, seg]
        return a.reshape(B * n_rblk * n_seg * rpb * 48, seg)

    PY = arrange(pyl)
    PX = arrange(pxl)
    MK = arrange(mk)
    Wk = jnp.transpose(
        weight.astype(jnp.float32).reshape(9, G, Cg, O), (1, 0, 2, 3)
    ).reshape(G * K * Cg, O)

    dims = dict(B=B, H=H, W=W, C=C, O=O, G=G, K=K, Cg=Cg,
                band_alloc=band_alloc, seg=seg, n_seg=n_seg, Wp_out=Wp_out,
                H_pad=H_pad, n_rblk=n_rblk, band_dtype=band_dtype,
                out_dtype=out_dtype)
    return PY, PX, MK, Wk, xt, dims


def _scratch_shapes(dims, R, rpb):
    C, G, K, Cg, O = (dims[k] for k in ("C", "G", "K", "Cg", "O"))
    seg, band_alloc, band_dtype = dims["seg"], dims["band_alloc"], dims["band_dtype"]
    return [
        pltpu.VMEM((2 * band_alloc, C, 2 * seg), band_dtype),
        pltpu.VMEM((G * 9 * Cg, seg), jnp.float32),
        pltpu.VMEM((seg, O), jnp.float32),
        pltpu.VMEM(((2 * R + 3 + rpb) * (2 * R + 3), C, seg), jnp.float32),
        pltpu.VMEM(((2 * R + 4) * (2 * R + 3), G * K, seg), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _clamp_rpb(R, rows_per_step):
    rpb = int(rows_per_step)
    if R >= 6:
        # wide radii grow both the band and the (2R+1)^2 select-chain's
        # scratch; rows_per_step=16 blows the 100 MB scoped-VMEM limit at
        # R=8 (measured: 102.55M). rpb=8 compiles and runs (488.9 ms/op
        # isolated at R=8 — the 289-cell chain dominates; see PERF_NOTES).
        rpb = min(rpb, 8)
    return rpb


@functools.partial(jax.jit, static_argnames=("max_offset", "interpret",
                                             "rows_per_step"))
def modulated_deform_conv_pallas(x, offset, mask, weight, bias=None,
                                 max_offset=2, interpret=False,
                                 rows_per_step=16):
    """DCNv2 with clamped offsets, Pallas kernel. Layouts as ops.dcn:
    x [B,H,W,C], offset [B,H,W,G,K,2], mask [B,H,W,G,K], weight HWIO.
    3x3, stride 1, pad 1 only.

    max_offset: int (uniform clamp radius) or a [G][K] nested tuple of
    per-tap radii (from a per-(g,k) offset audit, OFFSET_HIST per_gk).
    Band sizing/VMEM use the max radius, but each tap's select-chain
    unrolls only its own (2R_gk+1)^2 cells — on audited checkpoints whose
    drift is tap-specific this is ~2.3x cheaper than the uniform wide
    radius at identical semantics (exact for |offset| <= R_gk per tap)."""
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert (kh, kw) == (3, 3) and wc == C
    G, K = offset.shape[3], offset.shape[4]
    assert K == 9 and C % G == 0
    if isinstance(max_offset, (tuple, list)):
        tap_radii = tuple(tuple(int(r) for r in row) for row in max_offset)
        assert len(tap_radii) == G and all(len(r) == K for r in tap_radii)
        R = max(max(row) for row in tap_radii)
    else:
        tap_radii = None
        R = int(max_offset)
    rpb = _clamp_rpb(R, rows_per_step)
    PY, PX, MK, Wk, xt, d = _prep(x, offset, mask, weight, R, rpb,
                                  tap_radii=tap_radii)
    n_rblk, n_seg, Cg = d["n_rblk"], d["n_seg"], d["Cg"]

    grid = (B, n_rblk, n_seg)
    out = pl.pallas_call(
        functools.partial(
            _kernel, R=R, G=G, K=K, Cg=Cg, O=O,
            band_alloc=d["band_alloc"], seg=d["seg"], rpb=rpb,
            n_rblk=n_rblk, n_seg=n_seg, n_b=B,
            dot_bf16=(d["band_dtype"] == jnp.bfloat16),
            tap_radii=tap_radii,
        ),
        grid=grid,
        in_specs=[
            # 2-D blocks: reading rows of >2-D block refs is dramatically
            # slower in Mosaic (PERF_NOTES.md)
            pl.BlockSpec((rpb * 48, d["seg"]),
                         lambda b, r, s: ((b * n_rblk + r) * n_seg + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb * 48, d["seg"]),
                         lambda b, r, s: ((b * n_rblk + r) * n_seg + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb * 48, d["seg"]),
                         lambda b, r, s: ((b * n_rblk + r) * n_seg + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.ANY),   # xt stays in HBM
        ],
        # the output block lands directly at its [B, H_pad, W_out, O] home
        # (block (1, rpb, seg, O) at row r*rpb, col s*seg) — no 6-D
        # untranspose afterwards, just the H/W crop. bf16 networks write the
        # output bf16 straight from the kernel (halves the write + the
        # consumer's read; the surrounding graph is bf16 anyway).
        out_specs=pl.BlockSpec((1, rpb, d["seg"], O),
                               lambda b, r, s: (b, r, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d["H_pad"], d["Wp_out"], O),
                                       d["out_dtype"]),
        scratch_shapes=_scratch_shapes(d, R, rpb),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(PY, PX, MK, Wk, xt)

    # crop the rpb/seg padding: [B, H_pad, Wp_out, O] -> [B, H, W, O]
    out = out[:, :H, :W, :]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=(
    "max_offset", "tail_offset", "capacity_frac", "interpret",
    "rows_per_step", "return_overflow"))
def modulated_deform_conv_pallas_cascade(
    x, offset, mask, weight, bias=None, max_offset=2, tail_offset=8,
    capacity_frac=0.125, interpret=False, rows_per_step=16,
    return_overflow=False,
):
    """Two-level cascaded DCNv2: fast clamp-R base pass over the whole
    image + a row-block-compacted WIDE-radius (R_tail) pass that fully
    recomputes only the row blocks containing out-of-band taps.

    Exact DCNv2 (CUDA semantics, deform_conv_cuda_kernel.cu:261-330)
    whenever max |offset| <= tail_offset AND the out-of-band row-block
    fraction <= capacity_frac (measured checkpoints: |offset| p999 = 6.5,
    max = 11.1 — OFFSET_HIST_r03.json; auto_configure_dcn raises
    tail_offset from the loaded checkpoint's audit). Overflow blocks and
    taps beyond R_tail degrade to the clamped value; with
    ``return_overflow=True`` the call also returns an int32 [2] vector
    [n_overflow_blocks, n_taps_beyond_tail] so callers can detect a
    non-exact image and warn or re-dispatch at higher capacity/radius
    (both counts 0 <=> the output is exact DCNv2).

    Unlike ops.dcn.modulated_deform_conv_hybrid (compacted XLA GATHER tail
    — exact unbounded but gather-bound at ~0.7 GB/s on this backend), the
    tail here is the same select-chain band kernel at a wider radius:
    cost = capacity_frac x one R_tail full pass (~7 ms/img at the 620x420
    protocol, vs ~190 ms/img for the gather tail)."""
    B, H, W, C = x.shape
    kh, kw, wc, O = weight.shape
    assert (kh, kw) == (3, 3) and wc == C
    G, K = offset.shape[3], offset.shape[4]
    assert K == 9 and C % G == 0
    R = int(max_offset)
    Rt = int(tail_offset)
    assert Rt > R
    rpb_b = _clamp_rpb(R, rows_per_step)
    rpb_t = _clamp_rpb(Rt, rows_per_step)

    # ---- base pass at R, uncropped (the tail aliases into its buffer) ----
    PY, PX, MK, Wk, xt, d = _prep(x, offset, mask, weight, R, rpb_b)
    n_rblk_b, n_seg = d["n_rblk"], d["n_seg"]
    Cg = d["Cg"]
    base = pl.pallas_call(
        functools.partial(
            _kernel, R=R, G=G, K=K, Cg=Cg, O=O,
            band_alloc=d["band_alloc"], seg=d["seg"], rpb=rpb_b,
            n_rblk=n_rblk_b, n_seg=n_seg, n_b=B,
            dot_bf16=(d["band_dtype"] == jnp.bfloat16),
        ),
        grid=(B, n_rblk_b, n_seg),
        in_specs=[
            pl.BlockSpec((rpb_b * 48, d["seg"]),
                         lambda b, r, s: ((b * n_rblk_b + r) * n_seg + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb_b * 48, d["seg"]),
                         lambda b, r, s: ((b * n_rblk_b + r) * n_seg + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rpb_b * 48, d["seg"]),
                         lambda b, r, s: ((b * n_rblk_b + r) * n_seg + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, rpb_b, d["seg"], O),
                               lambda b, r, s: (b, r, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d["H_pad"], d["Wp_out"], O),
                                       d["out_dtype"]),
        scratch_shapes=_scratch_shapes(d, R, rpb_b),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(PY, PX, MK, Wk, xt)

    # ---- tail pass at R_tail over the selected row blocks ---------------
    PYt, PXt, MKt, Wkt, xtt, dt = _prep(x, offset, mask, weight, Rt, rpb_t,
                                        extra_block=True)
    n_rblk_t = dt["n_rblk"]

    # per-(b, row-block) out-of-band flag; the sacrificial block (last of
    # each image) stays unselected because offsets there are zero-padded
    offa = jnp.abs(offset.astype(jnp.float32))
    oob_row = jnp.any(jnp.max(offa, axis=-1) > R, axis=(2, 3, 4))  # [B, H]
    Ht = n_rblk_t * rpb_t
    oob_blk = jnp.any(
        jnp.pad(oob_row, [(0, 0), (0, Ht - H)]).reshape(B, n_rblk_t, rpb_t),
        axis=2,
    ).reshape(-1)  # [B * n_rblk_t]

    n_blocks = B * n_rblk_t
    sentinel = n_rblk_t - 1  # image 0's sacrificial block (flat id)
    n_sel = max(1, min(n_blocks,
                       -(-int(n_blocks * capacity_frac) // 8) * 8))
    pos = jnp.cumsum(oob_blk.astype(jnp.int32)) - 1
    selected = oob_blk & (pos < n_sel)
    # unselected blocks scatter to the out-of-range slot n_sel+1 so
    # mode='drop' really drops them; ids[n_sel] keeps the sentinel (it is
    # only ever touched by the prefetch reading ids[sel+1] on the last step)
    slot = jnp.where(selected, pos, n_sel + 1)
    ids = (
        jnp.full((n_sel + 1,), sentinel, jnp.int32)
        .at[slot]
        .set(jnp.arange(n_blocks, dtype=jnp.int32), mode="drop")
    )

    # base buffer (H_pad_base rows) re-homed to the tail's padded height
    base_t = base
    if dt["H_pad"] != d["H_pad"]:
        if dt["H_pad"] > d["H_pad"]:
            base_t = jnp.pad(
                base, [(0, 0), (0, dt["H_pad"] - d["H_pad"]), (0, 0), (0, 0)])
        else:
            base_t = base[:, :dt["H_pad"]]

    grid = (n_sel, n_seg)
    out = pl.pallas_call(
        functools.partial(
            _kernel_selected, R=Rt, G=G, K=K, Cg=Cg, O=O,
            band_alloc=dt["band_alloc"], seg=dt["seg"], rpb=rpb_t,
            n_rblk=n_rblk_t, n_seg=n_seg, n_sel=n_sel,
            dot_bf16=(dt["band_dtype"] == jnp.bfloat16),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (rpb_t * 48, dt["seg"]),
                    lambda i, s, ids_ref: (ids_ref[i] * n_seg + s, 0)),
                pl.BlockSpec(
                    (rpb_t * 48, dt["seg"]),
                    lambda i, s, ids_ref: (ids_ref[i] * n_seg + s, 0)),
                pl.BlockSpec(
                    (rpb_t * 48, dt["seg"]),
                    lambda i, s, ids_ref: (ids_ref[i] * n_seg + s, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                # aliased base output: full buffer, ANY (never block-read)
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, rpb_t, dt["seg"], O),
                lambda i, s, ids_ref: (ids_ref[i] // n_rblk_t,
                                       ids_ref[i] % n_rblk_t, s, 0)),
            scratch_shapes=_scratch_shapes(dt, Rt, rpb_t),
        ),
        out_shape=jax.ShapeDtypeStruct((B, dt["H_pad"], dt["Wp_out"], O),
                                       dt["out_dtype"]),
        # index counts the scalar-prefetch operand: (ids, PY, PX, MK, Wk,
        # xt, base) -> base is input 6
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ids, PYt, PXt, MKt, Wkt, xtt, base_t)

    out = out[:, :H, :W, :]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    out = out.astype(x.dtype)
    if return_overflow:
        overflow = jnp.stack([
            jnp.sum(oob_blk.astype(jnp.int32))
            - jnp.sum(selected.astype(jnp.int32)),
            jnp.sum((jnp.max(offa, axis=-1) > Rt).astype(jnp.int32)),
        ])
        return out, overflow
    return out
