"""Gather-free bounded flow-warp alignment (TPU-fast AFT variant).

This backend's XLA gather runs at ~100 MB/s (PERF_NOTES.md), which makes the
exact DCNv2 formulation gather-bound. `flow_warp_align` is a TPU-shaped
alternative for the AFT WarpBlock: ONE bounded flow vector per deformable
group per pixel (instead of 9 per-tap offsets), bilinear-sampled via a
static select-chain over the (2R+1)^2 integer shifts — no gathers, pure
VPU FMAs on contiguous slices, fully differentiable.

Rationale: DCN-for-alignment learns offsets that approximate a flow field
(cf. "Delving Deep into Deformable Alignment in Video Super-Resolution",
which GLARE's DCNv2Pack cites); with offsets bounded to a few pixels — the
regime GLARE operates in (its own code warns when mean |offset| > 50) —
group-wise flow + a dense 3x3 conv is an equivalent-capacity aligner.
Select with `warp_mode: flow` in network_G (default `dcn` = exact parity).

out-of-range samples are zero (same boundary convention as the DCN kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_offset",))
def flow_warp_align(x, flow, max_offset=1):
    """x [B, H, W, C]; flow [B, H, W, G, 2] (dy, dx), expected in
    [-max_offset, max_offset] (clamped here for safety). C % G == 0.

    Returns x sampled at (p + flow_g(p)) per group, bilinear, zero outside.
    """
    B, H, W, C = x.shape
    G = flow.shape[3]
    assert C % G == 0
    Cg = C // G
    R = int(max_offset)
    assert R >= 1

    f = jnp.clip(flow.astype(jnp.float32), -max_offset, max_offset)
    dy = f[..., 0]  # [B, H, W, G]
    dx = f[..., 1]

    xp = jnp.pad(x, [(0, 0), (R, R), (R, R), (0, 0)])
    xg = xp.reshape(B, H + 2 * R, W + 2 * R, G, Cg)

    acc = jnp.zeros((B, H, W, G, Cg), x.dtype)
    for sy in range(-R, R + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - sy))
        for sx in range(-R, R + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - sx))
            w = (wy * wx)[..., None].astype(x.dtype)  # [B, H, W, G, 1]
            shifted = xg[:, R + sy : R + sy + H, R + sx : R + sx + W]
            acc = acc + shifted * w
    return acc.reshape(B, H, W, C)


def flow_warp_align_ref(x, flow, max_offset=1):
    """Naive per-pixel oracle for tests."""
    import numpy as np

    x = np.asarray(x, np.float64)
    flow = np.clip(np.asarray(flow, np.float64), -max_offset, max_offset)
    B, H, W, C = x.shape
    G = flow.shape[3]
    Cg = C // G
    out = np.zeros_like(x)
    for b in range(B):
        for y in range(H):
            for xx in range(W):
                for g in range(G):
                    py = y + flow[b, y, xx, g, 0]
                    px = xx + flow[b, y, xx, g, 1]
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    for dy2 in (0, 1):
                        for dx2 in (0, 1):
                            yy, xx2 = y0 + dy2, x0 + dx2
                            if 0 <= yy < H and 0 <= xx2 < W:
                                wgt = (1 - abs(py - yy)) * (1 - abs(px - xx2))
                                out[b, y, xx, g * Cg : (g + 1) * Cg] += (
                                    wgt * x[b, yy, xx2, g * Cg : (g + 1) * Cg]
                                )
    return out
