"""Codebook retrieval (nearest-neighbor vector quantization).

The reference computes a dense [N, K] distance matrix then argmins
(``quantize.py:280-285``: d = |z|^2 + |e|^2 - 2 z.e^T). On TPU we provide:

  * :func:`nearest_code_ref` — pure-XLA formulation (oracle + CPU path).
  * :func:`nearest_code_pallas` — fused Pallas kernel: blocks over tokens and
    codes, keeps a running (min, argmin) in VMEM so the [N, K] distance
    matrix never materializes in HBM. The z.e^T term rides the MXU.

Both return int32 indices of shape [N]; ties resolve to the first (lowest)
index, matching torch.argmin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def nearest_code_ref(z_flat, codebook):
    """z_flat [N, D], codebook [K, D] -> indices [N] (int32)."""
    z2 = jnp.sum(z_flat.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    e2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)
    d = z2 + e2[None, :] - 2.0 * jnp.dot(
        z_flat.astype(jnp.float32),
        codebook.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _vq_kernel(z_ref, w_ref, idx_ref, min_ref, arg_ref, *, block_k, num_k):
    """Grid (token_tiles, code_tiles); code dim iterates fastest.

    The distance (up to the argmin-invariant |z|^2 term) is folded into ONE
    MXU matmul via an augmented-ones column: z' = [z, 1], w_k = [-2 e_k,
    |e_k|^2], so d = z' @ w^T. (Computing |e|^2 in-kernel forces a
    lane->sublane relayout that stalls the Mosaic compiler.)

    z_ref:   [TN, Dp]        augmented token tile (VMEM)
    w_ref:   [TK, Dp]        augmented codebook tile (VMEM)
    idx_ref: [num_n, TN]     full output array (VMEM); row i written at the
                             last code tile (TPU tiling forbids (1, TN) blocks)
    min_ref: [1, TN]         running min distance (scratch)
    arg_ref: [1, TN]         running argmin (scratch)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[...] = jnp.full_like(min_ref, jnp.inf)
        arg_ref[...] = jnp.zeros_like(arg_ref)

    d = jax.lax.dot_general(
        z_ref[...].astype(jnp.float32),
        w_ref[...].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TN, TK]

    tile_min = jnp.min(d, axis=1)  # [TN]
    tk = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    tile_arg = jnp.min(jnp.where(d == tile_min[:, None], col, tk), axis=1)
    tile_arg = tile_arg + j * block_k

    prev_min = min_ref[0, :]
    prev_arg = arg_ref[0, :]
    better = tile_min < prev_min
    min_ref[0, :] = jnp.where(better, tile_min, prev_min)
    arg_ref[0, :] = jnp.where(better, tile_arg, prev_arg)

    @pl.when(j == num_k - 1)
    def _():
        idx_ref[i, :] = arg_ref[0, :]


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def nearest_code_pallas(z_flat, codebook, block_n=512, block_k=2048):
    """Fused distance+argmin. z_flat [N, D], codebook [K, D] -> [N] int32.

    D is zero-padded to the 128-lane boundary; N to block_n; K must divide
    by block_k (the GLARE codebook K=8192 does).
    """
    n, d = z_flat.shape
    k, d2 = codebook.shape
    assert d == d2, (z_flat.shape, codebook.shape)
    dp = max(_round_up(d + 1, 128), 128)
    np_ = _round_up(n, block_n)
    assert k % block_k == 0, (k, block_k)

    # augmented forms: z' = [z, 1, 0...], w = [-2e, |e|^2, 0...]
    zf = z_flat.astype(jnp.float32)
    ef = codebook.astype(jnp.float32)
    z_p = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(zf)
    z_p = z_p.at[:n, d].set(1.0)
    e_p = jnp.zeros((k, dp), jnp.float32).at[:, :d].set(-2.0 * ef)
    e_p = e_p.at[:, d].set(jnp.sum(ef * ef, axis=1))

    num_n = np_ // block_n
    num_k = k // block_k

    out = pl.pallas_call(
        functools.partial(_vq_kernel, block_k=block_k, num_k=num_k),
        grid=(num_n, num_k),
        in_specs=[
            pl.BlockSpec((block_n, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_n, block_n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, block_n), jnp.float32),
            pltpu.VMEM((1, block_n), jnp.int32),
        ],
    )(z_p, e_p)
    return out.reshape(-1)[:n]


def nearest_code(z_flat, codebook, backend="auto"):
    """Dispatch: pallas on TPU, XLA elsewhere."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "ref"
    if backend == "pallas":
        return nearest_code_pallas(z_flat, codebook)
    return nearest_code_ref(z_flat, codebook)
