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
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _vq_kernel(z_ref, e_ref, idx_ref, min_ref, arg_ref, *, block_k, num_k):
    """Grid (token_tiles, code_tiles); code dim iterates fastest.

    z_ref:   [TN, Dp]  token tile (VMEM)
    e_ref:   [TK, Dp]  codebook tile (VMEM)
    idx_ref: [1, TN]   output indices for this token tile
    min_ref: [1, TN]   running min distance (scratch)
    arg_ref: [1, TN]   running argmin (scratch)
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[...] = jnp.full_like(min_ref, jnp.inf)
        arg_ref[...] = jnp.zeros_like(arg_ref)

    z = z_ref[...].astype(jnp.float32)
    e = e_ref[...].astype(jnp.float32)
    # |z - e|^2 up to the constant |z|^2 (monotone in argmin)
    e2 = jnp.sum(e * e, axis=1)  # [TK]
    zet = jax.lax.dot_general(
        z, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, TK]
    d = e2[None, :] - 2.0 * zet

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
        idx_ref[0, :] = arg_ref[0, :]


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def nearest_code_pallas(z_flat, codebook, block_n=512, block_k=2048):
    """Fused distance+argmin. z_flat [N, D], codebook [K, D] -> [N] int32.

    D is zero-padded to the 128-lane boundary; N to block_n; K must divide
    by block_k (the GLARE codebook K=8192 does).
    """
    n, d = z_flat.shape
    k, d2 = codebook.shape
    assert d == d2, (z_flat.shape, codebook.shape)
    dp = max(_round_up(d, 128), 128)
    np_ = _round_up(n, block_n)
    assert k % block_k == 0, (k, block_k)

    z_p = jnp.zeros((np_, dp), z_flat.dtype).at[:n, :d].set(z_flat)
    e_p = jnp.zeros((k, dp), codebook.dtype).at[:, :d].set(codebook)

    num_n = np_ // block_n
    num_k = k // block_k

    out = pl.pallas_call(
        functools.partial(_vq_kernel, block_k=block_k, num_k=num_k),
        grid=(num_n, num_k),
        in_specs=[
            pl.BlockSpec((block_n, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
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
