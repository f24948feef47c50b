"""Swin transformer blocks for the RIDCP LQ-stage encoder
(reference: basicsr/archs/network_swinir.py — WindowAttention,
SwinTransformerBlock, BasicLayer, RSTB).

TPU-first notes: window partitioning is pure reshape/transpose (layout
friendly); attention runs as one batched einsum over all windows (maps to a
single MXU batched matmul); shifted windows use jnp.roll; the attention
masks for shifted windows are precomputed per (H, W) at trace time (shapes
are static under jit). Callers pad H, W to window_size multiples (the
reference pads inputs to x32 for the same reason, dehaze_vq_weight_arch.py:563-583).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def window_partition(x, ws):
    """[B, H, W, C] -> [B*nW, ws*ws, C]"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    """[B*nW, ws*ws, C] -> [B, H, W, C]"""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


def _shift_attn_mask(h, w, ws, shift):
    """Attention mask for shifted windows (numpy, trace-time constant)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask  # [nW, ws*ws, ws*ws]


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        ws = self.window_size
        nh = self.num_heads
        head_dim = c // nh
        scale = head_dim ** -0.5

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32)

        rpbt = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
        )
        rpi = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = rpbt[rpi].reshape(ws * ws, ws * ws, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nh, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SwinTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, x_size):
        h, w = x_size
        b, n, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift_size if ws == self.window_size else 0

        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        x = x.reshape(b, h, w, c)

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
        else:
            mask = None

        windows = window_partition(x, ws)
        attn_windows = WindowAttention(
            self.dim, ws, self.num_heads, dtype=self.dtype, name="attn"
        )(windows, mask=mask)
        x = window_reverse(attn_windows, ws, h, w)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))

        x = x.reshape(b, n, c)
        x = shortcut + x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        x = x + Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(y)
        return x


class BasicLayer(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, x_size):
        for i in range(self.depth):
            x = SwinTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, x_size)
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block (reference: network_swinir.py RSTB)."""

    dim: int
    depth: int = 6
    num_heads: int = 8
    window_size: int = 8
    mlp_ratio: float = 4.0
    resi_connection: str = "1conv"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, x_size):
        h, w = x_size
        b, n, c = x.shape
        res = BasicLayer(
            dim=self.dim,
            depth=self.depth,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            name="residual_group",
        )(x, x_size)
        y = res.reshape(b, h, w, c)
        from ...nn.layers import Conv

        if self.resi_connection == "3conv":
            # parameter-saving bottleneck (reference: network_swinir.py:465-470)
            y = Conv(c // 4, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(y)
            y = nn.leaky_relu(y, 0.2)
            y = Conv(c // 4, (1, 1), padding=0, dtype=self.dtype, name="conv_1")(y)
            y = nn.leaky_relu(y, 0.2)
            y = Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv_2")(y)
        else:
            y = Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(y)
        return x + y.reshape(b, n, c)


class SwinLayers(nn.Module):
    """4 x RSTB over flattened tokens (reference: dehaze_vq_weight_arch.py:157-176)."""

    embed_dim: int = 256
    blk_depth: int = 6
    num_heads: int = 8
    window_size: int = 8
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        for i in range(4):
            tokens = RSTB(
                dim=self.embed_dim,
                depth=self.blk_depth,
                num_heads=self.num_heads,
                window_size=self.window_size,
                dtype=self.dtype,
                name=f"swin_blk_{i}",
            )(tokens, (h, w))
        return tokens.reshape(b, h, w, c)
