"""Vector quantizers (reference: quantize.py).

* :class:`VectorQuantizer2` — the GLARE codebook retrieval
  (quantize.py:271-312): nearest-neighbor lookup, commitment loss
  (legacy beta), straight-through estimator. NHWC in/out.
* :class:`WeightedVectorQuantizer` — the RIDCP weighted variant used by
  stage-1 VQGAN training (dehaze_vq_weight_arch.py:50-131): distances
  reweighted by exp(alpha * w) with a per-code weight, plus gram-matrix
  texture loss against GT indices.

The argmin rides :mod:`glare_tpu.ops.vq` (fused Pallas kernel on TPU).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.vq import nearest_code, nearest_code_ref


def _uniform_embed_init(n_e):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -1.0 / n_e, 1.0 / n_e)

    return init


class VectorQuantizer2(nn.Module):
    """Nearest-neighbor codebook with straight-through gradients.

    Returns (z_q [NHWC], loss, (perplexity, min_encodings, indices)) with the
    same tuple shape as the reference forward (quantize.py:312).
    """

    n_e: int = 8192
    e_dim: int = 3
    beta: float = 0.25
    legacy: bool = True
    sane_index_shape: bool = False
    backend: str = "auto"

    @nn.compact
    def __call__(self, z):
        embedding = self.param(
            "embedding", _uniform_embed_init(self.n_e), (self.n_e, self.e_dim)
        )
        b, h, w, c = z.shape
        assert c == self.e_dim, (z.shape, self.e_dim)
        z_flat = z.reshape(-1, self.e_dim)

        idx = nearest_code(
            jax.lax.stop_gradient(z_flat), jax.lax.stop_gradient(embedding),
            backend=self.backend,
        )
        z_q = jnp.take(embedding, idx, axis=0).reshape(z.shape).astype(z.dtype)

        zf = z.astype(jnp.float32)
        zqf = z_q.astype(jnp.float32)
        if not self.legacy:
            loss = self.beta * jnp.mean((jax.lax.stop_gradient(zqf) - zf) ** 2) + jnp.mean(
                (zqf - jax.lax.stop_gradient(zf)) ** 2
            )
        else:
            loss = jnp.mean((jax.lax.stop_gradient(zqf) - zf) ** 2) + self.beta * jnp.mean(
                (zqf - jax.lax.stop_gradient(zf)) ** 2
            )

        # straight-through
        z_q = z + jax.lax.stop_gradient(z_q - z)

        if self.sane_index_shape:
            idx = idx.reshape(b, h, w)
        return z_q, loss, (None, None, idx)

    def get_codebook_entry(self, params, indices, shape=None):
        """indices [...] -> embeddings, optionally reshaped to NHWC `shape`."""
        embedding = params["embedding"]
        z_q = jnp.take(embedding, indices.reshape(-1), axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class WeightedVectorQuantizer(nn.Module):
    """RIDCP weighted VQ (reference: dehaze_vq_weight_arch.py:24-131).

    dist(z, e_k) is reweighted by exp(-weight_alpha * w_k) where w_k is a
    per-code usage weight (pretrained or learned); supports gram-matrix
    texture loss against ground-truth indices during LQ-stage training.
    """

    n_e: int = 8192
    e_dim: int = 3
    beta: float = 0.25
    weight_alpha: float = 1.0
    use_weight: bool = True
    LQ_stage: bool = False

    def setup(self):
        self.embedding = self.param(
            "embedding", _uniform_embed_init(self.n_e), (self.n_e, self.e_dim)
        )
        self.weight = self.param("weight", nn.initializers.zeros, (self.n_e,))

    def __call__(self, z, gt_indices=None, weight_alpha=None):
        embedding = self.embedding
        weight = self.weight

        b, h, w, c = z.shape
        z_flat = z.reshape(-1, self.e_dim).astype(jnp.float32)
        emb32 = embedding.astype(jnp.float32)

        d = (
            jnp.sum(z_flat ** 2, axis=1, keepdims=True)
            + jnp.sum(emb32 ** 2, axis=1)[None, :]
            - 2.0 * jnp.dot(z_flat, emb32.T, preferred_element_type=jnp.float32)
        )
        if self.use_weight and self.LQ_stage:
            alpha = self.weight_alpha if weight_alpha is None else weight_alpha
            d = d * jnp.exp(alpha * jax.lax.stop_gradient(weight))[None, :]
        idx = jnp.argmin(jax.lax.stop_gradient(d), axis=1).astype(jnp.int32)
        z_q = jnp.take(embedding, idx, axis=0).reshape(z.shape).astype(z.dtype)

        zf = z.astype(jnp.float32)
        zqf = z_q.astype(jnp.float32)

        if self.LQ_stage and gt_indices is not None:
            # LQ stage supervised by GT indices (dehaze_vq_weight_arch.py:120-131):
            # codebook = beta * |sg(z_q_gt) - z|^2 + gram(z, sg(z_q_gt))
            z_q_gt = jnp.take(embedding, gt_indices.reshape(-1), axis=0).reshape(z.shape)
            zqgt = jax.lax.stop_gradient(z_q_gt.astype(jnp.float32))
            codebook_loss = self.beta * jnp.mean((zqgt - zf) ** 2)
            codebook_loss = codebook_loss + _gram_loss(zf, zqgt)
        else:
            # HQ stage: q_latent + beta * e_latent (dehaze_vq_weight_arch.py:133)
            codebook_loss = jnp.mean(
                (zqf - jax.lax.stop_gradient(zf)) ** 2
            ) + self.beta * jnp.mean((jax.lax.stop_gradient(zqf) - zf) ** 2)

        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, codebook_loss, idx.reshape(b, h, w)

    def embed(self, indices, shape=None):
        """Bound codebook lookup (reference: get_codebook_entry,
        dehaze_vq_weight_arch.py:146-156)."""
        z_q = jnp.take(self.embedding, indices.reshape(-1), axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


def _gram_loss(x, y):
    """Gram-matrix (texture) loss between NHWC feature maps
    (reference: dehaze_vq_weight_arch.py:101-118)."""

    def gram(t):
        b, h, w, c = t.shape
        f = t.reshape(b, h * w, c)
        g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
        return g / (h * w * c)

    return jnp.mean((gram(x) - gram(y)) ** 2)
