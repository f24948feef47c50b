"""Vector quantizers (reference: quantize.py).

* :class:`VectorQuantizer2` — the GLARE codebook retrieval
  (quantize.py:271-312): nearest-neighbor lookup, commitment loss
  (legacy beta), straight-through estimator. NHWC in/out.
  The reference's legacy ``VectorQuantizer`` (quantize.py:9-107, flagged
  buggy there) is exactly ``VectorQuantizer2(legacy=True)`` — exported as
  the alias :data:`VectorQuantizer`.
* :class:`WeightedVectorQuantizer` — the RIDCP weighted variant used by
  stage-1 VQGAN training (dehaze_vq_weight_arch.py:50-131): distances
  reweighted by exp(alpha * w) with a per-code weight, plus gram-matrix
  texture loss against GT indices.
* :class:`GumbelQuantize` — Gumbel-softmax quantizer
  (quantize.py:110-209), needs a ``'gumbel'`` rng during training.
* :class:`EMAVectorQuantizer` — EMA codebook updates via a mutable
  ``'ema'`` variable collection (quantize.py:331-445; the reference class
  is broken as shipped — undefined ``codebook_dim``/``num_tokens`` at
  quantize.py:365-366 — this is the working equivalent).

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


def remap_to_used(inds, used, unknown_index, rng=None, re_embed=None):
    """Map full-codebook indices onto the `used` subset
    (reference: quantize.py:147-161). `unknown_index` is "random",
    "extra", or an integer; "random" requires `rng` and `re_embed`."""
    ishape = inds.shape
    flat = inds.reshape(ishape[0], -1)
    match = (flat[:, :, None] == used[None, None, :]).astype(jnp.int32)
    new = jnp.argmax(match, axis=-1).astype(jnp.int32)
    unknown = jnp.sum(match, axis=2) < 1
    if unknown_index == "random":
        assert rng is not None and re_embed is not None
        rand = jax.random.randint(rng, new.shape, 0, re_embed, new.dtype)
        new = jnp.where(unknown, rand, new)
    else:
        fill = used.shape[0] if unknown_index == "extra" else int(unknown_index)
        new = jnp.where(unknown, jnp.int32(fill), new)
    return new.reshape(ishape)


def unmap_to_all(inds, used):
    """Inverse of :func:`remap_to_used` (reference: quantize.py:163-170);
    extra tokens collapse to index 0."""
    ishape = inds.shape
    flat = inds.reshape(ishape[0], -1)
    flat = jnp.where(flat >= used.shape[0], 0, flat)
    return jnp.take(used, flat, axis=0).reshape(ishape)


class GumbelQuantize(nn.Module):
    """Gumbel-softmax quantizer (reference: quantize.py:110-209).

    NHWC in/out. During training (`deterministic=False`) draws Gumbel noise
    from the ``'gumbel'`` rng stream; at eval the categorical is taken hard
    (the reference forces hard=True in eval). Returns
    ``(z_q, kl_diff, (None, None, indices))`` under the VQ interface.

    DELIBERATE PARITY DEVIATION: the reference's ``F.gumbel_softmax`` samples
    Gumbel noise even in eval mode (quantize.py:180), so reference eval
    indices are stochastic. Here ``deterministic=True`` uses a plain
    softmax/argmax — eval outputs are reproducible, which we consider an
    improvement; pass ``deterministic=False`` with a fixed rng to reproduce
    the reference's sampled-eval behavior. Documented in PARITY.md.
    """

    num_hiddens: int
    embedding_dim: int
    n_embed: int
    straight_through: bool = True
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    use_vqinterface: bool = True
    remap: Optional[Any] = None  # array of used indices (np.load'ed)
    unknown_index: str = "random"

    @nn.compact
    def __call__(self, z, temp=None, return_logits=False, deterministic=True):
        embed = self.param(
            "embed", nn.initializers.normal(1.0), (self.n_embed, self.embedding_dim)
        )
        logits = nn.Conv(self.n_embed, (1, 1), name="proj")(z)

        used = None
        if self.remap is not None:
            used = jnp.asarray(self.remap, jnp.int32)
            logits = jnp.take(logits, used, axis=-1)

        hard = self.straight_through if not deterministic else True
        temp = self.temp_init if temp is None else temp

        if deterministic:
            y_soft = jax.nn.softmax(logits / temp, axis=-1)
        else:
            g = jax.random.gumbel(self.make_rng("gumbel"), logits.shape, logits.dtype)
            y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        if hard:
            one_hot = jax.nn.one_hot(
                jnp.argmax(y_soft, axis=-1), y_soft.shape[-1], dtype=y_soft.dtype
            )
            soft_one_hot = y_soft + jax.lax.stop_gradient(one_hot - y_soft)
        else:
            soft_one_hot = y_soft

        if self.remap is not None:
            full = jnp.zeros((*soft_one_hot.shape[:-1], self.n_embed),
                             soft_one_hot.dtype)
            soft_one_hot = full.at[..., used].set(soft_one_hot)

        z_q = jnp.einsum("bhwn,nd->bhwd", soft_one_hot, embed)

        # KL to the uniform prior (reference: quantize.py:193-194). The
        # log term multiplies by the FULL codebook size self.n_embed even
        # when remap restricts logits to len(used) channels — the reference
        # does the same (its qy is over remapped logits but the constant is
        # self.n_embed).
        qy = jax.nn.softmax(logits, axis=-1)
        diff = self.kl_weight * jnp.mean(
            jnp.sum(qy * jnp.log(qy * self.n_embed + 1e-10), axis=-1)
        )

        ind = jnp.argmax(soft_one_hot, axis=-1).astype(jnp.int32)
        if self.remap is not None:
            rng = None if deterministic else self.make_rng("gumbel")
            # unknown_index='random' needs an rng; deterministic calls have
            # none, so fall back to 'extra' (indices here are argmaxes of a
            # remapped one-hot, so "unknown" never actually fires — the
            # fallback only picks the assert-free path).
            unk = self.unknown_index if rng is not None else "extra"
            ind = remap_to_used(ind, used, unk, rng=rng, re_embed=used.shape[0])
        if self.use_vqinterface:
            if return_logits:
                return z_q, diff, (None, None, ind), logits
            return z_q, diff, (None, None, ind)
        return z_q, diff, ind

    def get_codebook_entry(self, params, indices, shape):
        """(b*h*w,) indices -> NHWC embeddings (reference: quantize.py:204-209)."""
        b, h, w, c = shape
        assert b * h * w == indices.shape[0]
        indices = indices.reshape(b, h, w)
        if self.remap is not None:
            indices = unmap_to_all(indices, jnp.asarray(self.remap, jnp.int32))
        one_hot = jax.nn.one_hot(indices, self.n_embed, dtype=jnp.float32)
        return jnp.einsum("bhwn,nd->bhwd", one_hot, params["embed"])


class EMAVectorQuantizer(nn.Module):
    """Nearest-neighbor VQ with exponential-moving-average codebook updates
    (reference: quantize.py:331-445; the reference class crashes on
    construction — undefined names at quantize.py:365-366 — this is the
    working equivalent, with the EMA statistics carried in a mutable
    ``'ema'`` flax collection so the update stays functional/jit-safe).

    Call with ``mutable=['ema']`` and ``update=True`` during training to
    apply cluster-size/embed-avg EMA and the Laplace-smoothed weight
    refresh; the codebook itself is a non-trainable EMA variable.
    """

    n_embed: int
    embedding_dim: int
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, z, update=False):
        init = nn.initializers.normal(1.0)
        weight = self.variable(
            "ema", "weight", init, self.make_rng("params") if self.is_initializing() else None,
            (self.n_embed, self.embedding_dim),
        )
        cluster_size = self.variable(
            "ema", "cluster_size", lambda: jnp.zeros((self.n_embed,), jnp.float32)
        )
        embed_avg = self.variable("ema", "embed_avg", lambda: weight.value)

        b, h, w, c = z.shape
        assert c == self.embedding_dim
        z_flat = z.reshape(-1, self.embedding_dim).astype(jnp.float32)
        emb = weight.value.astype(jnp.float32)

        d = (
            jnp.sum(z_flat ** 2, axis=1, keepdims=True)
            + jnp.sum(emb ** 2, axis=1)[None, :]
            - 2.0 * jnp.dot(z_flat, emb.T, preferred_element_type=jnp.float32)
        )
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape).astype(z.dtype)

        encodings = jax.nn.one_hot(idx, self.n_embed, dtype=jnp.float32)
        avg_probs = jnp.mean(encodings, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        if update:
            # EMA cluster size + embedding average (quantize.py:427-434)
            new_cluster = cluster_size.value * self.decay + jnp.sum(
                encodings, axis=0
            ) * (1 - self.decay)
            embed_sum = jnp.dot(encodings.T, z_flat,
                                preferred_element_type=jnp.float32)
            new_avg = embed_avg.value * self.decay + embed_sum * (1 - self.decay)
            # Laplace-smoothed weight refresh (quantize.py:351-358)
            n = jnp.sum(new_cluster)
            smoothed = (new_cluster + self.eps) / (n + self.n_embed * self.eps) * n
            cluster_size.value = new_cluster
            embed_avg.value = new_avg
            weight.value = new_avg / smoothed[:, None]

        loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(z_q.astype(jnp.float32)) - z.astype(jnp.float32)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, loss, (perplexity, encodings, idx.reshape(b, h, w))


# reference quantize.py:9-107 ("contains a bug regarding beta; see
# VectorQuantizer2... can be used wherever VectorQuantizer has been used"):
# the legacy class IS VectorQuantizer2 with legacy=True.
VectorQuantizer = VectorQuantizer2
