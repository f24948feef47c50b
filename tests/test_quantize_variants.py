"""Tests for the Gumbel and EMA quantizer variants
(reference: code/models/modules/quantize.py:110-209, 331-445 — note the
reference EMAVectorQuantizer is broken as shipped, quantize.py:365-366)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glare_tpu.modules.quantize import (
    EMAVectorQuantizer,
    GumbelQuantize,
    VectorQuantizer,
    VectorQuantizer2,
    remap_to_used,
    unmap_to_all,
)


class TestGumbelQuantize:
    def _build(self, **kw):
        m = GumbelQuantize(num_hiddens=8, embedding_dim=4, n_embed=16, **kw)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6, 8))
        variables = m.init({"params": jax.random.PRNGKey(1)}, z)
        return m, z, variables

    def test_eval_is_hard_argmax_of_logits(self):
        m, z, variables = self._build()
        z_q, diff, (_, _, ind) = m.apply(variables, z, deterministic=True)
        assert z_q.shape == (2, 5, 6, 4)
        assert ind.shape == (2, 5, 6)
        # eval path: hard one-hot of the 1x1-conv logits
        logits = jnp.einsum(
            "bhwc,cn->bhwn", z, variables["params"]["proj"]["kernel"][0, 0]
        ) + variables["params"]["proj"]["bias"]
        np.testing.assert_array_equal(
            np.asarray(ind), np.asarray(jnp.argmax(logits, axis=-1))
        )
        embed = variables["params"]["embed"]
        np.testing.assert_allclose(
            np.asarray(z_q), np.asarray(jnp.take(embed, ind, axis=0)), atol=1e-5
        )
        assert np.isfinite(float(diff))

    def test_train_draws_gumbel_and_differentiates(self):
        m, z, variables = self._build()

        def loss(params, z):
            z_q, diff, _ = m.apply(
                {"params": params}, z, deterministic=False,
                rngs={"gumbel": jax.random.PRNGKey(7)},
            )
            return jnp.sum(z_q ** 2) + diff

        g = jax.grad(loss)(variables["params"], z)
        # straight-through: gradients reach both the projection and embedding
        assert float(jnp.sum(jnp.abs(g["proj"]["kernel"]))) > 0
        assert float(jnp.sum(jnp.abs(g["embed"]))) > 0

    def test_get_codebook_entry_roundtrip(self):
        m, z, variables = self._build()
        _, _, (_, _, ind) = m.apply(variables, z, deterministic=True)
        out = m.get_codebook_entry(
            variables["params"], ind.reshape(-1), (2, 5, 6, 4)
        )
        embed = variables["params"]["embed"]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(embed, ind, axis=0)), atol=1e-6
        )


    def test_deterministic_with_remap(self):
        """Regression (round-2 advisor): deterministic + remap with the
        default unknown_index='random' must not assert (no rng at eval)."""
        remap = [1, 3, 5, 7]
        m = GumbelQuantize(num_hiddens=8, embedding_dim=4, n_embed=16,
                           remap=remap)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6, 8))
        variables = m.init({"params": jax.random.PRNGKey(1)}, z)
        z_q, diff, (_, _, ind) = m.apply(variables, z, deterministic=True)
        assert z_q.shape == (2, 5, 6, 4)
        # indices are in the remapped [0, len(used)) range
        assert int(jnp.max(ind)) < len(remap) and int(jnp.min(ind)) >= 0
        # KL constant is n_embed (reference quantize.py:194), not len(used):
        # recompute with the full-codebook constant and compare
        logits = jnp.einsum(
            "bhwc,cn->bhwn", z, variables["params"]["proj"]["kernel"][0, 0]
        ) + variables["params"]["proj"]["bias"]
        logits = jnp.take(logits, jnp.asarray(remap), axis=-1)
        qy = jax.nn.softmax(logits, axis=-1)
        want = 5e-4 * jnp.mean(jnp.sum(qy * jnp.log(qy * 16 + 1e-10), axis=-1))
        np.testing.assert_allclose(float(diff), float(want), rtol=1e-5)

    def test_train_with_remap_random_unknown(self):
        """Training path with remap + unknown_index='random' uses the gumbel
        rng stream for the unknown fill without asserting."""
        m = GumbelQuantize(num_hiddens=8, embedding_dim=4, n_embed=16,
                           remap=[0, 2, 4, 6])
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 3, 8))
        variables = m.init({"params": jax.random.PRNGKey(1)}, z)
        z_q, diff, (_, _, ind) = m.apply(
            variables, z, deterministic=False,
            rngs={"gumbel": jax.random.PRNGKey(7)},
        )
        assert int(jnp.max(ind)) < 4


class TestRemap:
    def test_remap_and_unmap(self):
        used = jnp.asarray([3, 7, 11], jnp.int32)
        inds = jnp.asarray([[3, 7, 11, 5]], jnp.int32)
        remapped = remap_to_used(inds, used, unknown_index="extra")
        np.testing.assert_array_equal(np.asarray(remapped), [[0, 1, 2, 3]])
        # extra token collapses to used[0] on the way back
        back = unmap_to_all(remapped, used)
        np.testing.assert_array_equal(np.asarray(back), [[3, 7, 11, 3]])

    def test_remap_integer_unknown(self):
        used = jnp.asarray([2, 4], jnp.int32)
        inds = jnp.asarray([[2, 9]], jnp.int32)
        out = remap_to_used(inds, used, unknown_index="0")
        np.testing.assert_array_equal(np.asarray(out), [[0, 0]])


class TestEMAVectorQuantizer:
    def _build(self):
        m = EMAVectorQuantizer(n_embed=8, embedding_dim=4, decay=0.5)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
        variables = m.init({"params": jax.random.PRNGKey(1)}, z)
        return m, z, variables

    def test_eval_matches_nearest_neighbor(self):
        m, z, variables = self._build()
        z_q, loss, (perp, enc, ind) = m.apply(variables, z)
        emb = np.asarray(variables["ema"]["weight"])
        zf = np.asarray(z).reshape(-1, 4)
        d = ((zf[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(ind).reshape(-1), d.argmin(1))
        assert float(perp) > 0 and np.isfinite(float(loss))

    def test_ema_update_math(self):
        m, z, variables = self._build()
        (_, _, (_, enc, _)), new_vars = m.apply(
            variables, z, update=True, mutable=["ema"]
        )
        enc = np.asarray(enc)
        zf = np.asarray(z).reshape(-1, 4)
        old_cs = np.zeros(8, np.float32)
        old_avg = np.asarray(variables["ema"]["embed_avg"])
        decay, eps = 0.5, 1e-5

        want_cs = old_cs * decay + enc.sum(0) * (1 - decay)
        want_avg = old_avg * decay + (enc.T @ zf) * (1 - decay)
        n = want_cs.sum()
        smoothed = (want_cs + eps) / (n + 8 * eps) * n
        want_w = want_avg / smoothed[:, None]

        np.testing.assert_allclose(
            np.asarray(new_vars["ema"]["cluster_size"]), want_cs, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_vars["ema"]["embed_avg"]), want_avg, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_vars["ema"]["weight"]), want_w, rtol=1e-5
        )

    def test_codebook_moves_toward_data(self):
        m, z, variables = self._build()
        # repeated updates on fixed data pull used codes toward cluster means
        for _ in range(20):
            (_, _, _), variables_new = m.apply(
                variables, z, update=True, mutable=["ema"]
            )
            variables = {"ema": variables_new["ema"]}
        z_q, loss, (_, _, ind) = m.apply(variables, z)
        err = float(jnp.mean((z_q - z) ** 2))
        assert err < 0.6, err  # quantization error shrinks vs random init


def test_legacy_alias():
    assert VectorQuantizer is VectorQuantizer2
