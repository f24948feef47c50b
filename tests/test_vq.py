"""Codebook retrieval oracle tests (SURVEY.md §4 oracle (b)):
Pallas kernel (interpret mode on CPU) vs naive argmin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glare_tpu.ops import vq as vq_ops
from glare_tpu.modules.quantize import VectorQuantizer2, WeightedVectorQuantizer


def naive_argmin(z, e):
    d = ((z[:, None, :] - e[None, :, :]) ** 2).sum(-1)
    return np.argmin(d, axis=1)


class TestNearestCode:
    def test_ref_matches_naive(self):
        rng = np.random.RandomState(0)
        z = rng.standard_normal((257, 3)).astype(np.float32)
        e = rng.standard_normal((512, 3)).astype(np.float32)
        idx = np.asarray(vq_ops.nearest_code_ref(jnp.asarray(z), jnp.asarray(e)))
        np.testing.assert_array_equal(idx, naive_argmin(z, e))

    def test_pallas_interpret_matches_ref(self, monkeypatch):
        """Run the Pallas kernel in interpreter mode on CPU."""
        import functools
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))

        rng = np.random.RandomState(1)
        z = rng.standard_normal((300, 3)).astype(np.float32)
        e = rng.standard_normal((4096, 3)).astype(np.float32)
        idx = np.asarray(
            vq_ops.nearest_code_pallas(jnp.asarray(z), jnp.asarray(e), block_n=128, block_k=1024)
        )
        np.testing.assert_array_equal(idx, naive_argmin(z, e))

    def test_pallas_tie_break_first_index(self, monkeypatch):
        import functools
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))

        # duplicate codes -> must pick the first
        e = np.zeros((256, 3), np.float32)
        e[7] = [1, 1, 1]
        e[100] = [1, 1, 1]
        z = np.ones((130, 3), np.float32)
        idx = np.asarray(
            vq_ops.nearest_code_pallas(jnp.asarray(z), jnp.asarray(e), block_n=128, block_k=128)
        )
        assert (idx == 7).all()


class TestVectorQuantizer2:
    def test_forward_and_straight_through(self):
        m = VectorQuantizer2(n_e=64, e_dim=3, backend="ref")
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        params = m.init(jax.random.PRNGKey(1), z)
        z_q, loss, (_, _, idx) = m.apply(params, z)
        assert z_q.shape == z.shape
        assert idx.shape == (2 * 4 * 4,)
        assert float(loss) >= 0

        # straight-through: d z_q / d z == identity
        def f(z):
            z_q, _, _ = m.apply(params, z)
            return (z_q * 2.0).sum()

        g = jax.grad(f)(z)
        np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)

    def test_quantized_values_are_codebook_rows(self):
        m = VectorQuantizer2(n_e=64, e_dim=3, backend="ref")
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 3))
        params = m.init(jax.random.PRNGKey(1), z)
        z_q, _, (_, _, idx) = m.apply(params, z)
        emb = np.asarray(params["params"]["embedding"])
        np.testing.assert_allclose(
            np.asarray(z_q).reshape(-1, 3), emb[np.asarray(idx)], atol=1e-6
        )


class TestWeightedVQ:
    def test_hq_stage_loss(self):
        m = WeightedVectorQuantizer(n_e=16, e_dim=3, weight_alpha=10.0)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 3))
        params = m.init(jax.random.PRNGKey(1), z)
        z_q, cb_loss, idx = m.apply(params, z)
        assert idx.shape == (1, 2, 2)
        assert float(cb_loss) >= 0

    def test_lq_stage_gt_indices_supervision(self):
        m = WeightedVectorQuantizer(n_e=16, e_dim=3, LQ_stage=True)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 3))
        params = m.init(jax.random.PRNGKey(1), z)
        gt_idx = jnp.zeros((1, 2, 2), jnp.int32)
        _, cb_loss, _ = m.apply(params, z, gt_indices=gt_idx)
        assert float(cb_loss) > 0

    def test_weight_reweights_distances(self):
        """A huge positive weight on the nearest code pushes selection away."""
        import numpy as np

        m = WeightedVectorQuantizer(n_e=4, e_dim=3, LQ_stage=True, weight_alpha=1.0)
        z = jnp.ones((1, 1, 1, 3)) * 0.48
        params = m.init(jax.random.PRNGKey(1), z)
        emb = jnp.asarray(
            [[0.5, 0.5, 0.5], [0.4, 0.4, 0.4], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
        )
        p = {"params": {"embedding": emb, "weight": jnp.zeros((4,))}}
        _, _, idx0 = m.apply(p, z)
        assert int(idx0.reshape(-1)[0]) == 0
        w = jnp.asarray([50.0, 0.0, 0.0, 0.0])
        p2 = {"params": {"embedding": emb, "weight": w}}
        _, _, idx1 = m.apply(p2, z)
        assert int(idx1.reshape(-1)[0]) == 1
