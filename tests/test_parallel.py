"""Multi-device tests on the 8-device virtual CPU mesh: DP-sharded train
steps match single-device results; EnlargedSampler sharding; dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glare_tpu.parallel.mesh import EnlargedSampler, make_mesh, replicate, shard_batch


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.size == 8

    def test_shard_batch_layout(self):
        mesh = make_mesh()
        x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
        xs = jax.device_put(x, shard_batch(mesh))
        assert len(xs.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


class TestDPStepEquivalence:
    def test_sharded_grad_step_matches_single_device(self):
        """A jitted SGD step over a sharded batch must equal the
        single-device step (the psum the partitioner inserts is a mean)."""
        import optax

        def loss_fn(w, x, y):
            pred = x @ w
            return jnp.mean((pred - y) ** 2)

        tx = optax.sgd(0.1)

        def step(w, opt_state, x, y):
            loss, g = jax.value_and_grad(loss_fn)(w, x, y)
            updates, opt_state = tx.update(g, opt_state, w)
            return optax.apply_updates(w, updates), opt_state, loss

        rng = np.random.RandomState(0)
        w0 = jnp.asarray(rng.randn(4, 2), jnp.float32)
        x = jnp.asarray(rng.randn(16, 4), jnp.float32)
        y = jnp.asarray(rng.randn(16, 2), jnp.float32)
        opt0 = tx.init(w0)

        w1, _, loss1 = jax.jit(step)(w0, opt0, x, y)

        mesh = make_mesh()
        repl, shard = replicate(mesh), shard_batch(mesh)
        w0_r = jax.device_put(w0, repl)
        opt0_r = jax.device_put(opt0, repl)
        x_s = jax.device_put(x, shard)
        y_s = jax.device_put(y, shard)
        w2, _, loss2 = jax.jit(step)(w0_r, opt0_r, x_s, y_s)

        np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-6)
        np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)


class TestEnlargedSampler:
    def test_rank_sharding_covers_dataset(self):
        n, world = 10, 4
        samplers = [EnlargedSampler(n, world, r, ratio=2) for r in range(world)]
        for s in samplers:
            s.set_epoch(3)
        all_idx = np.concatenate([s.indices() for s in samplers])
        assert len(all_idx) == samplers[0].total_size
        assert set(all_idx) <= set(range(n))

    def test_epoch_determinism(self):
        s = EnlargedSampler(100, 2, 0)
        s.set_epoch(5)
        a = s.indices()
        s.set_epoch(5)
        np.testing.assert_array_equal(s.indices(), a)
        s.set_epoch(6)
        assert not np.array_equal(s.indices(), a)


class TestDryrunEntry:
    def test_dryrun_multichip_smoke(self):
        import __graft_entry__ as g

        g.dryrun_multichip(4)
