"""Gather-free flow-warp alignment: oracle parity, identity/shift behavior,
gradients, and the flow-mode WarpBlock."""

import jax
import jax.numpy as jnp
import numpy as np

from glare_tpu.ops.warp import flow_warp_align, flow_warp_align_ref


class TestFlowWarpAlign:
    def test_matches_naive_oracle(self):
        rng = np.random.RandomState(0)
        x = rng.standard_normal((1, 6, 7, 8)).astype(np.float32)
        flow = (1.5 * rng.standard_normal((1, 6, 7, 4, 2))).astype(np.float32)
        got = flow_warp_align(jnp.asarray(x), jnp.asarray(flow), max_offset=2)
        want = flow_warp_align_ref(x, flow, max_offset=2)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_zero_flow_is_identity(self):
        x = jnp.asarray(np.random.RandomState(1).rand(1, 5, 5, 4), jnp.float32)
        flow = jnp.zeros((1, 5, 5, 2, 2))
        np.testing.assert_allclose(
            np.asarray(flow_warp_align(x, flow)), np.asarray(x), atol=1e-6
        )

    def test_integer_flow_is_shift(self):
        x = jnp.asarray(np.random.RandomState(2).rand(1, 6, 6, 2), jnp.float32)
        flow = jnp.ones((1, 6, 6, 1, 2))  # shift (+1, +1), zero at borders
        out = np.asarray(flow_warp_align(x, flow, max_offset=1))
        np.testing.assert_allclose(out[0, :5, :5], np.asarray(x)[0, 1:, 1:], atol=1e-6)
        assert np.abs(out[0, 5, :]).max() < 1e-6

    def test_gradients_to_flow_and_x(self):
        x = jnp.asarray(np.random.RandomState(3).rand(1, 5, 5, 4), jnp.float32)
        flow = jnp.full((1, 5, 5, 2, 2), 0.3)

        def loss(x, flow):
            return jnp.sum(flow_warp_align(x, flow) ** 2)

        gx, gf = jax.grad(loss, argnums=(0, 1))(x, flow)
        assert float(jnp.abs(gx).max()) > 0
        assert float(jnp.abs(gf).max()) > 0
        assert np.isfinite(np.asarray(gx)).all() and np.isfinite(np.asarray(gf)).all()


class TestWarpBlockFlowMode:
    def test_flow_mode_forward(self):
        from glare_tpu.modules.deformable_decoder import WarpBlock

        m = WarpBlock(warp_mode="flow")
        x_vq = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 64))
        h = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64))
        params = m.init(jax.random.PRNGKey(2), x_vq, h)
        out = m.apply(params, x_vq, h)
        assert out.shape == x_vq.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_stage3_net_flow_mode(self):
        from glare_tpu.modules.vqllflow_deformable import VQLLFLOWDeformable
        from glare_tpu.modules.vqmodel import VQModel

        netG = VQLLFLOWDeformable(K=2, warp_mode="flow")
        vq = VQModel(vq_backend="ref")
        lr = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        vq_params = vq.init(jax.random.PRNGKey(1), lr)
        params = netG.init(jax.random.PRNGKey(2), lr, method=VQLLFLOWDeformable.latent_half)
        x, lr_enc = netG.apply(params, lr, method=VQLLFLOWDeformable.latent_half)
        _, _, code = vq.apply(vq_params, x, method=vq.decode)
        aft_params = netG.init(
            jax.random.PRNGKey(3), x, code, lr_enc["mid_feat"],
            method=VQLLFLOWDeformable.aft_half,
        )
        merged = {"params": {**params["params"], **aft_params["params"]}}
        out = netG.apply(merged, x, code, lr_enc["mid_feat"],
                         method=VQLLFLOWDeformable.aft_half)
        assert out.shape == (1, 32, 32, 3)


class TestConfigurableRadius:
    """network_G.dcn_max_offset plumbing: DCNv2Pack(max_offset=R) must reach
    the clamped op (pallas/chain impls)."""

    @staticmethod
    def _run(r, offset_bias):
        from glare_tpu.modules.deformable_decoder import DCNv2Pack

        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 8))
        feat = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 8))
        m = DCNv2Pack(8, deformable_groups=4, impl="chain", max_offset=r)
        params = m.init(jax.random.PRNGKey(2), x, feat)
        co = params["params"]["conv_offset"]
        # conv_offset kernel is zero-init, so offsets == broadcast bias
        n = co["bias"].shape[0]
        co["bias"] = co["bias"].at[: 2 * n // 3].set(offset_bias)
        out, st = m.apply(
            params, x, feat,
            capture_intermediates=lambda mdl, nm: nm == "offsets",
            mutable=["intermediates"])
        return np.asarray(out), np.asarray(st["intermediates"]["offsets"][0])

    def test_radius_reaches_op_when_offsets_exceed_2(self):
        out2, offs = self._run(2, 3.0)
        out4, _ = self._run(4, 3.0)
        assert offs.max() == 3.0  # past the default clamp, inside R=4
        assert np.abs(out4 - out2).max() > 1e-4

    def test_radii_agree_inside_both_clamps(self):
        out2, offs = self._run(2, 1.5)
        out4, _ = self._run(4, 1.5)
        assert offs.max() == 1.5
        np.testing.assert_allclose(out2, out4, atol=1e-5)


class TestOffsetObservability:
    def test_offset_capture_and_stats(self):
        """DCNv2Pack sows its raw offsets; tools/offset_histogram captures
        them and the stats reflect the actual distribution (clamp-safety
        evidence path, round-2 verdict #4)."""
        import jax.numpy as jnp

        from glare_tpu.modules.deformable_decoder import DCNv2Pack
        from tools.offset_histogram import offset_stats

        m = DCNv2Pack(8, deformable_groups=4, impl="chain")
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 8))
        feat = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 8))
        params = m.init(jax.random.PRNGKey(2), x, feat)
        # push conv_offset away from zero-init so offsets are non-trivial
        params = jax.tree_util.tree_map(lambda a: a, params)
        co = params["params"]["conv_offset"]
        co["bias"] = co["bias"].at[:].set(
            jnp.asarray(np.linspace(-3, 3, co["bias"].shape[0]), jnp.float32))
        _, st = m.apply(params, x, feat,
                        capture_intermediates=lambda mdl, nm: nm == "offsets",
                        mutable=["intermediates"])
        offs = np.asarray(st["intermediates"]["offsets"][0])
        assert offs.shape == (1, 8, 8, 4, 9, 2)
        stats = offset_stats(offs)
        assert stats["max"] > 2.0  # bias pushes past the clamp
        assert stats["frac_exceed"]["2"] > 0
        assert stats["frac_exceed"]["8"] == 0
