"""Property tests for the flow stack: exact invertibility, logdet
antisymmetry, data-dependent ActNorm init (SURVEY.md §4 oracles (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glare_tpu.modules.flow_layers import (
    ActNorm2d,
    InvertibleConv1x1,
    GaussianDiag,
    squeeze2d,
    unsqueeze2d,
    merge_actnorm_init,
    pixels,
)
from glare_tpu.modules.coupling import CondAffineSeparatedAndCond
from glare_tpu.modules.flow_step import FlowStep
from glare_tpu.modules.flow_upsampler import FlowUpsamplerNet


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestActNorm:
    def test_roundtrip_and_logdet(self):
        x = rand(0, (2, 8, 8, 3))
        m = ActNorm2d(3)
        params = m.init(jax.random.PRNGKey(1), x)
        # perturb params away from zero
        params = jax.tree.map(lambda p: p + 0.3, params)
        ld0 = jnp.zeros((2,))
        y, ld_f = m.apply(params, x, ld0, reverse=False)
        x2, ld_b = m.apply(params, y, ld_f, reverse=True)
        np.testing.assert_allclose(x2, x, atol=1e-5)
        np.testing.assert_allclose(ld_b, ld0, atol=1e-4)

    def test_data_dependent_init(self):
        x = 3.0 + 2.0 * rand(0, (4, 8, 8, 3))
        m = ActNorm2d(3)
        params = m.init(jax.random.PRNGKey(1), x)
        (y, _), stats = m.apply(
            params, x, None, reverse=False, ddinit=True, mutable=["actnorm_init"]
        )
        # output should be ~zero-mean unit-variance per channel
        np.testing.assert_allclose(np.mean(np.asarray(y), axis=(0, 1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.std(np.asarray(y), axis=(0, 1, 2)), 1.0, atol=1e-3)
        merged = {"params": merge_actnorm_init(params["params"], stats["actnorm_init"])}
        y2, _ = m.apply(merged, x, None, reverse=False)
        np.testing.assert_allclose(y2, y, atol=1e-6)


class TestInvConv:
    def test_roundtrip_logdet(self):
        x = rand(0, (2, 6, 6, 3))
        m = InvertibleConv1x1(3)
        params = m.init(jax.random.PRNGKey(7), x)
        ld0 = jnp.zeros((2,))
        y, ld_f = m.apply(params, x, ld0, reverse=False)
        x2, ld_b = m.apply(params, y, ld_f, reverse=True)
        np.testing.assert_allclose(x2, x, atol=1e-5)
        np.testing.assert_allclose(ld_b, ld0, atol=1e-4)

    def test_logdet_matches_slogdet(self):
        x = rand(0, (1, 4, 4, 3))
        m = InvertibleConv1x1(3)
        params = m.init(jax.random.PRNGKey(7), x)
        w = params["params"]["weight"]
        _, ld = m.apply(params, x, jnp.zeros((1,)), reverse=False)
        expect = np.linalg.slogdet(np.asarray(w))[1] * 16
        np.testing.assert_allclose(ld[0], expect, atol=1e-4)


class TestCoupling:
    def test_roundtrip(self):
        z = rand(0, (2, 8, 8, 3))
        ft = rand(1, (2, 8, 8, 64))
        m = CondAffineSeparatedAndCond(in_channels=3, in_channels_rrdb=64)
        params = m.init(jax.random.PRNGKey(2), z, ft=ft)
        # make the transform non-trivial
        params = jax.tree.map(
            lambda p: p + 0.05 * np.random.RandomState(0).standard_normal(p.shape).astype(np.float32),
            params,
        )
        ld0 = jnp.zeros((2,))
        y, ld_f = m.apply(params, z, ld0, reverse=False, ft=ft)
        z2, ld_b = m.apply(params, y, ld_f, reverse=True, ft=ft)
        np.testing.assert_allclose(z2, z, atol=1e-4)
        np.testing.assert_allclose(ld_b, ld0, atol=1e-3)

    def test_zero_init_is_near_identity(self):
        """Conv2dZeros head means fresh coupling shift=0, scale=sigmoid(2)+eps."""
        z = rand(0, (1, 8, 8, 3))
        ft = rand(1, (1, 8, 8, 64))
        m = CondAffineSeparatedAndCond(in_channels=3, in_channels_rrdb=64)
        params = m.init(jax.random.PRNGKey(2), z, ft=ft)
        y, _ = m.apply(params, z, jnp.zeros((1,)), reverse=False, ft=ft)
        s = jax.nn.sigmoid(2.0) + 1e-4
        z_np = np.asarray(z)
        # z1 (1 ch) scaled once by the feature-conditional scale; z2 (2 ch) twice
        expect = np.concatenate([z_np[..., :1] * s, z_np[..., 1:] * s * s], axis=-1)
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)


class TestFlowStep:
    @pytest.mark.parametrize("coupling", ["CondAffineSeparatedAndCond", "noCoupling"])
    def test_roundtrip(self, coupling):
        z = rand(0, (2, 8, 8, 3))
        ft = rand(1, (2, 8, 8, 64))
        m = FlowStep(in_channels=3, flow_coupling=coupling)
        params = m.init(jax.random.PRNGKey(3), z, ft=ft)
        ld0 = jnp.zeros((2,))
        y, ld_f = m.apply(params, z, ld0, reverse=False, ft=ft)
        z2, ld_b = m.apply(params, y, ld_f, reverse=True, ft=ft)
        np.testing.assert_allclose(z2, z, atol=1e-4)
        np.testing.assert_allclose(ld_b, ld0, atol=1e-3)


class TestFlowUpsamplerNet:
    def test_full_net_invertible(self):
        """GLARE config: L=2, K=12, 2 no-affine steps -> 28 steps, C=3."""
        gt = rand(0, (1, 8, 8, 3))
        ft = rand(1, (1, 8, 8, 64))
        net = FlowUpsamplerNet(K=3, L=2)  # smaller K for test speed
        params = net.init(jax.random.PRNGKey(4), gt, {"cond_feat": ft})
        ld0 = jnp.zeros((1,))
        z, ld_f = net.apply(params, gt, {"cond_feat": ft}, logdet=ld0, reverse=False)
        gt2, ld_b = net.apply(params, z, {"cond_feat": ft}, logdet=ld_f, reverse=True)
        np.testing.assert_allclose(np.asarray(gt2), np.asarray(gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld_b), np.asarray(ld0), atol=1e-2)

    def test_step_count_matches_reference_graph(self):
        """(2 + K) * L FlowSteps (reference FlowUpsamplerNet.py:95-109)."""
        net = FlowUpsamplerNet(K=12, L=2)
        gt = rand(0, (1, 8, 8, 3))
        ft = rand(1, (1, 8, 8, 64))
        params = net.init(jax.random.PRNGKey(4), gt, {"cond_feat": ft})
        step_names = [k for k in params["params"].keys() if k.startswith("layers_")]
        assert len(step_names) == (2 + 12) * 2

    def test_ddinit_then_invertible(self):
        gt = 2.0 + rand(0, (2, 8, 8, 3))
        ft = rand(1, (2, 8, 8, 64))
        net = FlowUpsamplerNet(K=2, L=1)
        params = net.init(jax.random.PRNGKey(4), gt, {"cond_feat": ft})
        (z, _), stats = net.apply(
            params, gt, {"cond_feat": ft}, reverse=False, ddinit=True,
            mutable=["actnorm_init"],
        )
        merged = {"params": merge_actnorm_init(params["params"], stats["actnorm_init"])}
        z2, _ = net.apply(merged, gt, {"cond_feat": ft}, reverse=False)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-5)
        gt2, _ = net.apply(merged, z2, {"cond_feat": ft}, reverse=True)
        np.testing.assert_allclose(np.asarray(gt2), np.asarray(gt), atol=1e-4)


class TestSqueeze:
    def test_roundtrip_and_channel_order(self):
        x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
        y = squeeze2d(x, 2)
        assert y.shape == (2, 2, 2, 12)
        x2 = unsqueeze2d(y, 2)
        np.testing.assert_array_equal(x2, x)
        # channel order (C, fy, fx): y[...,c*4 + fy*2 + fx] == x[2i+fy, 2j+fx, c]
        np.testing.assert_array_equal(y[0, 0, 0, 0 * 4 + 1 * 2 + 0], x[0, 1, 0, 0])
        np.testing.assert_array_equal(y[0, 0, 0, 2 * 4 + 0 * 2 + 1], x[0, 0, 1, 2])


class TestGaussianDiag:
    def test_logp_zero_logs(self):
        x = rand(0, (2, 4, 4, 3))
        mean = jnp.zeros_like(x)
        lp = GaussianDiag.logp(mean, jnp.zeros_like(x), x)
        expect = -0.5 * (np.asarray(x) ** 2 + np.log(2 * np.pi)).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(lp), expect, rtol=1e-5)
