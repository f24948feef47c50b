"""Regression tests for the round-4 stage-3 NaN (ssim_loss: nan at iter 1).

Root cause, proven on the real TPU chip (round-5 repro): the depthwise
window convs feeding E[x^2]-mu^2 ran at the TPU's default f32 conv
precision (bf16 multiplies, ~8e-3 relative error), so the variance
estimates went negative by ~1.4e-3 — far beyond C2 = 9e-4 — making
v2 = sigma1+sigma2+C2 negative and |cs| >> 1; the normalize-mode
(cs+1)/2 then handed a negative base to a fractional pow -> NaN.
Measured pre-fix on TPU at 256px: min sigma_sq = -1.42e-3,
min v2 = -3.38e-4, max |v1/v2| = 91.0.

The fix is threefold (modules/msssim.py): Precision.HIGHEST on the
window convs, variance clamped >= 0 (true in exact arithmetic), and a
tiny positive floor on the pow bases. These tests pin each layer of the
defence; they run on CPU, where the precision bug itself cannot
reproduce, so the combination test injects the out-of-range cs directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glare_tpu.modules.msssim import _combine, msssim, ssim


WEIGHTS = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], jnp.float32)


def _adversarial_pair(hw=128, seed=0):
    """Anti-correlated structured pair: cs driven toward -1 (the worst
    legal value), which is the regime the TPU rounding pushed past -1."""
    rng = np.random.RandomState(seed)
    yy = np.mgrid[0:hw, 0:hw][0].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(yy / 7.0)[:, :, None] * np.ones((hw, hw, 3), np.float32)
    a = np.clip(base + 0.05 * rng.rand(hw, hw, 3), 0, 1).astype(np.float32)
    b = np.clip(1.0 - base + 0.05 * rng.rand(hw, hw, 3), 0, 1).astype(np.float32)
    return jnp.asarray(a[None]), jnp.asarray(b[None])


class TestCombinationSafePow:
    def test_out_of_range_cs_stays_finite(self):
        """The exact failure point: a level cs < -1 (seen on TPU: -91)
        must not NaN the combination in normalize mode."""
        mssim = jnp.asarray([0.2, 0.3, 0.5, 0.7, 0.9])
        for bad_cs in (-1.5, -91.0, -0.01):
            mcs = jnp.asarray([bad_cs, 0.4, 0.6, 0.8, 0.9])
            val = _combine(mssim, mcs, WEIGHTS, normalize=True)
            assert np.isfinite(float(val)), f"cs={bad_cs} NaN'd the loss"

    def test_out_of_range_ssim_stays_finite(self):
        mcs = jnp.asarray([0.4, 0.4, 0.6, 0.8, 0.9])
        mssim = jnp.asarray([0.2, 0.3, 0.5, 0.7, -1.2])
        assert np.isfinite(float(_combine(mssim, mcs, WEIGHTS, normalize=True)))

    def test_gradient_finite_at_the_floor(self):
        """d/dx x^w is infinite at x=0 for w<1; the floor must keep the
        backward pass finite too (the loss is trained through)."""
        mssim = jnp.asarray([0.2, 0.3, 0.5, 0.7, 0.9])

        def f(cs0):
            mcs = jnp.concatenate([cs0[None], jnp.asarray([0.4, 0.6, 0.8, 0.9])])
            return _combine(mssim, mcs, WEIGHTS, normalize=True)

        for bad in (-1.5, -1.0, -0.999999):
            g = jax.grad(f)(jnp.asarray(bad))
            assert np.isfinite(float(g))

    def test_in_range_values_unchanged(self):
        """The floor must not perturb legal inputs: compare against the
        reference combination computed without any clamp."""
        rng = np.random.RandomState(3)
        mssim = jnp.asarray(0.2 + 0.8 * rng.rand(5).astype(np.float32))
        mcs = jnp.asarray(0.2 + 0.8 * rng.rand(5).astype(np.float32))
        got = float(_combine(mssim, mcs, WEIGHTS, normalize=True))
        ms_n, cs_n = (mssim + 1) / 2, (mcs + 1) / 2
        want = float(jnp.prod((cs_n ** WEIGHTS)[:-1] * (ms_n ** WEIGHTS)[-1]))
        assert got == pytest.approx(want, rel=1e-6)


class TestVarianceClamp:
    def test_cs_bounded_on_adversarial_pair(self):
        """With variances clamped >= 0, per-window |v1/v2| is bounded by
        ~1 (Cauchy-Schwarz) instead of the 91x blowup measured pre-fix."""
        a, b = _adversarial_pair()
        _, cs = ssim(a, b, full=True)
        assert -1.05 <= float(cs) <= 1.05

    def test_msssim_and_grad_finite_on_adversarial_pair(self):
        a, b = _adversarial_pair()
        val = msssim(a, b, normalize=True)
        assert np.isfinite(float(val))
        g = jax.grad(lambda x: msssim(x, b, normalize=True))(a)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_constant_images(self):
        """Zero-variance windows: sigma cancels exactly to 0; must stay
        finite in value and gradient."""
        a = jnp.full((1, 64, 64, 3), 0.25, jnp.float32)
        b = jnp.full((1, 64, 64, 3), 0.75, jnp.float32)
        assert np.isfinite(float(msssim(a, b, normalize=True)))
        g = jax.grad(lambda x: msssim(x, b, normalize=True))(a)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestStage3LossGeometry:
    def test_stage3_loss_finite_at_crash_geometry_inputs(self):
        """The failing drive's loss inputs: clipped garbage rec vs
        structured gt at the 256px training crop (anti-correlated, the
        early-training regime). Full loss combination as in
        vqllflowd_model.loss_fn. Slow only in spatial size; one msssim
        call, no model."""
        a, b = _adversarial_pair(hw=256, seed=7)

        def loss(sr):
            l1 = jnp.mean(jnp.abs(sr - b))
            ssim_l = (1.0 - msssim(sr, b, normalize=True)) * 0.2
            return l1 + ssim_l

        val, g = jax.value_and_grad(loss)(a)
        assert np.isfinite(float(val))
        assert bool(jnp.all(jnp.isfinite(g)))
