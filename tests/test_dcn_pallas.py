"""Pallas DCN kernel (experimental backend): interpret-mode parity with the
XLA implementation under offset clamping."""

import numpy as np
import jax.numpy as jnp
import pytest

from glare_tpu.ops.dcn import modulated_deform_conv
from glare_tpu.ops.dcn_pallas import modulated_deform_conv_pallas


class TestPallasDCN:
    @pytest.mark.parametrize("shape", [(1, 6, 140, 8, 2, 16), (2, 5, 130, 16, 4, 8)])
    def test_matches_xla_clamped(self, shape):
        B, H, W, C, G, O = shape
        rng = np.random.RandomState(0)
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        offset = (3.0 * rng.standard_normal((B, H, W, G, 9, 2))).astype(np.float32)
        mask = rng.uniform(0, 1, (B, H, W, G, 9)).astype(np.float32)
        weight = (0.2 * rng.standard_normal((3, 3, C, O))).astype(np.float32)
        want = np.asarray(
            modulated_deform_conv(
                jnp.asarray(x), jnp.asarray(np.clip(offset, -2, 2)),
                jnp.asarray(mask), jnp.asarray(weight),
            )
        )
        got = np.asarray(
            modulated_deform_conv_pallas(
                jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                jnp.asarray(weight), max_offset=2, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_bias(self):
        rng = np.random.RandomState(1)
        x = rng.standard_normal((1, 4, 132, 8)).astype(np.float32)
        offset = np.zeros((1, 4, 132, 2, 9, 2), np.float32)
        mask = np.ones((1, 4, 132, 2, 9), np.float32)
        weight = (0.2 * rng.standard_normal((3, 3, 8, 8))).astype(np.float32)
        bias = rng.standard_normal((8,)).astype(np.float32)
        want = np.asarray(
            modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                  jnp.asarray(mask), jnp.asarray(weight),
                                  jnp.asarray(bias))
        )
        got = np.asarray(
            modulated_deform_conv_pallas(jnp.asarray(x), jnp.asarray(offset),
                                         jnp.asarray(mask), jnp.asarray(weight),
                                         jnp.asarray(bias), max_offset=2,
                                         interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-4)
