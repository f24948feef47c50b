"""Modulated deformable conv oracle tests (SURVEY.md §4 oracle (c)):
XLA implementation vs a literal per-pixel numpy port of the CUDA kernel
math, plus identity/zero-offset reductions and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from glare_tpu.ops.dcn import (
    deform_conv,
    modulated_deform_conv,
    modulated_deform_conv_naive,
)


def make_inputs(seed=0, B=1, H=5, W=6, C=4, O=3, G=2, off_scale=1.5):
    rng = np.random.RandomState(seed)
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    offset = (off_scale * rng.standard_normal((B, H, W, G, 9, 2))).astype(np.float32)
    mask = rng.uniform(0.0, 1.0, (B, H, W, G, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, C, O)).astype(np.float32) * 0.2
    bias = rng.standard_normal((O,)).astype(np.float32)
    return x, offset, mask, weight, bias


class TestModulatedDeformConv:
    def test_matches_naive_oracle(self):
        x, offset, mask, weight, bias = make_inputs()
        got = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
        want = modulated_deform_conv_naive(x, offset, mask, weight, bias)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_large_offsets_out_of_range_are_zero(self):
        x, offset, mask, weight, bias = make_inputs(off_scale=50.0)
        got = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
        want = modulated_deform_conv_naive(x, offset, mask, weight, bias)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_zero_offset_unit_mask_equals_conv(self):
        """offset=0, mask=1 must reduce to a plain 3x3 conv."""
        rng = np.random.RandomState(3)
        x = rng.standard_normal((2, 6, 7, 4)).astype(np.float32)
        weight = rng.standard_normal((3, 3, 4, 5)).astype(np.float32)
        offset = np.zeros((2, 6, 7, 2, 9, 2), np.float32)
        mask = np.ones((2, 6, 7, 2, 9), np.float32)
        got = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight)
        )
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_integer_offset_is_shift(self):
        """A constant integer offset samples the shifted image exactly."""
        rng = np.random.RandomState(4)
        x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        # 1x1 kernel, single tap, shift by (+2, +1)
        weight = np.zeros((1, 1, 2, 2), np.float32)
        weight[0, 0, 0, 0] = 1.0
        weight[0, 0, 1, 1] = 1.0
        offset = np.zeros((1, 8, 8, 1, 1, 2), np.float32)
        offset[..., 0] = 2.0
        offset[..., 1] = 1.0
        mask = np.ones((1, 8, 8, 1, 1), np.float32)
        got = np.asarray(
            modulated_deform_conv(
                jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                jnp.asarray(weight), padding=0,
            )
        )
        np.testing.assert_allclose(got[0, :6, :7], x[0, 2:, 1:], atol=1e-5)
        # out-of-range tail is zero
        assert np.abs(got[0, 6:, :]).max() == 0

    def test_gradients_flow_to_all_inputs(self):
        x, offset, mask, weight, bias = make_inputs(B=1, H=4, W=4)

        def loss(x, offset, mask, weight, bias):
            out = modulated_deform_conv(x, offset, mask, weight, bias)
            return jnp.sum(out ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
        for g, name in zip(grads, ["x", "offset", "mask", "weight", "bias"]):
            assert np.isfinite(np.asarray(g)).all(), name
            assert float(jnp.abs(g).max()) > 0, f"zero grad for {name}"

    def test_offset_gradient_numerically(self):
        """Finite-difference check of d out / d offset (col2im_coord parity)."""
        x, offset, mask, weight, bias = make_inputs(B=1, H=4, W=4, off_scale=0.2)
        # keep sample positions away from the integer lattice, where the
        # bilinear gradient is discontinuous and FD is invalid
        offset = offset + 0.5

        def loss(off):
            out = modulated_deform_conv(
                jnp.asarray(x), off, jnp.asarray(mask), jnp.asarray(weight)
            )
            return jnp.sum(out * out)

        g = np.asarray(jax.grad(loss)(jnp.asarray(offset)))
        eps = 1e-3
        rng = np.random.RandomState(0)
        for _ in range(5):
            i = tuple(rng.randint(s) for s in offset.shape)
            op = offset.copy()
            op[i] += eps
            om = offset.copy()
            om[i] -= eps
            fd = (float(loss(jnp.asarray(op))) - float(loss(jnp.asarray(om)))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=2e-3)


class TestChainOp:
    """modulated_deform_conv_chain (clamped dense select-chain) vs the exact
    op inside the clamp region, incl. gradient parity — the training-path
    formulation (backward = dense shifted pads, no gathers)."""

    def _inputs(self, seed=0, off_scale=1.2, C=8, G=4, off_cap=None):
        x, offset, mask, weight, bias = make_inputs(
            seed=seed, B=2, H=6, W=7, C=C, O=5, G=G, off_scale=off_scale)
        if off_cap is not None:
            offset = np.clip(offset, -off_cap, off_cap)
        return x, offset, mask, weight, bias

    def test_matches_exact_within_clamp(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_chain

        x, offset, mask, weight, bias = self._inputs(off_scale=1.2, off_cap=1.9)
        got = modulated_deform_conv_chain(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2)
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_clamps_large_offsets(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_chain

        x, offset, mask, weight, bias = self._inputs(off_scale=10.0)
        got = modulated_deform_conv_chain(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2)
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(np.clip(offset, -2, 2)),
            jnp.asarray(mask), jnp.asarray(weight), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_configurable_radius(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_chain

        x, offset, mask, weight, bias = self._inputs(off_scale=3.0)
        got = modulated_deform_conv_chain(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=4)
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(np.clip(offset, -4, 4)),
            jnp.asarray(mask), jnp.asarray(weight), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_exact_op(self):
        """Inside the clamp (strictly), d chain == d exact for every input —
        the col2im / col2im_coord math without kernels or gathers."""
        from glare_tpu.ops.dcn import modulated_deform_conv_chain

        x, offset, mask, weight, bias = self._inputs(off_scale=0.4, off_cap=1.5)
        offset = offset + 0.3  # keep off the integer lattice
        args = tuple(jnp.asarray(a) for a in (x, offset, mask, weight, bias))

        def loss_chain(*a):
            return jnp.sum(modulated_deform_conv_chain(*a, max_offset=2) ** 2)

        def loss_exact(*a):
            return jnp.sum(modulated_deform_conv(*a) ** 2)

        g1 = jax.grad(loss_chain, argnums=(0, 1, 2, 3, 4))(*args)
        g2 = jax.grad(loss_exact, argnums=(0, 1, 2, 3, 4))(*args)
        for a, b, name in zip(g1, g2, ["x", "offset", "mask", "weight", "bias"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
                err_msg=f"grad mismatch for {name}")
            assert float(jnp.abs(b).max()) > 0, name

    def test_clamp_blocks_offset_gradient_outside(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_chain

        x, offset, mask, weight, bias = self._inputs()
        offset = np.full_like(offset, 3.0)  # everywhere beyond the clamp

        def loss(off):
            return jnp.sum(modulated_deform_conv_chain(
                jnp.asarray(x), off, jnp.asarray(mask), jnp.asarray(weight),
                max_offset=2) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(offset)))
        assert np.abs(g).max() == 0.0


class TestHybridOp:
    """modulated_deform_conv_hybrid: clamped base path + compacted exact
    gather for out-of-band pixels. The key property is EXACT equality with
    the unbounded gather op even for offsets far beyond the clamp radius,
    as long as the out-of-band pixel fraction fits the capacity."""

    def _inputs(self, seed=0, off_scale=1.2, B=2, H=6, W=7):
        return make_inputs(seed=seed, B=B, H=H, W=W, C=8, O=5, G=4,
                           off_scale=off_scale)

    def test_exact_with_large_offsets(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_hybrid

        # off_scale 3.0 pushes a large fraction of taps beyond R=2
        x, offset, mask, weight, bias = self._inputs(off_scale=3.0)
        got = modulated_deform_conv_hybrid(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2,
            capacity_frac=1.0)
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_exact_with_sparse_tail_and_small_capacity(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_hybrid

        # in-band offsets everywhere except a handful of injected outliers:
        # the realistic regime the op is designed for
        x, offset, mask, weight, bias = self._inputs(off_scale=1.0, B=2,
                                                     H=10, W=12)
        offset = np.clip(offset, -1.9, 1.9)
        rng = np.random.RandomState(7)
        for _ in range(6):
            b, h, w = rng.randint(2), rng.randint(10), rng.randint(12)
            offset[b, h, w, rng.randint(4), rng.randint(9)] = (
                rng.uniform(3.0, 9.0, 2) * rng.choice([-1.0, 1.0], 2))
        got = modulated_deform_conv_hybrid(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2,
            capacity_frac=0.6)  # 6 outlier pixels << 0.6 * 240
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_all_in_band_matches_chain(self):
        from glare_tpu.ops.dcn import (
            modulated_deform_conv_chain, modulated_deform_conv_hybrid)

        x, offset, mask, weight, bias = self._inputs(off_scale=1.0)
        offset = np.clip(offset, -1.9, 1.9)
        got = modulated_deform_conv_hybrid(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2)
        want = modulated_deform_conv_chain(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_overflow_degrades_to_clamp(self):
        from glare_tpu.ops.dcn import (
            modulated_deform_conv_chain, modulated_deform_conv_hybrid)

        # every pixel out-of-band but capacity holds only the first 128
        # (min capacity): overflow pixels must keep the clamped value —
        # graceful degradation, never zeros or garbage
        x, offset, mask, weight, bias = self._inputs(off_scale=20.0, B=2,
                                                     H=12, W=14)
        offset = np.sign(offset) * np.maximum(np.abs(offset), 5.0)
        got = np.asarray(modulated_deform_conv_hybrid(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2,
            capacity_frac=0.001))
        exact = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias)))
        clamped = np.asarray(modulated_deform_conv_chain(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2))
        flat_g = got.reshape(-1, got.shape[-1])
        flat_e = exact.reshape(-1, got.shape[-1])
        flat_c = clamped.reshape(-1, got.shape[-1])
        # first 128 pixels (row-major cumsum order) are exact
        np.testing.assert_allclose(flat_g[:128], flat_e[:128],
                                   rtol=1e-4, atol=1e-4)
        # the rest fall back to the clamped value
        np.testing.assert_allclose(flat_g[128:], flat_c[128:],
                                   rtol=1e-4, atol=1e-4)

    def test_matches_naive_oracle(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_hybrid

        x, offset, mask, weight, bias = make_inputs(off_scale=4.0)
        got = modulated_deform_conv_hybrid(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2,
            capacity_frac=1.0)
        want = modulated_deform_conv_naive(x, offset, mask, weight, bias)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_chunked_tail(self):
        from glare_tpu.ops.dcn import modulated_deform_conv_hybrid

        # pixels_per_chunk smaller than the compacted buffer exercises the
        # lax.map chunking of the exact tail
        x, offset, mask, weight, bias = self._inputs(off_scale=5.0, B=2,
                                                     H=12, W=14)
        got = modulated_deform_conv_hybrid(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), max_offset=2,
            capacity_frac=1.0, pixels_per_chunk=64)
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestCudaGolden:
    """glare_tpu op vs the torch-layout CUDA-indexing golden (golden_dcn.py).

    The comparison routes the raw conv_offset channel packing through
    tools/torch2flax.dcn_offset_permutation, so it validates both the op
    math (incl. border bilinear weights and mask modulation) and the
    checkpoint channel mapping against deform_conv_cuda_kernel.cu:571-632.
    """

    @staticmethod
    def _torch_and_ours(seed, B=2, H=5, W=6, C=4, O=3, G=2, off_scale=1.5):
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.torch2flax import dcn_offset_permutation

        rng = np.random.RandomState(seed)
        K = 9
        x_nchw = rng.standard_normal((B, C, H, W)).astype(np.float32)
        raw = (off_scale * rng.standard_normal((B, 3 * G * K, H, W))).astype(np.float32)
        w_oihw = (0.2 * rng.standard_normal((O, C, 3, 3))).astype(np.float32)
        bias = rng.standard_normal((O,)).astype(np.float32)

        # torch DCNv2Pack.forward packing: offset = raw[:2GK], mask = sigmoid(raw[2GK:])
        off_torch = raw[:, : 2 * G * K]
        mask_torch = 1.0 / (1.0 + np.exp(-raw[:, 2 * G * K :]))

        # ours via the converter's channel permutation
        perm = dcn_offset_permutation(G, K)
        packed = raw[:, perm]  # [B, 3GK, H, W] as [dy | dx | mask]
        def grp(a):  # [B, GK, H, W] -> [B, H, W, G, K]
            return a.reshape(B, G, K, H, W).transpose(0, 3, 4, 1, 2)
        off_ours = np.stack([grp(packed[:, : G * K]), grp(packed[:, G * K : 2 * G * K])], axis=-1)
        mask_ours = 1.0 / (1.0 + np.exp(-grp(packed[:, 2 * G * K :])))

        x_nhwc = x_nchw.transpose(0, 2, 3, 1)
        w_hwio = w_oihw.transpose(2, 3, 1, 0)
        return (x_nchw, off_torch, mask_torch, w_oihw, bias, G), (
            x_nhwc, off_ours, mask_ours, w_hwio, bias)

    def _check(self, seed, off_scale):
        from golden_dcn import modulated_deform_conv_golden

        torch_args, ours_args = self._torch_and_ours(seed, off_scale=off_scale)
        x, off, m, w, b, G = torch_args
        want = modulated_deform_conv_golden(x, off, m, w, b, deformable_groups=G)
        got = modulated_deform_conv(*(jnp.asarray(a) for a in ours_args))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4)

    def test_matches_cuda_golden(self):
        self._check(seed=0, off_scale=1.5)

    def test_matches_cuda_golden_large_offsets(self):
        """Out-of-range samples must zero out exactly as the CUDA kernel."""
        self._check(seed=1, off_scale=40.0)

    def test_golden_agrees_with_naive_oracle(self):
        """The two independent oracles must agree with each other."""
        from golden_dcn import modulated_deform_conv_golden

        torch_args, ours_args = self._torch_and_ours(seed=2)
        x, off, m, w, b, G = torch_args
        golden = modulated_deform_conv_golden(x, off, m, w, b, deformable_groups=G)
        naive = modulated_deform_conv_naive(*ours_args)
        np.testing.assert_allclose(naive.transpose(0, 3, 1, 2), golden, rtol=1e-6, atol=1e-6)

    def test_fast_golden_agrees_with_literal_golden(self):
        """The vectorized golden (used at protocol geometry where the
        per-pixel literal transcription is infeasible) must match it."""
        from golden_dcn import (modulated_deform_conv_golden,
                                modulated_deform_conv_golden_fast)

        for seed, off_scale in ((3, 1.5), (4, 40.0)):
            torch_args, _ = self._torch_and_ours(seed=seed,
                                                 off_scale=off_scale)
            x, off, m, w, b, G = torch_args
            slow = modulated_deform_conv_golden(x, off, m, w, b,
                                                deformable_groups=G)
            fast = modulated_deform_conv_golden_fast(x, off, m, w, b,
                                                     deformable_groups=G)
            np.testing.assert_allclose(fast, slow, rtol=1e-9, atol=1e-9)


class TestDeformConvV1:
    def test_matches_modulated_with_unit_mask(self):
        x, offset, _, weight, bias = make_inputs()
        got = deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight), jnp.asarray(bias)
        )
        mask = np.ones(offset.shape[:-1], np.float32)
        want = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
