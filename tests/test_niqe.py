"""NIQE metric tests (reference CLI: defor_cuda_ext/basicsr/metrics/calculate_niqe.py,
which imports a never-vendored basicsr.metrics — our implementation is the
working equivalent; see glare_tpu/utils/niqe.py)."""

import numpy as np
import pytest

from glare_tpu.utils.niqe import (
    calculate_niqe,
    estimate_aggd_param,
    estimate_ggd_param,
    fit_niqe_params,
    load_niqe_params,
    niqe,
)


def _natural_like(rng, h=192, w=192):
    """Smooth 1/f-ish field: structured like a photograph, unlike iid noise."""
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.rand(h, w), 6.0)
    detail = gaussian_filter(rng.rand(h, w), 1.5)
    img = 0.7 * base + 0.3 * detail
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return np.round(img * 255.0)


class TestDistributionFits:
    def test_ggd_recovers_gaussian(self):
        # alpha=2 is the Gaussian member of the GGD family
        rng = np.random.RandomState(0)
        vec = rng.randn(200000)
        alpha, sigma = estimate_ggd_param(vec)
        assert abs(alpha - 2.0) < 0.1
        assert abs(sigma - 1.0) < 0.02

    def test_ggd_recovers_laplacian(self):
        # alpha=1 is the Laplacian member
        rng = np.random.RandomState(1)
        vec = rng.laplace(size=200000)
        alpha, _ = estimate_ggd_param(vec)
        assert abs(alpha - 1.0) < 0.1

    def test_aggd_symmetric_case(self):
        rng = np.random.RandomState(2)
        vec = rng.randn(200000)
        alpha, beta_l, beta_r = estimate_aggd_param(vec)
        assert abs(alpha - 2.0) < 0.15
        assert abs(beta_l - beta_r) < 0.05

    def test_aggd_detects_asymmetry(self):
        rng = np.random.RandomState(3)
        vec = rng.randn(200000)
        vec[vec < 0] *= 2.0  # heavier left tail
        _, beta_l, beta_r = estimate_aggd_param(vec)
        assert beta_l > beta_r * 1.5


class TestNiqeScore:
    @pytest.fixture(scope="class")
    def pris(self):
        rng = np.random.RandomState(42)
        return fit_niqe_params([_natural_like(rng) for _ in range(8)])

    def test_noise_scores_worse_than_natural(self, pris):
        mu, cov = pris
        rng = np.random.RandomState(7)
        natural = _natural_like(rng)
        noise = np.round(rng.rand(192, 192) * 255.0)
        s_nat = niqe(natural, mu, cov)
        s_noise = niqe(noise, mu, cov)
        assert np.isfinite(s_nat) and np.isfinite(s_noise)
        assert s_noise > s_nat, (s_noise, s_nat)

    def test_calculate_niqe_surface(self, pris):
        # basicsr surface: uint8 HWC BGR in, convert_to='y', crop_border
        rng = np.random.RandomState(8)
        gray = _natural_like(rng, 224, 224)
        bgr = np.stack([gray, gray, gray], axis=-1).astype(np.uint8)
        s = calculate_niqe(bgr, crop_border=16, pris_params=pris)
        assert np.isfinite(s)

    def test_registry_dispatch(self, pris):
        from glare_tpu.sr.metrics import build_metric

        fn = build_metric("calculate_niqe")
        rng = np.random.RandomState(9)
        gray = _natural_like(rng)
        bgr = np.stack([gray, gray, gray], axis=-1).astype(np.uint8)
        assert np.isfinite(fn(bgr, pris_params=pris))

    def test_param_file_roundtrip(self, pris, tmp_path):
        mu, cov = pris
        path = tmp_path / "niqe_pris_params.npz"
        np.savez(path, mu_pris_param=mu, cov_pris_param=cov)
        mu2, cov2 = load_niqe_params(str(path))
        np.testing.assert_allclose(mu2, mu)
        np.testing.assert_allclose(cov2, cov)
        s = calculate_niqe(
            np.stack([_natural_like(np.random.RandomState(10))] * 3, -1).astype(np.uint8),
            pris_params=(mu2, cov2),
        )
        assert np.isfinite(s)

    def test_informative_error_without_params(self, monkeypatch):
        monkeypatch.delenv("GLARE_NIQE_PARAMS", raising=False)
        with pytest.raises(NotImplementedError, match="GLARE_NIQE_PARAMS"):
            calculate_niqe(np.zeros((128, 128, 3), np.uint8))

    def test_too_small_image_raises(self, pris):
        with pytest.raises(ValueError, match="smaller"):
            niqe(np.zeros((64, 64)), *pris)
