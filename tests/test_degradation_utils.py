"""Parity tests for the degradation/IO utility tail against the reference
torch implementations (basicsr/utils/{diffjpeg,img_process_util,flow_util})."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/defor_cuda_ext"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def ref_utils():
    """Import the reference utility modules directly off their files (the
    basicsr package __init__ pulls in heavy/absent deps)."""
    import importlib.util

    mods = {}
    for name in ["diffjpeg", "img_process_util", "flow_util"]:
        spec = importlib.util.spec_from_file_location(
            f"ref_{name}", os.path.join(REF, "basicsr", "utils", f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _img(seed, B=2, H=40, W=56):
    return np.random.RandomState(seed).rand(B, H, W, 3).astype(np.float32)


class TestDiffJPEG:
    @pytest.mark.parametrize("differentiable", [True, False])
    @pytest.mark.parametrize("quality", [20.0, 90.0])
    def test_matches_reference(self, ref_utils, differentiable, quality):
        from glare_tpu.sr.utils.diffjpeg import diff_jpeg

        x = _img(0)
        tm = ref_utils["diffjpeg"].DiffJPEG(differentiable=differentiable).eval()
        with torch.no_grad():
            want = tm(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))), quality=quality)
        got = diff_jpeg(jnp.asarray(x), quality, differentiable=differentiable)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    def test_per_sample_quality_vector(self, ref_utils):
        from glare_tpu.sr.utils.diffjpeg import diff_jpeg

        x = _img(1)
        tm = ref_utils["diffjpeg"].DiffJPEG(differentiable=False).eval()
        tq = torch.tensor([20.0, 75.0])
        with torch.no_grad():
            want = tm(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))), quality=tq.clone())
        got = diff_jpeg(jnp.asarray(x), jnp.asarray([20.0, 75.0]), differentiable=False)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    def test_non_multiple_of_16_and_gradients(self, ref_utils):
        import jax

        from glare_tpu.sr.utils.diffjpeg import diff_jpeg

        x = _img(2, H=37, W=45)
        got = diff_jpeg(jnp.asarray(x), 50.0)
        assert got.shape == x.shape
        g = jax.grad(lambda a: jnp.sum(diff_jpeg(a, 50.0) ** 2))(jnp.asarray(x))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_actually_degrades_like_jpeg(self, ref_utils):
        """Low quality must lose more signal than high quality."""
        from glare_tpu.sr.utils.diffjpeg import diff_jpeg

        # smooth natural-ish image (gradients + a blob), not white noise
        yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
        img = np.stack([xx / 64, yy / 48, np.exp(-((xx - 30) ** 2 + (yy - 20) ** 2) / 200)], -1)
        x = np.clip(img, 0, 1)[None]
        e10 = float(jnp.mean((diff_jpeg(jnp.asarray(x), 10.0, differentiable=False) - x) ** 2))
        e95 = float(jnp.mean((diff_jpeg(jnp.asarray(x), 95.0, differentiable=False) - x) ** 2))
        assert e10 > 5 * e95 > 0


class TestUSM:
    def test_filter2d_matches_reference(self, ref_utils):
        from glare_tpu.sr.utils.img_process_util import filter2D

        x = _img(4)
        k = np.random.RandomState(5).rand(7, 7).astype(np.float32)
        k /= k.sum()
        with torch.no_grad():
            want = ref_utils["img_process_util"].filter2D(
                torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
                torch.from_numpy(k)[None])
        got = filter2D(jnp.asarray(x), jnp.asarray(k))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=1e-5)

    def test_filter2d_per_sample_kernels(self, ref_utils):
        from glare_tpu.sr.utils.img_process_util import filter2D

        x = _img(6)
        k = np.random.RandomState(7).rand(2, 5, 5).astype(np.float32)
        k /= k.sum(axis=(1, 2), keepdims=True)
        with torch.no_grad():
            want = ref_utils["img_process_util"].filter2D(
                torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))), torch.from_numpy(k))
        got = filter2D(jnp.asarray(x), jnp.asarray(k))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=1e-5)

    def test_usmsharp_matches_reference(self, ref_utils):
        from glare_tpu.sr.utils.img_process_util import USMSharp

        x = _img(8, H=64, W=64)
        tm = ref_utils["img_process_util"].USMSharp().eval()
        with torch.no_grad():
            want = tm(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        got = USMSharp()(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=1e-4)

    def test_usm_sharp_numpy_matches_reference(self, ref_utils):
        from glare_tpu.sr.utils.img_process_util import usm_sharp

        img = _img(9, B=1, H=64, W=64)[0]
        want = ref_utils["img_process_util"].usm_sharp(img)
        got = usm_sharp(img)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestFlowUtil:
    def test_flo_roundtrip_and_reference_read(self, ref_utils, tmp_path):
        from glare_tpu.sr.utils.flow_util import flowread, flowwrite

        flow = np.random.RandomState(10).randn(12, 17, 2).astype(np.float32)
        p = str(tmp_path / "a.flo")
        flowwrite(flow, p)
        np.testing.assert_array_equal(flowread(p), flow)
        # cross-readable with the reference implementation
        np.testing.assert_array_equal(ref_utils["flow_util"].flowread(p), flow)
        p2 = str(tmp_path / "b.flo")
        ref_utils["flow_util"].flowwrite(flow, p2)
        np.testing.assert_array_equal(flowread(p2), flow)

    def test_quantize_matches_reference(self, ref_utils):
        from glare_tpu.sr.utils.flow_util import dequantize_flow, quantize_flow

        flow = 0.05 * np.random.RandomState(11).randn(10, 14, 2).astype(np.float32)
        dx, dy = quantize_flow(flow)
        rdx, rdy = ref_utils["flow_util"].quantize_flow(flow)
        np.testing.assert_array_equal(dx, rdx)
        np.testing.assert_array_equal(dy, rdy)
        np.testing.assert_allclose(
            dequantize_flow(dx, dy),
            ref_utils["flow_util"].dequantize_flow(rdx, rdy))

    def test_bad_header_raises(self, tmp_path):
        from glare_tpu.sr.utils.flow_util import flowread

        p = tmp_path / "bad.flo"
        p.write_bytes(b"NOPE" + b"\0" * 16)
        with pytest.raises(IOError):
            flowread(str(p))
