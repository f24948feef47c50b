"""Native C++ data-path core vs numpy reference parity."""

import numpy as np
import pytest

from glare_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


class TestNative:
    def test_version(self, lib):
        assert lib.glare_native_version() == 1

    def test_u8_to_f32(self, lib):
        img = np.random.RandomState(0).randint(0, 256, (13, 17, 3), np.uint8)
        np.testing.assert_allclose(
            native.u8_to_f32(img), img.astype(np.float32) / 255.0, atol=1e-7
        )

    def test_u8_to_f32_log(self, lib):
        img = np.random.RandomState(0).randint(0, 256, (13, 17, 3), np.uint8)
        want = np.log(np.clip(img.astype(np.float32) / 255.0 + 1e-3, 1e-3, None))
        np.testing.assert_allclose(native.u8_to_f32(img, apply_log=True), want, atol=1e-6)

    def test_preprocess_padded_matches_numpy(self, lib):
        img = np.random.RandomState(1).randint(0, 256, (48, 62, 3), np.uint8)
        got = native.preprocess_padded(img, bottom=20, left=20, apply_log=True)
        x = np.log(np.clip(img.astype(np.float32) / 255.0 + 1e-3, 1e-3, None))
        want = np.pad(x, [(0, 20), (20, 0), (0, 0)], "reflect")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_preprocess_into_preallocated_batch(self, lib):
        img = np.random.RandomState(2).randint(0, 256, (10, 12, 3), np.uint8)
        batch = np.zeros((2, 14, 16, 3), np.float32)
        native.preprocess_padded(img, 2, 2, 2, 2, apply_log=False, out=batch[1])
        want = np.pad(img.astype(np.float32) / 255.0, [(2, 2), (2, 2), (0, 0)], "reflect")
        np.testing.assert_allclose(batch[1], want, atol=1e-7)
        assert batch[0].max() == 0  # slot 0 untouched

    @pytest.mark.parametrize("hflip", [False, True])
    @pytest.mark.parametrize("vflip", [False, True])
    @pytest.mark.parametrize("rot90", [0, 1, 3])
    def test_crop_augment_matches_numpy(self, lib, hflip, vflip, rot90):
        img = np.random.RandomState(3).rand(20, 24, 3).astype(np.float32)
        got = native.crop_augment(img, 4, 5, 8, 10, hflip, vflip, rot90)
        x = img[4:12, 5:15]
        if hflip:
            x = x[:, ::-1]
        if vflip:
            x = x[::-1]
        if rot90:
            x = np.rot90(x, rot90, axes=(0, 1))
        np.testing.assert_allclose(got, np.ascontiguousarray(x), atol=1e-7)
