"""Tests for the basicsr utility tail: face_util geometry, misc helpers,
download_util cache path (reference: basicsr/utils/{face_util,misc,
download_util}.py)."""

import os

import numpy as np
import pytest

from glare_tpu.sr.utils.download_util import load_file_from_url
from glare_tpu.sr.utils.face_util import (
    HAS_DLIB,
    FaceRestorationHelper,
    estimate_similarity,
)
from glare_tpu.sr.utils.misc import check_resume, scandir, sizeof_fmt


def test_estimate_similarity_recovers_exact_transform():
    """Umeyama least squares recovers a noiseless similarity exactly (the
    skimage SimilarityTransform.estimate the reference calls is the same
    algorithm; skimage itself is not in this image)."""
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2) * 100
    theta, s = 0.3, 1.7
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([10.0, -5.0])
    dst = s * src @ rot.T + t

    m = estimate_similarity(src, dst)
    np.testing.assert_allclose(m[:2, :2], s * rot, atol=1e-9)
    np.testing.assert_allclose(m[:2, 2], t, atol=1e-8)
    # applying m to src reproduces dst
    src_h = np.concatenate([src, np.ones((5, 1))], axis=1)
    np.testing.assert_allclose(src_h @ m.T[:, :2], dst, atol=1e-8)

    # with noise: the residual is no worse than the true transform's
    dst_n = dst + rng.randn(5, 2) * 0.5
    m_n = estimate_similarity(src, dst_n)
    res_fit = np.sum((src_h @ m_n.T[:, :2] - dst_n) ** 2)
    res_true = np.sum((dst - dst_n) ** 2)
    assert res_fit <= res_true + 1e-9


def test_warp_crop_and_paste_roundtrip(tmp_path):
    """A face aligned to the template and pasted back with identity
    restoration should reproduce the input region (away from the seam)."""
    helper = FaceRestorationHelper(upscale_factor=1, face_size=512)
    rng = np.random.RandomState(1)
    img = (rng.rand(600, 800, 3) * 255).astype(np.uint8)
    helper.input_img = img

    # landmarks = exact template positions shifted into the image center, so
    # the similarity transform is a pure translation (lossless warp).
    shift = np.array([150.0, 50.0])
    helper.all_landmarks_5 = [helper.face_template + shift]

    helper.warp_crop_faces(save_cropped_path=str(tmp_path / "crop.png"))
    assert len(helper.cropped_faces) == 1
    assert helper.cropped_faces[0].shape == (512, 512, 3)
    assert os.path.exists(tmp_path / "crop_00.png")
    # the crop is img translated by -shift: check an interior block
    np.testing.assert_array_equal(
        helper.cropped_faces[0][100:200, 100:200],
        img[100 + int(shift[1]) : 200 + int(shift[1]),
            100 + int(shift[0]) : 200 + int(shift[0])],
    )

    # restored faces enter in BGR (the reference pastes model outputs that
    # were already converted for cv2 saving); identity restoration = crop->BGR
    helper.add_restored_face(helper.cropped_faces[0][:, :, ::-1])
    out_path = tmp_path / "pasted.png"
    helper.paste_faces_to_input_image(str(out_path))
    import cv2

    pasted = cv2.imread(str(out_path))
    # interior of the pasted face region equals the original (BGR compare)
    y0, x0 = 200 + int(shift[1]), 200 + int(shift[0])
    np.testing.assert_array_equal(pasted[y0 : y0 + 50, x0 : x0 + 50], img[y0 : y0 + 50, x0 : x0 + 50, ::-1])

    helper.clean_all()
    assert helper.cropped_faces == [] and helper.restored_faces == []


def test_detect_faces_requires_dlib():
    helper = FaceRestorationHelper(upscale_factor=2)
    if not HAS_DLIB:
        with pytest.raises(ImportError):
            helper.init_dlib("a", "b", "c")


def test_scandir_and_sizeof_fmt(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a_arch.py").write_text("")
    (tmp_path / "b.txt").write_text("")
    (tmp_path / ".hidden_arch.py").write_text("")
    (tmp_path / "sub" / "c_arch.py").write_text("")

    flat = sorted(scandir(str(tmp_path), suffix="_arch.py"))
    assert flat == ["a_arch.py"]
    rec = sorted(scandir(str(tmp_path), suffix="_arch.py", recursive=True))
    assert rec == ["a_arch.py", os.path.join("sub", "c_arch.py")]

    assert sizeof_fmt(1024) == "1.0 KB"
    assert sizeof_fmt(3 * 1024**3) == "3.0 GB"


def test_check_resume_rewrites_pretrain_paths(capsys):
    opt = {
        "network_g": {}, "network_d": {},
        "path": {
            "resume_state": "state/10.state",
            "models": "exp/models",
            "pretrain_network_g": "old.pth",
            "param_key_g": "params_ema",
        },
    }
    check_resume(opt, 10)
    assert opt["path"]["pretrain_network_g"] == os.path.join("exp/models", "net_g_10.pth")
    assert opt["path"]["pretrain_network_d"] == os.path.join("exp/models", "net_d_10.pth")
    assert opt["path"]["param_key_g"] == "params"


def test_load_file_from_url_cache_hit(tmp_path):
    cached = tmp_path / "weights.npz"
    cached.write_bytes(b"123")
    # already-present file: returned without touching the network
    out = load_file_from_url("http://example.invalid/weights.npz", model_dir=str(tmp_path))
    assert out == str(cached)
