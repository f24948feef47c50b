"""Torch parity for sr/archs/arch_util.py (reference basicsr/archs/arch_util.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from glare_tpu.sr.archs.arch_util import (
    ResidualBlockNoBN,
    Upsample,
    flow_warp,
    make_layer,
    pixel_shuffle,
    pixel_unshuffle,
    resize_flow,
)

rng = np.random.default_rng(0)


def test_pixel_unshuffle_torch_parity():
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    ours = pixel_unshuffle(jnp.asarray(x), 2)
    # reference arch_util.py:189-206 channel interleave == F.pixel_unshuffle
    ref = F.pixel_unshuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_pixel_shuffle_torch_parity():
    x = rng.standard_normal((2, 4, 6, 12)).astype(np.float32)
    ours = pixel_shuffle(jnp.asarray(x), 2)
    ref = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
    # round trip
    np.testing.assert_allclose(
        np.asarray(pixel_unshuffle(ours, 2)), x, atol=1e-6
    )


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_flow_warp_torch_parity(mode):
    x = rng.standard_normal((2, 9, 11, 4)).astype(np.float32)
    flow = (3.0 * rng.standard_normal((2, 9, 11, 2))).astype(np.float32)
    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow),
                                interp_mode=mode))

    # reference arch_util.py:116-147
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tf = torch.from_numpy(flow)
    _, _, h, w = tx.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + tf
    vx = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(tx, torch.stack((vx, vy), dim=3), mode=mode,
                        padding_mode="zeros", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    # nearest ties (x.5) can round differently; compare where not on a tie
    if mode == "nearest":
        ok = np.isclose(ours, ref, atol=1e-5)
        assert ok.mean() > 0.98
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_flow_warp_align_corners_false_torch_parity(mode):
    # grid_sample(align_corners=False) rescales every sample position by
    # S/(S-1) and shifts half a pixel — a previously-untested branch
    x = rng.standard_normal((2, 9, 11, 4)).astype(np.float32)
    flow = (3.0 * rng.standard_normal((2, 9, 11, 2))).astype(np.float32)
    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow),
                                interp_mode=mode, align_corners=False))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tf = torch.from_numpy(flow)
    _, _, h, w = tx.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + tf
    vx = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(tx, torch.stack((vx, vy), dim=3), mode=mode,
                        padding_mode="zeros", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    if mode == "nearest":
        ok = np.isclose(ours, ref, atol=1e-5)
        assert ok.mean() > 0.98
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("out_hw", [(16, 12), (5, 3)])  # up and down
def test_resize_flow_bilinear_torch_parity(align_corners, out_hw):
    flow = rng.standard_normal((2, 8, 6, 2)).astype(np.float32)
    ours = np.asarray(resize_flow(jnp.asarray(flow), "shape", out_hw,
                                  align_corners=align_corners))
    # reference arch_util.py:150-187: scale values by ratio, F.interpolate
    tf = torch.from_numpy(flow).permute(0, 3, 1, 2).clone()
    tf[:, 0] *= out_hw[1] / 6
    tf[:, 1] *= out_hw[0] / 8
    ref = F.interpolate(tf, size=out_hw, mode="bilinear",
                        align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_flow_rejects_unknown_mode():
    flow = jnp.zeros((1, 4, 4, 2), jnp.float32)
    with pytest.raises(ValueError, match="interp_mode"):
        resize_flow(flow, "ratio", (2.0, 2.0), interp_mode="bicubic")


def test_resize_flow_shape_and_scaling():
    flow = rng.standard_normal((1, 8, 6, 2)).astype(np.float32)
    out = np.asarray(resize_flow(jnp.asarray(flow), "ratio", (2.0, 2.0)))
    assert out.shape == (1, 16, 12, 2)
    # values scale with the resolution ratio (reference arch_util.py:180-186)
    const = jnp.ones((1, 8, 6, 2), jnp.float32) * jnp.asarray([3.0, 5.0])
    out_c = np.asarray(resize_flow(const, "ratio", (2.0, 0.5)))
    np.testing.assert_allclose(out_c[..., 0], 3.0 * 0.5, atol=1e-5)  # dx * w-ratio
    np.testing.assert_allclose(out_c[..., 1], 5.0 * 2.0, atol=1e-5)  # dy * h-ratio
    out2 = np.asarray(resize_flow(jnp.asarray(flow), "shape", (4, 3)))
    assert out2.shape == (1, 4, 3, 2)


def test_residual_block_no_bn_torch_parity():
    x = rng.standard_normal((1, 6, 7, 8)).astype(np.float32)
    m = ResidualBlockNoBN(num_feat=8, res_scale=0.5, pytorch_init=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    conv1 = torch.nn.Conv2d(8, 8, 3, padding=1)
    conv2 = torch.nn.Conv2d(8, 8, 3, padding=1)
    with torch.no_grad():
        for tc, name in ((conv1, "conv1"), (conv2, "conv2")):
            k = np.asarray(params[name]["kernel"])  # HWIO -> OIHW
            tc.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))
            tc.bias.copy_(torch.from_numpy(np.asarray(params[name]["bias"])))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = (tx + conv2(F.relu(conv1(tx))) * 0.5).permute(0, 2, 3, 1).numpy()

    ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_residual_block_default_init_scaled():
    # BasicSR init (scale 0.1) => residual branch is small at init
    m = ResidualBlockNoBN(num_feat=16)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    out = m.apply({"params": params}, x)
    resid = np.asarray(out) - np.asarray(x)
    assert np.abs(resid).mean() < 0.15


def test_make_layer_and_upsample():
    blocks = make_layer(lambda: None, 3)
    assert len(blocks) == 3

    x = rng.standard_normal((1, 5, 6, 4)).astype(np.float32)
    for scale in (2, 4, 3):
        m = Upsample(scale=scale, num_feat=4)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = m.apply(params, jnp.asarray(x))
        assert out.shape == (1, 5 * scale, 6 * scale, 4)
    with pytest.raises(ValueError):
        Upsample(scale=5, num_feat=4).init(
            jax.random.PRNGKey(0), jnp.asarray(x))
