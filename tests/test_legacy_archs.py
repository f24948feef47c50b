"""Torch-parity tests for the legacy architecture modules
(glare_tpu/modules/legacy_archs.py) against the reference implementations
in code/models/modules/{RRDBNet_arch,color_encoder,base_layers,loss}.py.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/code"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    if "natsort" not in sys.modules:
        stub = types.ModuleType("natsort")
        stub.natsorted = sorted
        sys.modules["natsort"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: None
        tv_utils.save_image = lambda *a, **k: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def randomize_(module, seed=0, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype in (torch.int64, torch.int32):  # num_batches_tracked
            continue
        r = torch.randn(v.shape, generator=g) * scale
        if k.endswith("running_var"):
            r = r.abs() + 0.5
        sd[k] = r
    module.load_state_dict(sd)
    module.eval()
    return module


def t2j_conv(w):
    """torch OIHW -> flax HWIO."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_deconv(w):
    """torch ConvTranspose2d IOHW -> flax HWIO with spatial flip (flax
    conv_transpose convolves the kernel as-is; torch's transposed conv is
    equivalent to convolving the spatially mirrored kernel)."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy())


def vec(w):
    return jnp.asarray(w.detach().numpy())


def to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def conv_params(sd, prefix):
    return {"kernel": t2j_conv(sd[f"{prefix}.weight"]),
            "bias": vec(sd[f"{prefix}.bias"])}


def rdb_params(sd, prefix):
    return {f"conv{i}": conv_params(sd, f"{prefix}.conv{i}") for i in range(1, 6)}


def rrdb_params(sd, prefix):
    return {f"RDB{i}": rdb_params(sd, f"{prefix}.RDB{i}") for i in range(1, 4)}


class TestRRDBNet:
    def test_forward_and_steps_parity(self):
        from models.modules.RRDBNet_arch import RRDBNet as TorchRRDBNet

        from glare_tpu.modules.legacy_archs import RRDBNet

        nb = 2
        tm = randomize_(TorchRRDBNet(3, 3, 16, nb, gc=8, scale=4, opt=None))
        sd = tm.state_dict()

        params = {
            "conv_first": conv_params(sd, "conv_first"),
            "trunk_conv": conv_params(sd, "trunk_conv"),
            "upconv1": conv_params(sd, "upconv1"),
            "upconv2": conv_params(sd, "upconv2"),
            "HRconv": conv_params(sd, "HRconv"),
            "conv_last": conv_params(sd, "conv_last"),
        }
        for i in range(nb):
            params[f"trunk_{i}"] = rrdb_params(sd, f"RRDB_trunk.{i}")

        x = np.random.RandomState(0).rand(1, 32, 40, 3).astype(np.float32)
        with torch.no_grad():
            t_out = tm(to_nchw(x)).numpy().transpose(0, 2, 3, 1)
            t_steps = tm(to_nchw(x), get_steps=True)

        jm = RRDBNet(in_nc=3, out_nc=3, nf=16, nb=nb, gc=8, scale=4)
        j_out = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(j_out, t_out, atol=5e-3, rtol=1e-4)

        j_steps = jm.apply({"params": params}, jnp.asarray(x), get_steps=True)
        for k in ("last_lr_fea", "fea_up1", "fea_up2", "fea_up4", "fea_up-1"):
            np.testing.assert_allclose(
                np.asarray(j_steps[k]),
                t_steps[k].numpy().transpose(0, 2, 3, 1),
                atol=5e-3, rtol=1e-4, err_msg=k,
            )


class TestColorEncoder:
    def test_parity(self):
        from models.modules.color_encoder import ColorEncoder as TorchCE

        from glare_tpu.modules.legacy_archs import ColorEncoder

        tm = randomize_(TorchCE(8, opt={"avg_kernel_size": 5}))
        sd = tm.state_dict()

        def blk(name):
            return {"conv": conv_params(sd, f"{name}.conv_relu.0")}

        def dblk(name):
            return {"deconv": {
                "kernel": t2j_deconv(sd[f"{name}.deconv_relu.0.weight"]),
                "bias": vec(sd[f"{name}.deconv_relu.0.bias"]),
            }}

        params = {
            "conv_input": blk("conv_input"),
            "conv_r1": blk("conv_r1"),
            "conv_r2": blk("conv_r2"),
            "deconv_r1": dblk("deconv_r1"),
            "conv_r3": blk("conv_r3"),
            "deconv_r2": dblk("deconv_r2"),
            "conv_r4": blk("conv_r4"),
            "conv_r5": conv_params(sd, "conv_r5"),
        }
        x = np.random.RandomState(1).rand(1, 16, 24, 3).astype(np.float32)
        with torch.no_grad():
            t_out = tm(to_nchw(x)).numpy().transpose(0, 2, 3, 1)
        jm = ColorEncoder(nf=8, avg_kernel_size=5)
        j_out = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(j_out, t_out, atol=5e-3, rtol=1e-4)


class TestBaseLayers:
    def test_cbam_replicates_discarded_spatial(self):
        from models.modules.base_layers import CBAM as TorchCBAM

        from glare_tpu.modules.legacy_archs import CBAM

        tm = randomize_(TorchCBAM(16))
        sd = tm.state_dict()
        params = {
            "ca": {
                "mlp1": {"kernel": t2j_conv(sd["ca.sharedMLP.0.weight"])},
                "mlp2": {"kernel": t2j_conv(sd["ca.sharedMLP.2.weight"])},
            },
            "sa": {"conv": {"kernel": t2j_conv(sd["sa.conv.weight"])}},
        }
        x = np.random.RandomState(2).randn(1, 8, 8, 16).astype(np.float32)
        with torch.no_grad():
            t_out = tm(to_nchw(x)).numpy().transpose(0, 2, 3, 1)
        j_out = np.asarray(CBAM().apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-5)

    def test_resconv_bn1_twice_quirk(self):
        from models.modules.base_layers import ResConv as TorchResConv

        from glare_tpu.modules.legacy_archs import ResConv

        tm = randomize_(TorchResConv(16, 16))
        sd = tm.state_dict()
        params = {
            "conv1": conv_params(sd, "conv1"),
            "conv2": conv_params(sd, "conv2"),
            "bn1": {"scale": vec(sd["bn1.weight"]), "bias": vec(sd["bn1.bias"])},
            "cbam": {
                "ca": {
                    "mlp1": {"kernel": t2j_conv(sd["cbam.ca.sharedMLP.0.weight"])},
                    "mlp2": {"kernel": t2j_conv(sd["cbam.ca.sharedMLP.2.weight"])},
                },
                "sa": {"conv": {"kernel": t2j_conv(sd["cbam.sa.conv.weight"])}},
            },
        }
        batch_stats = {
            "bn1": {"mean": vec(sd["bn1.running_mean"]),
                    "var": vec(sd["bn1.running_var"])}
        }
        x = np.random.RandomState(3).randn(1, 8, 8, 16).astype(np.float32)
        with torch.no_grad():
            t_out = tm(to_nchw(x)).numpy().transpose(0, 2, 3, 1)
        j_out = np.asarray(
            ResConv(16).apply(
                {"params": params, "batch_stats": batch_stats}, jnp.asarray(x)
            )
        )
        np.testing.assert_allclose(j_out, t_out, atol=1e-5)

    def test_msia_parity(self):
        from models.modules.base_layers import MSIA as TorchMSIA

        from glare_tpu.modules.legacy_archs import MSIA

        tm = randomize_(TorchMSIA(8))
        sd = tm.state_dict()

        def cbr(t_name):
            return {
                "conv": conv_params(sd, f"{t_name}.conv_bn_relu.0"),
                "bn": {"scale": vec(sd[f"{t_name}.conv_bn_relu.1.weight"]),
                       "bias": vec(sd[f"{t_name}.conv_bn_relu.1.bias"])},
            }

        def cbr_stats(t_name):
            return {"bn": {"mean": vec(sd[f"{t_name}.conv_bn_relu.1.running_mean"]),
                           "var": vec(sd[f"{t_name}.conv_bn_relu.1.running_var"])}}

        def dblk(t_name):
            return {"deconv": {
                "kernel": t2j_deconv(sd[f"{t_name}.deconv_relu.0.weight"]),
                "bias": vec(sd[f"{t_name}.deconv_relu.0.bias"]),
            }}

        params = {
            "cbr1": cbr("conv_bn_relu_1"),
            "cbr2": cbr("conv_bn_relu_2"),
            "cbr4": cbr("conv_bn_relu_4"),
            "deconv2": dblk("deconv_2"),
            "deconv41": dblk("deconv_4_1"),
            "deconv42": dblk("deconv_4_2"),
            "out": {"conv": conv_params(sd, "out.conv_relu.0")},
        }
        batch_stats = {
            "cbr1": cbr_stats("conv_bn_relu_1"),
            "cbr2": cbr_stats("conv_bn_relu_2"),
            "cbr4": cbr_stats("conv_bn_relu_4"),
        }
        r = np.random.RandomState(4).randn(1, 16, 16, 8).astype(np.float32)
        i_att = np.random.RandomState(5).rand(1, 16, 16, 1).astype(np.float32)
        with torch.no_grad():
            t_out = tm(to_nchw(r), to_nchw(i_att)).numpy().transpose(0, 2, 3, 1)
        j_out = np.asarray(
            MSIA(8).apply({"params": params, "batch_stats": batch_stats},
                          jnp.asarray(r), jnp.asarray(i_att))
        )
        np.testing.assert_allclose(j_out, t_out, atol=1e-4)

    def test_doubleconv_shapes(self):
        from glare_tpu.modules.legacy_archs import DoubleConv

        x = jnp.zeros((1, 16, 16, 8))
        d = DoubleConv(12)
        v = d.init(jax.random.PRNGKey(0), x)
        assert d.apply(v, x).shape == (1, 16, 16, 12)


class TestLegacyLosses:
    def test_charbonnier_sum(self):
        from models.modules.loss import CharbonnierLoss

        from glare_tpu.modules.legacy_archs import charbonnier_sum_loss

        x = np.random.RandomState(4).randn(2, 3, 4, 4).astype(np.float32)
        y = np.random.RandomState(5).randn(2, 3, 4, 4).astype(np.float32)
        t = float(CharbonnierLoss()(torch.from_numpy(x), torch.from_numpy(y)))
        j = float(charbonnier_sum_loss(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(j, t, rtol=1e-5)

    @pytest.mark.parametrize("gan_type", ["gan", "lsgan", "wgan-gp"])
    def test_gan_loss(self, gan_type):
        from models.modules.loss import GANLoss as TorchGANLoss

        from glare_tpu.modules.legacy_archs import LegacyGANLoss

        logits = np.random.RandomState(6).randn(4, 1).astype(np.float32) * 2
        for real in (True, False):
            t = float(TorchGANLoss(gan_type)(torch.from_numpy(logits), real))
            j = float(LegacyGANLoss(gan_type)(jnp.asarray(logits), real))
            np.testing.assert_allclose(j, t, rtol=1e-5, err_msg=f"{gan_type}/{real}")

    def test_gradient_penalty(self):
        from models.modules.loss import GradientPenaltyLoss

        from glare_tpu.modules.legacy_archs import gradient_penalty_loss

        w = np.random.RandomState(7).randn(12, 1).astype(np.float32)
        interp = np.random.RandomState(8).randn(3, 12).astype(np.float32)

        ti = torch.from_numpy(interp).requires_grad_(True)
        crit = (ti ** 2) @ torch.from_numpy(w)
        t = float(GradientPenaltyLoss()(ti, crit))

        j = float(
            gradient_penalty_loss(
                lambda z: (z ** 2) @ jnp.asarray(w), jnp.asarray(interp)
            )
        )
        np.testing.assert_allclose(j, t, rtol=1e-5)
