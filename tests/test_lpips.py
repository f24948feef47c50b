"""LPIPS converter + metric round-trip (reference: code/Measure.py:17-30).

torchvision/lpips packages are absent in this image, so the reference
LPIPS-AlexNet module is reconstructed locally in torch (the same way
test_torch_parity.py builds reference modules), randomly initialized,
saved as a *checkpoint file* with the lpips package's state_dict key
layout, converted via tools/convert_torch_lpips.py, and the JAX metric is
compared against a faithful torch forward.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_torch_lpips import (  # noqa: E402
    convert_lpips_state_dict,
    convert_split_checkpoints,
)

# torchvision AlexNet .features layout (conv index, out_ch, kernel, stride, pad)
_ALEX = [(0, 64, 11, 4, 2), (3, 192, 5, 1, 2), (6, 384, 3, 1, 1),
         (8, 256, 3, 1, 1), (10, 256, 3, 1, 1)]
_CHS = [64, 192, 384, 256, 256]


def _make_alexnet_features():
    """nn.Sequential mirroring torchvision alexnet.features."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2),
    )


class _TorchLPIPS(tnn.Module):
    """Reference lpips.LPIPS(net='alex') forward, rebuilt locally.

    Slices per lpips.pretrained_networks.alexnet: slice1=f[0:2],
    slice2=f[2:5], slice3=f[5:8], slice4=f[8:10], slice5=f[10:12];
    scaling layer shift/scale constants from lpips/lpips.py.
    """

    def __init__(self):
        super().__init__()
        f = _make_alexnet_features()
        bounds = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]
        self.slices = tnn.ModuleList(
            [tnn.Sequential(*[f[i] for i in range(a, b)]) for a, b in bounds])
        self.lins = tnn.ModuleList(
            [tnn.Conv2d(c, 1, 1, bias=False) for c in _CHS])
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _feats(self, x):
        h = (x - self.shift) / self.scale
        out = []
        for sl in self.slices:
            h = sl(h)
            out.append(h)
        return out

    @staticmethod
    def _unit(x, eps=1e-10):
        return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + eps)

    def forward(self, a, b):
        val = 0.0
        for fa, fb, lin in zip(self._feats(a), self._feats(b), self.lins):
            d = (self._unit(fa) - self._unit(fb)) ** 2
            val = val + lin(d).mean(dim=(2, 3)).sum()
        return val

    def lpips_style_state_dict(self):
        """Keys exactly as torch.save of lpips.LPIPS().state_dict()."""
        sd = {}
        idxs = [[0], [3, 4], [6, 7], [8], [10]]  # conv index within each slice
        # slices preserve original feature indices as submodule names; our
        # local Sequential renumbers from 0, so map back explicitly.
        orig = [0, 3, 6, 8, 10]
        for i, sl in enumerate(self.slices):
            conv = [m for m in sl if isinstance(m, tnn.Conv2d)][0]
            sd[f"net.slice{i + 1}.{orig[i]}.weight"] = conv.weight.detach().clone()
            sd[f"net.slice{i + 1}.{orig[i]}.bias"] = conv.bias.detach().clone()
        for i, lin in enumerate(self.lins):
            sd[f"lin{i}.model.1.weight"] = lin.weight.detach().clone()
        return sd

    def alexnet_state_dict(self):
        sd = {}
        for i, sl in zip([0, 3, 6, 8, 10], self.slices):
            conv = [m for m in sl if isinstance(m, tnn.Conv2d)][0]
            sd[f"features.{i}.weight"] = conv.weight.detach().clone()
            sd[f"features.{i}.bias"] = conv.bias.detach().clone()
        return sd


@pytest.fixture(scope="module")
def torch_lpips():
    torch.manual_seed(0)
    m = _TorchLPIPS().eval()
    # positive-ish lin weights as in the real metric (abs of default init)
    with torch.no_grad():
        for lin in m.lins:
            lin.weight.abs_()
    return m


def _rand_pair(seed, size=64):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + rng.randint(-40, 40, a.shape), 0, 255).astype(np.uint8)
    return a, b


def test_converter_roundtrip_from_checkpoint_file(torch_lpips, tmp_path, monkeypatch):
    """torch.save -> convert -> npz -> load_lpips == torch forward."""
    ckpt = tmp_path / "lpips_alex.pth"
    torch.save(torch_lpips.lpips_style_state_dict(), str(ckpt))

    sd = torch.load(str(ckpt), map_location="cpu", weights_only=False)
    data = convert_lpips_state_dict(sd)
    npz = tmp_path / "lpips.npz"
    np.savez(str(npz), **data)

    monkeypatch.setenv("GLARE_LPIPS_NPZ", str(npz))
    from glare_tpu.utils.lpips_jax import load_lpips

    fn = load_lpips()
    assert fn is not None

    for seed in (0, 1):
        a, b = _rand_pair(seed)
        ta = torch.from_numpy(a.transpose(2, 0, 1)[None]).float() / 255.0 * 2 - 1
        tb = torch.from_numpy(b.transpose(2, 0, 1)[None]).float() / 255.0 * 2 - 1
        with torch.no_grad():
            want = float(torch_lpips(ta, tb))
        import jax.numpy as jnp

        from glare_tpu.measure import t

        got = float(fn(jnp.asarray(t(a)), jnp.asarray(t(b))))
        assert got == pytest.approx(want, abs=2e-5), (got, want)


def test_converter_split_inputs_match(torch_lpips):
    """--alexnet + --lins path produces identical arrays to --lpips path."""
    full = convert_lpips_state_dict(torch_lpips.lpips_style_state_dict())
    lins_only = {k: v for k, v in torch_lpips.lpips_style_state_dict().items()
                 if k.startswith("lin")}
    split = convert_split_checkpoints(torch_lpips.alexnet_state_dict(), lins_only)
    assert full.keys() == split.keys()
    for k in full:
        np.testing.assert_array_equal(full[k], split[k])


def test_measure_uses_env_weights(torch_lpips, tmp_path, monkeypatch):
    """Measure.lpips returns finite numbers once GLARE_LPIPS_NPZ is set."""
    npz = tmp_path / "lpips.npz"
    np.savez(str(npz), **convert_lpips_state_dict(torch_lpips.lpips_style_state_dict()))
    monkeypatch.setenv("GLARE_LPIPS_NPZ", str(npz))

    from glare_tpu.measure import Measure

    m = Measure()
    a, b = _rand_pair(2)
    psnr, ssim, lp = m.measure(a, b)
    assert np.isfinite(lp) and lp > 0
    assert m.lpips(a, a) == pytest.approx(0.0, abs=1e-6)


def test_measure_nan_without_weights(monkeypatch):
    monkeypatch.delenv("GLARE_LPIPS_NPZ", raising=False)
    from glare_tpu.measure import Measure

    m = Measure()
    a, b = _rand_pair(3)
    assert np.isnan(m.lpips(a, b))
