"""Parity tests for glare_tpu.sr.archs.vgg_arch.VGGFeatureExtractor.

torchvision is absent in this image, so the torch side is reconstructed as
an equivalent nn.Sequential from the same NAMES layout (conv/relu/pool
order and channel plan are fully determined by the names) — which is
exactly what the reference borrows from torchvision's `features`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from glare_tpu.sr.archs.vgg_arch import (
    NAMES,
    VGGFeatureExtractor,
    _BLOCK_CH,
    insert_bn,
    load_vgg_params,
)


def build_torch_prefix(vgg_type, max_name):
    names = NAMES[vgg_type]
    max_idx = names.index(max_name)
    layers, in_ch = [], 3
    for n in names[: max_idx + 1]:
        if n.startswith("conv"):
            out_ch = _BLOCK_CH[int(n[4])]
            layers.append((n, torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)))
            in_ch = out_ch
        elif n.startswith("relu"):
            layers.append((n, torch.nn.ReLU()))
        elif n.startswith("pool"):
            layers.append((n, torch.nn.MaxPool2d(2, 2)))
    import collections

    return torch.nn.Sequential(collections.OrderedDict(layers))


class TestVGGFeatureExtractor:
    @pytest.mark.parametrize("vgg_type,taps", [
        ("vgg19", ["relu1_1", "relu2_1", "relu3_1", "relu4_4"]),
        ("vgg16", ["relu3_3"]),
    ])
    def test_tap_parity_vs_torch_layout(self, vgg_type, taps):
        g = torch.Generator().manual_seed(0)
        tm = build_torch_prefix(vgg_type, taps[-1])
        with torch.no_grad():
            for p in tm.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        tm.eval()

        params = {}
        for name, mod in tm.named_children():
            if isinstance(mod, torch.nn.Conv2d):
                params[name] = {
                    "kernel": jnp.asarray(
                        mod.weight.detach().numpy().transpose(2, 3, 1, 0)
                    ),
                    "bias": jnp.asarray(mod.bias.detach().numpy()),
                }

        x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        xt = torch.from_numpy(
            ((x - mean) / std).transpose(0, 3, 1, 2).copy()
        )

        acts = {}
        h = xt
        with torch.no_grad():
            for name, mod in tm.named_children():
                h = mod(h)
                if name in taps:
                    acts[name] = h.numpy().transpose(0, 2, 3, 1)

        jm = VGGFeatureExtractor(layer_name_list=taps, vgg_type=vgg_type)
        out = jm.apply({"params": params}, jnp.asarray(x))
        assert set(out) == set(taps)
        for name in taps:
            np.testing.assert_allclose(
                np.asarray(out[name]), acts[name], rtol=1e-2, atol=1e-3, err_msg=name
            )

    def test_range_norm_and_pool_options(self):
        taps = ["relu2_1"]
        jm = VGGFeatureExtractor(
            layer_name_list=taps, vgg_type="vgg19", range_norm=True,
            remove_pooling=True,
        )
        v = load_vgg_params("vgg19", taps)
        x = jnp.zeros((1, 16, 16, 3))
        out = jm.apply(v, x)
        # remove_pooling keeps full spatial resolution
        assert out["relu2_1"].shape == (1, 16, 16, 128)

    def test_insert_bn(self):
        names = insert_bn(["conv1_1", "relu1_1", "pool1"])
        assert names == ["conv1_1", "bn1_1", "relu1_1", "pool1"]

    def test_random_fallback_warns(self):
        with pytest.warns(UserWarning, match="RANDOM"):
            v = load_vgg_params("vgg16", ["relu1_2"])
        assert "conv1_1" in v["params"] and "conv1_2" in v["params"]
        assert len(v["params"]) == 2


class TestTorchCacheProbe:
    """Round-3 weight-story hardening: load_vgg16_params probes the local
    torchvision download cache ($TORCH_HOME/hub/checkpoints) before falling
    back to a random net. Verified offline with a synthetic torchvision-
    layout checkpoint (random weights), incl. feature parity vs a torch
    forward of the same state dict."""

    def _fake_vgg16_sd(self, seed=0):
        g = torch.Generator().manual_seed(seed)
        plan = [(3, 64), (64, 64), (64, 128), (128, 128),
                (128, 256), (256, 256), (256, 256)]
        feat_idx = [0, 2, 5, 7, 10, 12, 14]
        sd = {}
        for (cin, cout), fi in zip(plan, feat_idx):
            sd[f"features.{fi}.weight"] = torch.randn(cout, cin, 3, 3, generator=g) * 0.05
            sd[f"features.{fi}.bias"] = torch.randn(cout, generator=g) * 0.05
        return sd

    def test_probe_finds_and_converts_cache(self, tmp_path, monkeypatch):
        from glare_tpu.modules.losses import (
            VGG16Features,
            load_vgg16_params,
            probe_torch_vgg16_cache,
        )

        ckpt_dir = tmp_path / "hub" / "checkpoints"
        ckpt_dir.mkdir(parents=True)
        sd = self._fake_vgg16_sd()
        torch.save(sd, ckpt_dir / "vgg16-397923af.pth")
        monkeypatch.setenv("TORCH_HOME", str(tmp_path))
        monkeypatch.delenv("GLARE_VGG16_NPZ", raising=False)

        assert probe_torch_vgg16_cache() is not None
        params, source = load_vgg16_params(return_source=True)
        assert source.startswith("torch-cache:"), source

        # a cached .pth on a machine WITHOUT torch must fall back to the
        # random net (with a warning) instead of crashing model init
        import glare_tpu.modules.losses as losses_mod

        def _no_torch(path):
            raise ImportError("No module named 'torch'")

        monkeypatch.setattr(
            losses_mod, "_vgg16_params_from_torch_ckpt", _no_torch)
        with pytest.warns(UserWarning):
            _, source2 = load_vgg16_params(return_source=True)
        assert source2 == "random"
        monkeypatch.undo()
        monkeypatch.setenv("TORCH_HOME", str(tmp_path))
        monkeypatch.delenv("GLARE_VGG16_NPZ", raising=False)

        # feature parity: torch forward of the same weights
        x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
        jtaps = VGG16Features().apply(params, jnp.asarray(x))

        layers, li = [], 0
        plan = [64, 64, "M", 128, 128, "M", 256, 256, 256]
        feat_idx = [0, 2, 5, 7, 10, 12, 14]
        convs = []
        in_ch = 3
        for spec in plan:
            if spec == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
                continue
            conv = torch.nn.Conv2d(in_ch, spec, 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(sd[f"features.{feat_idx[li]}.weight"])
                conv.bias.copy_(sd[f"features.{feat_idx[li]}.bias"])
            layers += [conv, torch.nn.ReLU()]
            convs.append(conv)
            in_ch = spec
            li += 1
        net = torch.nn.Sequential(*layers)
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ttaps = []
        with torch.no_grad():
            for mi, mod in enumerate(net):
                h = mod(h)
                if mi in {3, 8, 15}:  # the relu1_2 / relu2_2 / relu3_3 modules
                    ttaps.append(h)
        assert len(ttaps) == len(jtaps) == 3
        for a, b in zip(jtaps, ttaps):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy().transpose(0, 2, 3, 1), atol=1e-5)

    def test_perceptual_network_reports_source(self, tmp_path, monkeypatch):
        from glare_tpu.modules.losses import PerceptualNetwork

        monkeypatch.setenv("TORCH_HOME", str(tmp_path))  # empty -> no cache
        monkeypatch.delenv("GLARE_VGG16_NPZ", raising=False)
        with pytest.warns(UserWarning, match="RANDOM"):
            p = PerceptualNetwork()
        assert p.source == "random" and not p.pretrained

    def test_lpips_probe_absent_is_none(self, tmp_path, monkeypatch):
        from glare_tpu.utils.lpips_jax import probe_lpips_cache

        monkeypatch.setenv("TORCH_HOME", str(tmp_path))
        assert probe_lpips_cache() is None
