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
