"""Full-SwinIR torch-parity tests
(reference: defor_cuda_ext/basicsr/archs/network_swinir.py:619-867).

Loads the reference module by file path with a timm stub (timm is absent in
this image; at eval DropPath is identity and trunc_normal_ only affects
init, which we overwrite anyway), randomizes weights, converts via
tools/torch2flax.convert_swinir, and compares outputs — which also gives
the swin.py window-attention blocks their first end-to-end torch parity.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REF = "/root/reference/defor_cuda_ext/basicsr/archs/network_swinir.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")


def _load_ref_swinir():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # identity at eval
                return x

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    spec = importlib.util.spec_from_file_location("ref_network_swinir", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    module.load_state_dict(sd)
    module.eval()
    return module


def _run_parity(upsampler, upscale, resi_connection="1conv", seed=0):
    from glare_tpu.sr.archs.swinir_arch import SwinIR
    from tools.torch2flax import convert_swinir

    ref = _load_ref_swinir()
    tm = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 2], window_size=4, mlp_ratio=2.0,
        drop_path_rate=0.0, upscale=upscale, img_range=1.0,
        upsampler=upsampler, resi_connection=resi_connection,
    )
    _randomize(tm, seed)

    x = np.random.RandomState(seed).rand(1, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    params = {"params": convert_swinir(tm.state_dict())}
    m = SwinIR(embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=4,
               mlp_ratio=2.0, upscale=upscale, upsampler=upsampler,
               resi_connection=resi_connection)
    jy = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jy), ty.numpy().transpose(0, 2, 3, 1), atol=2e-4)


@pytest.mark.slow
class TestSwinIRParity:
    def test_pixelshuffledirect_x2(self):
        _run_parity("pixelshuffledirect", 2, seed=1)

    def test_pixelshuffle_x2(self):
        _run_parity("pixelshuffle", 2, seed=2)

    def test_denoise_head_x1(self):
        _run_parity("", 1, seed=3)

    def test_3conv_residual(self):
        _run_parity("", 1, resi_connection="3conv", seed=4)

    def test_nearest_conv_x4(self):
        _run_parity("nearest+conv", 4, seed=5)

    def test_nonmultiple_input_padding(self):
        """H, W not window-multiples: reference reflect-pads then crops."""
        from glare_tpu.sr.archs.swinir_arch import SwinIR
        from tools.torch2flax import convert_swinir

        ref = _load_ref_swinir()
        tm = ref.SwinIR(img_size=16, patch_size=1, embed_dim=16, depths=[2],
                        num_heads=[2], window_size=4, mlp_ratio=2.0,
                        drop_path_rate=0.0, upscale=1, upsampler="")
        _randomize(tm, 6)
        x = np.random.RandomState(6).rand(1, 13, 18, 3).astype(np.float32)
        with torch.no_grad():
            ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        params = {"params": convert_swinir(tm.state_dict())}
        m = SwinIR(embed_dim=16, depths=(2,), num_heads=(2,), window_size=4,
                   mlp_ratio=2.0, upscale=1, upsampler="")
        jy = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(jy), ty.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    def test_registry(self):
        from glare_tpu.sr.archs import build_network

        net = build_network({"type": "SwinIR", "embed_dim": 16,
                             "depths": (2,), "num_heads": (2,),
                             "window_size": 4, "upscale": 2,
                             "upsampler": "pixelshuffledirect"})
        assert net.__class__.__name__ == "SwinIR"
