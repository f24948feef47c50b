"""LPIPS-AlexNet perceptual metric in JAX
(reference dependency: lpips.LPIPS(net='alex'), code/Measure.py:17-30).

The metric is AlexNet conv features, unit-normalized per channel, squared
difference, 1x1 linear weighting, spatial mean, summed over 5 taps.

Pretrained AlexNet + LPIPS linear weights cannot be downloaded in this
offline image; :func:`load_lpips` returns a callable when
``$GLARE_LPIPS_NPZ`` points to converted weights (tools/convert_torch_lpips.py)
and ``None`` otherwise — callers then report LPIPS as NaN, clearly flagged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import Conv


class _AlexFeatures(nn.Module):
    """torchvision AlexNet.features with taps after each ReLU."""

    @nn.compact
    def __call__(self, x):
        taps = []
        # conv(out, kernel, stride, pad)
        spec = [
            (64, 11, 4, 2),
            ("M",),
            (192, 5, 1, 2),
            ("M",),
            (384, 3, 1, 1),
            (256, 3, 1, 1),
            (256, 3, 1, 1),
        ]
        i = 0
        h = x
        for s in spec:
            if s[0] == "M":
                h = nn.max_pool(h, (3, 3), strides=(2, 2))
                continue
            out, k, st, p = s
            h = Conv(out, (k, k), strides=(st, st), padding=p, name=f"conv_{i}")(h)
            h = jax.nn.relu(h)
            taps.append(h)
            i += 1
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def probe_lpips_cache() -> Optional[dict]:
    """Assemble LPIPS-Alex weights from locally-cached torch artifacts with
    no network access: the torchvision AlexNet backbone
    ($TORCH_HOME/hub/checkpoints/alexnet-*.pth) plus the lpips package's
    linear calibration (lpips/weights/v0.1/alex.pth, importable when the
    pip package is installed). Returns npz-layout arrays or None."""
    import glob as _glob

    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch")
    )
    backbones = sorted(_glob.glob(os.path.join(
        torch_home, "hub", "checkpoints", "alexnet-*.pth")))
    lin_path = None
    try:
        import lpips as _lpips_pkg

        cand = os.path.join(os.path.dirname(_lpips_pkg.__file__),
                            "weights", "v0.1", "alex.pth")
        if os.path.exists(cand):
            lin_path = cand
    except ImportError:
        pass
    if not backbones or lin_path is None:
        return None
    import torch

    bb = torch.load(backbones[0], map_location="cpu", weights_only=True)
    lin = torch.load(lin_path, map_location="cpu", weights_only=True)
    feat_keys = sorted({int(k.split(".")[1]) for k in bb
                        if k.startswith("features") and k.endswith(".weight")})
    data = {}
    for i, fi in enumerate(feat_keys[:5]):
        data[f"conv_{i}.weight"] = bb[f"features.{fi}.weight"].numpy()
        data[f"conv_{i}.bias"] = bb[f"features.{fi}.bias"].numpy()
    for i in range(5):
        data[f"lin_{i}.weight"] = lin[f"lin{i}.model.1.weight"].numpy()
    return data


def load_lpips() -> Optional[object]:
    path = os.environ.get("GLARE_LPIPS_NPZ", "")
    if path and os.path.exists(path):
        data = np.load(path)
    else:
        data = probe_lpips_cache()
    if data is None:
        return None
    module = _AlexFeatures()
    params = {}
    for i in range(5):
        params[f"conv_{i}"] = {
            "kernel": jnp.asarray(data[f"conv_{i}.weight"]).transpose(2, 3, 1, 0),
            "bias": jnp.asarray(data[f"conv_{i}.bias"]),
        }
    lins = [jnp.asarray(data[f"lin_{i}.weight"]).reshape(-1) for i in range(5)]
    variables = {"params": params}

    @jax.jit
    def lpips(img_a, img_b):
        """img_a/img_b: NHWC float in [-1, 1] (the t() convention)."""
        a = (img_a - _SHIFT) / _SCALE
        b = (img_b - _SHIFT) / _SCALE
        fa = module.apply(variables, a)
        fb = module.apply(variables, b)
        total = 0.0
        for ta, tb, w in zip(fa, fb, lins):
            d = (_normalize_tensor(ta) - _normalize_tensor(tb)) ** 2
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return total

    return lpips
