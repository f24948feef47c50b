"""Torch LPIPS-AlexNet checkpoint -> npz for glare_tpu.utils.lpips_jax.

The reference metric harness is ``lpips.LPIPS(net='alex')``
(reference: code/Measure.py:17-30): torchvision AlexNet conv features with
taps after each of the 5 ReLUs, unit-normalized, squared difference,
weighted by 5 learned 1x1 linear heads, spatially averaged and summed.

Accepted inputs (any one of):
  * ``--lpips <path>``   torch.save'd state_dict of the full ``lpips.LPIPS``
                         module.  Conv keys follow the lpips package's slice
                         layout (``net.slice1.0.weight`` .. ``net.slice5.10.weight``)
                         and linear heads are ``lin{i}.model.1.weight``.
  * ``--alexnet <path>`` torchvision ``alexnet`` state_dict
                         (``features.{0,3,6,8,10}.weight``) together with
  * ``--lins <path>``    the lpips repo's ``weights/v0.1/alex.pth`` (linear
                         heads only, ``lin{i}.model.1.weight``).

Output npz keys (consumed by glare_tpu/utils/lpips_jax.py:load_lpips):
  conv_{i}.weight  (torch OIHW, transposed at load time)
  conv_{i}.bias
  lin_{i}.weight   (flattened [C])

Usage:
  python tools/convert_torch_lpips.py --lpips lpips_alex.pth --dst lpips.npz
  GLARE_LPIPS_NPZ=lpips.npz python infer_dataset_lol.py --opt confs/LOL.yml
"""

from __future__ import annotations

import argparse

import numpy as np

# lpips package slice layout: slice1=features[0:2], slice2=[2:5], slice3=[5:8],
# slice4=[8:10], slice5=[10:12]; module names keep the original feature index.
_SLICE_CONV = [("slice1", 0), ("slice2", 3), ("slice3", 6), ("slice4", 8), ("slice5", 10)]
# torchvision AlexNet conv indices inside .features
_TV_CONV = [0, 3, 6, 8, 10]


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _strip(sd):
    return {k.replace("module.", ""): v for k, v in sd.items()}


def _lin_key(sd, i):
    for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight", f"lin{i}.1.weight"):
        if k in sd:
            return k
    raise KeyError(f"no linear-head key for lin{i} in checkpoint "
                   f"(looked for lin{i}.model.1.weight)")


def convert_lpips_state_dict(sd):
    """Full lpips.LPIPS state_dict -> npz dict."""
    sd = _strip(sd)
    data = {}
    for i, (sl, idx) in enumerate(_SLICE_CONV):
        data[f"conv_{i}.weight"] = _np(sd[f"net.{sl}.{idx}.weight"])
        data[f"conv_{i}.bias"] = _np(sd[f"net.{sl}.{idx}.bias"])
    for i in range(5):
        data[f"lin_{i}.weight"] = _np(sd[_lin_key(sd, i)]).reshape(-1)
    return data


def convert_split_checkpoints(alexnet_sd, lins_sd):
    """torchvision alexnet state_dict + lins-only checkpoint -> npz dict."""
    alexnet_sd, lins_sd = _strip(alexnet_sd), _strip(lins_sd)
    data = {}
    for i, idx in enumerate(_TV_CONV):
        data[f"conv_{i}.weight"] = _np(alexnet_sd[f"features.{idx}.weight"])
        data[f"conv_{i}.bias"] = _np(alexnet_sd[f"features.{idx}.bias"])
    for i in range(5):
        data[f"lin_{i}.weight"] = _np(lins_sd[_lin_key(lins_sd, i)]).reshape(-1)
    return data


def main():
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--lpips", default=None,
                        help="full lpips.LPIPS state_dict checkpoint")
    parser.add_argument("--alexnet", default=None,
                        help="torchvision alexnet state_dict checkpoint")
    parser.add_argument("--lins", default=None,
                        help="lpips weights/v0.1/alex.pth (linear heads only)")
    parser.add_argument("--dst", required=True)
    args = parser.parse_args()

    def load(p):
        sd = torch.load(p, map_location="cpu", weights_only=False)
        return sd.get("state_dict", sd) if isinstance(sd, dict) else sd.state_dict()

    if args.lpips:
        data = convert_lpips_state_dict(load(args.lpips))
    elif args.alexnet and args.lins:
        data = convert_split_checkpoints(load(args.alexnet), load(args.lins))
    else:
        parser.error("need --lpips OR (--alexnet AND --lins)")
    np.savez(args.dst, **data)
    print(f"wrote {args.dst} ({len(data)} arrays); "
          f"set GLARE_LPIPS_NPZ={args.dst} to enable LPIPS")


if __name__ == "__main__":
    main()
