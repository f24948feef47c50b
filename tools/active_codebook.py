"""Codebook-usage histogram visualizer (working equivalent of the
reference's dead `defor_cuda_ext/basicsr/active_codebook.py`).

The reference script imports modules that were never vendored
(`femasr_arch`, `dehaze_vq_warp_arch`) and cannot run as shipped; its
intent — run a corpus through a trained VQ network, count how often each
of the n_e codes is retrieved, and save the counts as a sqrt(n_e) x
sqrt(n_e) usage image — is reproduced here against the live
VQWeightDehazeNet (stage-1) pipeline.

Usage:
    python -m tools.active_codebook --opt confs/train_stage1.yml \
        --ckpt experiments/.../net_g_19000.npz --images path/to/corpus \
        [--limit 100] [--out usage.png]

Outputs: `<out>.npz` with the raw counts + active-code fraction, and (if
matplotlib is importable) the `<out>` PNG heatmap like the reference's
`plt.imshow` figure.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter

import jax
import numpy as np


def usage_counts(net, params, images, n_embed):
    """Run `images` (list of [H, W, 3] float arrays in [0, 1]) through the
    net's encode path and count retrieved codebook indices."""
    import jax.numpy as jnp

    counts = Counter()

    def indices_of(x):
        _, _, _, _, _, indices_list = net.apply(
            {"params": params}, x, method=net.encode_and_decode
        )
        return indices_list[0]

    fn = jax.jit(indices_of)
    for img in images:
        x = jnp.asarray(img, jnp.float32)[None]
        idx = np.asarray(fn(x)).ravel()
        counts.update(idx.tolist())

    grid_w = int(np.ceil(np.sqrt(n_embed)))
    image = np.zeros((grid_w, grid_w), np.float64)
    for k, v in counts.items():
        image[int(k) // grid_w, int(k) % grid_w] = v
    return image, len(counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True, help="stage-1 YAML conf")
    ap.add_argument("--ckpt", default=None, help="net_g checkpoint (.npz)")
    ap.add_argument("--images", required=True, help="image directory")
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--size", type=int, default=256,
                    help="center-crop/resize edge fed to the encoder")
    ap.add_argument("--out", default="visual_code_usage.png")
    args = ap.parse_args()

    import cv2
    import yaml

    from glare_tpu.sr.archs.vq_weight_arch import VQWeightDehazeNet
    from glare_tpu.sr.models.base_model import BaseSRModel

    with open(args.opt) as f:
        opt = yaml.safe_load(f)
    net_opt = dict(opt["network_g"])
    net_opt.pop("type", None)
    net = VQWeightDehazeNet(**net_opt)

    import jax.numpy as jnp

    dummy = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), dummy)["params"]
    if args.ckpt:
        params = BaseSRModel.load_network_params(args.ckpt, params, strict=False)

    files = sorted(os.listdir(args.images))[: args.limit]
    images = []
    for name in files:
        img = cv2.imread(os.path.join(args.images, name))
        if img is None:
            continue
        img = cv2.resize(img[:, :, ::-1], (args.size, args.size),
                         interpolation=cv2.INTER_AREA)
        images.append(img.astype(np.float32) / 255.0)

    n_embed = int(net_opt["codebook_params"][0][1])
    image, active = usage_counts(net, params, images, n_embed)
    frac = active / n_embed
    np.savez(args.out + ".npz", counts=image, active_codes=active,
             n_embed=n_embed, active_fraction=frac)
    print(json.dumps({"images": len(images), "active_codes": active,
                      "n_embed": n_embed, "active_fraction": round(frac, 4)}))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imshow(image)
        plt.colorbar()
        plt.title(f"codebook usage ({active}/{n_embed} active)")
        plt.savefig(args.out)
    except ImportError:
        print(f"matplotlib unavailable; counts saved to {args.out}.npz")


if __name__ == "__main__":
    main()
