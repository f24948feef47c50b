"""One-stop pretrained-feature-weights setup (round-3 verdict #9).

The framework's three gated feature nets — VGG16 (stage-3 perceptual +
stage-1 semantic losses, reference code/models/modules/losses.py:12-40 and
defor_cuda_ext/basicsr/archs/vgg_arch.py), LPIPS-Alex (Measure CLI,
reference code/Measure.py:17-30), and the NIQE pristine model
(calculate_niqe) — need pretrained parameters that this offline image does
not ship. Each has a converter; this tool runs whichever conversions are
possible from what you give it and prints the export lines.

Sources, in probing order per net:
  VGG16:  --vgg16 /path/to/vgg16-397923af.pth (torch-hub state_dict drop),
          else a torchvision cache under $TORCH_HOME (network if allowed).
  LPIPS:  --lpips /path/to/lpips_alex.pth (the pip `lpips` package's
          weights) [+ --alexnet for the backbone if separate].
  NIQE:   --niqe /path/to/modelparameters.mat (the original MATLAB file;
          used directly — no conversion needed) or a .npz with
          mu_pris_param/cov_pris_param; or --niqe-fit <dir-of-pristine-pngs>
          to fit fresh parameters (utils/niqe.fit_niqe_params).

Usage:
  python -m tools.fetch_weights --out-dir weights \
      [--vgg16 vgg16.pth] [--lpips lpips_alex.pth] [--alexnet alexnet.pth] \
      [--niqe modelparameters.mat | --niqe-fit pristine_dir]

Then paste the printed `export` lines (or add them to the conf env).
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="weights")
    ap.add_argument("--vgg16", default=None,
                    help="local torch-hub vgg16 state_dict (.pth); omit to "
                         "try torchvision's cache/download")
    ap.add_argument("--lpips", default=None,
                    help="lpips_alex.pth from the pip `lpips` package")
    ap.add_argument("--alexnet", default=None,
                    help="alexnet backbone state_dict if not bundled")
    ap.add_argument("--lins", default=None,
                    help="lpips linear heads (weights/v0.1/alex.pth) when "
                         "using --alexnet")
    ap.add_argument("--niqe", default=None,
                    help="modelparameters.mat or a converted .npz")
    ap.add_argument("--niqe-fit", default=None,
                    help="directory of pristine images to fit NIQE params on")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    exports = []
    failures = []

    # ---- VGG16 ----------------------------------------------------------
    dst = os.path.join(args.out_dir, "vgg16.npz")
    try:
        from tools.torch2flax import convert_vgg16_npz

        convert_vgg16_npz(dst, src=args.vgg16)
        exports.append(("GLARE_VGG16_NPZ", dst,
                        "stage-3 perceptual + stage-1 semantic losses"))
    except Exception as e:  # noqa: BLE001 — report and continue
        failures.append(("VGG16", f"{type(e).__name__}: {e} — pass --vgg16 "
                                  "with a local vgg16-397923af.pth drop"))

    # ---- LPIPS ----------------------------------------------------------
    if args.lpips or (args.alexnet and args.lins):
        dst = os.path.join(args.out_dir, "lpips.npz")
        try:
            import numpy as np
            import torch

            from tools.convert_torch_lpips import (
                convert_lpips_state_dict,
                convert_split_checkpoints,
            )

            def load(p):
                sd = torch.load(p, map_location="cpu", weights_only=False)
                return (sd.get("state_dict", sd) if isinstance(sd, dict)
                        else sd.state_dict())

            if args.lpips:
                data = convert_lpips_state_dict(load(args.lpips))
            else:
                data = convert_split_checkpoints(load(args.alexnet),
                                                 load(args.lins))
            np.savez(dst, **data)
            exports.append(("GLARE_LPIPS_NPZ", dst, "Measure/infer LPIPS"))
        except Exception as e:  # noqa: BLE001
            failures.append(("LPIPS", f"{type(e).__name__}: {e}"))
    else:
        failures.append(("LPIPS", "no --lpips given (pip `lpips` package's "
                                  "lpips_alex.pth), or --alexnet + --lins"))

    # ---- NIQE -----------------------------------------------------------
    if args.niqe:
        # .mat and .npz are both loaded directly by utils/niqe.py — just
        # verify it parses, then export the path as-is
        try:
            from glare_tpu.utils.niqe import load_niqe_params

            load_niqe_params(args.niqe)
            exports.append(("GLARE_NIQE_PARAMS", os.path.abspath(args.niqe),
                            "NIQE pristine model"))
        except Exception as e:  # noqa: BLE001
            failures.append(("NIQE", f"{type(e).__name__}: {e}"))
    elif args.niqe_fit:
        dst = os.path.join(args.out_dir, "niqe_params.npz")
        try:
            import glob

            import cv2
            import numpy as np

            from glare_tpu.utils.niqe import fit_niqe_params

            paths = sorted(
                glob.glob(os.path.join(args.niqe_fit, "*.png"))
                + glob.glob(os.path.join(args.niqe_fit, "*.jpg")))
            assert paths, f"no images under {args.niqe_fit}"
            imgs = [cv2.imread(p) for p in paths]
            mu, cov = fit_niqe_params(imgs)
            np.savez(dst, mu_pris_param=mu, cov_pris_param=cov)
            exports.append(("GLARE_NIQE_PARAMS", dst,
                            f"NIQE fitted on {len(imgs)} pristine images"))
        except Exception as e:  # noqa: BLE001
            failures.append(("NIQE", f"{type(e).__name__}: {e}"))
    else:
        failures.append(("NIQE", "no --niqe/.mat or --niqe-fit dir given"))

    # ---- FID note -------------------------------------------------------
    print("# FID: calculate_fid uses the stats-file workflow "
          "(sr/metrics_fid.py); for automatic InceptionV3 feature "
          "extraction supply extractor= (torchvision absent offline).")

    print()
    for name, path, what in exports:
        print(f"export {name}={path}  # {what}")
    if failures:
        print()
        for name, why in failures:
            print(f"# {name}: NOT set up — {why}", file=sys.stderr)
    return 0 if exports else 1


if __name__ == "__main__":
    raise SystemExit(main())
