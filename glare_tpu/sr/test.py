"""Config-driven stage-1 test pipeline (reference: basicsr/test.py:11-45)."""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp
import numpy as np

from ..utils import setup_logger
from ..utils.imgproc import imwrite
from ..utils.metrics import PSNR, calculate_ssim, img_as_ubyte
from .data import build_dataloader, build_dataset
from .models import build_model
from .utils import get_env_info, parse_options


def test_pipeline(root_path=".", argv=None):
    opt, args = parse_options(root_path, is_train=False, argv=argv)
    os.makedirs(opt["path"]["results_root"], exist_ok=True)
    setup_logger("base", opt["path"]["log"], "test", screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(get_env_info())

    test_loaders = []
    for phase, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loaders.append((phase, build_dataloader(test_set, dataset_opt)))

    model = build_model(opt)

    for phase, loader in test_loaders:
        psnrs, ssims = [], []
        for batch in loader:
            out = model.test(jnp.asarray(batch["lq"]))
            out = np.clip(np.asarray(out)[0], 0, 1)
            gt = np.asarray(batch["gt"])[0]
            psnrs.append(PSNR(gt, out))
            ssims.append(calculate_ssim(img_as_ubyte(gt), img_as_ubyte(out)))
            if opt.get("val", {}).get("save_img"):
                name = os.path.splitext(os.path.basename(batch["gt_path"][0]))[0]
                imwrite(
                    os.path.join(opt["path"]["visualization"], f"{name}.png"),
                    img_as_ubyte(out),
                )
        logger.info(
            f"[{phase}] PSNR: {float(np.mean(psnrs)):.4f} SSIM: {float(np.mean(ssims)):.4f}"
        )
    return model


if __name__ == "__main__":
    test_pipeline()
