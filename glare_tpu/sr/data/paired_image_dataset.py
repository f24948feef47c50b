"""Paired LQ/GT folder dataset with RIDCP-style pipeline
(reference: basicsr/data/data_util.py paired path collection +
transforms.py paired_random_crop/augment).

Returns NHWC float32 dicts {'lq', 'gt', 'lq_path', 'gt_path'}.
"""

from __future__ import annotations

import os
import random

import cv2
import numpy as np

from ..registry import DATASET_REGISTRY
from ...data.lol_dataset import augment, paired_random_crop


def paired_paths_from_folder(folders, keys, filename_tmpl="{}"):
    """Collect paired paths (reference: data_util.py paired_paths_from_folder)."""
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_names = sorted(os.listdir(input_folder))
    gt_names = sorted(os.listdir(gt_folder))
    assert len(input_names) == len(gt_names), (
        f"{input_key} and {gt_key} datasets have different number of images: "
        f"{len(input_names)}, {len(gt_names)}."
    )
    paths = []
    for gt_name in gt_names:
        basename, ext = os.path.splitext(gt_name)
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append(
            {
                f"{input_key}_path": os.path.join(input_folder, input_name),
                f"{gt_key}_path": os.path.join(gt_folder, gt_name),
            }
        )
    return paths


@DATASET_REGISTRY.register()
class PairedImageDataset:
    def __init__(self, opt):
        self.opt = opt
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        self.filename_tmpl = opt.get("filename_tmpl", "{}")
        self.paths = paired_paths_from_folder(
            [self.lq_folder, self.gt_folder], ["lq", "gt"], self.filename_tmpl
        )

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        p = self.paths[index]
        lq = cv2.cvtColor(cv2.imread(p["lq_path"]), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        gt = cv2.cvtColor(cv2.imread(p["gt_path"]), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

        if self.opt.get("phase") == "train":
            gt_size = self.opt["gt_size"]
            scale = self.opt.get("scale", 1)
            gt, lq, _ = paired_random_crop(gt, lq, None, gt_size, scale)
            gt, lq = augment(
                [gt, lq], self.opt.get("use_hflip", True), self.opt.get("use_rot", True)
            )
        return {
            "lq": np.ascontiguousarray(lq),
            "gt": np.ascontiguousarray(gt),
            "lq_path": p["lq_path"],
            "gt_path": p["gt_path"],
        }


@DATASET_REGISTRY.register()
class SingleImageDataset:
    """GT-only dataset for HQ codebook pretraining (lq == gt)."""

    def __init__(self, opt):
        self.opt = opt
        self.gt_folder = opt["dataroot_gt"]
        self.paths = [
            os.path.join(self.gt_folder, n) for n in sorted(os.listdir(self.gt_folder))
        ]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        gt = cv2.cvtColor(cv2.imread(self.paths[index]), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        if self.opt.get("phase") == "train":
            gt_size = self.opt["gt_size"]
            gt, _, _ = paired_random_crop(gt, gt, None, gt_size, 1)
            (gt,) = augment([gt], self.opt.get("use_hflip", True), self.opt.get("use_rot", True))
        return {"lq": np.ascontiguousarray(gt), "gt": np.ascontiguousarray(gt),
                "lq_path": self.paths[index], "gt_path": self.paths[index]}
