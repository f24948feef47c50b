"""General utilities: option probing, experiment dirs, loggers, seeds.

Parity targets: ``/root/reference/code/utils/util.py`` (setup_logger:158,
mkdir_and_rename:141, get_resume_paths:228, opt_get:247) without the torch
dependency. ``natsorted`` replaces the unavailable ``natsort`` package.
"""

from __future__ import annotations

import logging
import os
import random
import re
import shutil
import sys
import time
from datetime import datetime

import numpy as np


def opt_get(opt, keys, default=None):
    """Nested-key probe (reference: util.py:247-254)."""
    if opt is None:
        return default
    ret = opt
    for k in keys:
        ret = ret.get(k, None) if hasattr(ret, "get") else None
        if ret is None:
            return default
    return ret


def get_timestamp():
    return datetime.now().strftime("%y%m%d-%H%M%S")


def mkdir(path):
    if not os.path.exists(path):
        os.makedirs(path, exist_ok=True)


def mkdirs(paths):
    if isinstance(paths, str):
        mkdir(paths)
    else:
        for path in paths:
            mkdir(path)


def mkdir_and_rename(path):
    """Archive an existing experiment dir by rename, never clobber
    (reference: util.py:141-148)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        print(f"Path already exists. Rename it to [{new_name}]")
        logger = logging.getLogger("base")
        logger.info("Path already exists. Rename it to [%s]", new_name)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(logger_name, root, phase, level=logging.INFO, screen=False, tofile=False):
    """Named logger to screen and/or file (reference: util.py:158-172)."""
    lg = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s", datefmt="%y-%m-%d %H:%M:%S"
    )
    lg.setLevel(level)
    lg.propagate = False
    if tofile:
        log_file = os.path.join(root, phase + f"_{get_timestamp()}.log")
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(formatter)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(formatter)
        lg.addHandler(sh)
    return lg


_NAT_SPLIT = re.compile(r"(\d+)")


def natsorted(items, key=None):
    """Natural sort (replacement for the natsort package used by the
    reference inference CLIs, e.g. infer_dataset_lol.py:20-21)."""

    def natkey(s):
        s = key(s) if key is not None else s
        return [int(t) if t.isdigit() else t.lower() for t in _NAT_SPLIT.split(str(s))]

    return sorted(items, key=natkey)


def get_resume_paths(opt):
    """``resume_state: auto`` -> newest state in training_state dir
    (reference: util.py:228-244)."""
    resume_state_path = None
    resume_model_path = None
    ts = opt_get(opt, ["path", "training_state"])
    if opt.get("path", {}).get("resume_state", None) == "auto" and ts is not None:
        wildcard = os.path.join(ts, "*")
        import glob

        paths = natsorted(glob.glob(wildcard))
        if len(paths) > 0:
            resume_state_path = paths[-1]
            resume_model_path = resume_state_path.replace(
                "training_state", "models"
            ).replace(".state", "_G")
    else:
        resume_state_path = opt.get("path", {}).get("resume_state")
    return resume_state_path, resume_model_path


def copy_tree_once(src, dst):
    if not os.path.exists(dst):
        shutil.copytree(src, dst)
