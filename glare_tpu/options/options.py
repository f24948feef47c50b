"""YAML config / flag system.

Behavioral parity with the reference option layer
(``/root/reference/code/options/options.py:10-130``):

  * ``parse(opt_path, is_train)`` -> nested dict; injects ``is_train``,
    per-phase ``phase``, ``scale``, ``data_type``; synthesizes experiment /
    results path trees; expands relative LR milestones
    (``lr_steps_rel`` * ``niter`` -> ``lr_steps``).
  * ``dict_to_nonedict`` wraps every nested dict in :class:`NoneDict`, whose
    missing keys read as ``None`` so feature flags can be probed with plain
    indexing.
  * ``check_resume`` rewires pretrain paths when resuming from a state file.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from collections import OrderedDict

import yaml


def _ordered_yaml():
    """Support OrderedDict round-tripping (reference: code/utils/util.py:104-127)."""
    loader, dumper = yaml.SafeLoader, yaml.SafeDumper
    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    dumper.add_representer(OrderedDict, dict_representer)
    loader.add_constructor(_mapping_tag, dict_constructor)
    return loader, dumper


Loader, Dumper = _ordered_yaml()


class NoneDict(dict):
    """dict whose missing keys read as None (reference: options.py:98-113)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    if isinstance(opt, dict):
        new_opt = {k: dict_to_nonedict(v) for k, v in opt.items()}
        return NoneDict(**new_opt)
    elif isinstance(opt, list):
        return [dict_to_nonedict(v) for v in opt]
    else:
        return opt


def parse(opt_path, is_train=True):
    with open(opt_path, mode="r") as f:
        opt = yaml.load(f, Loader=Loader)

    opt["is_train"] = is_train
    if "scale" not in opt:
        opt["scale"] = 1
    scale = opt["scale"]

    # datasets
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_name = phase.split("_")[0]
        dataset["phase"] = phase_name
        dataset["scale"] = scale
        is_lmdb = False
        if dataset.get("dataroot_GT") is not None:
            dataset["dataroot_GT"] = osp.expanduser(dataset["dataroot_GT"])
            if dataset["dataroot_GT"].endswith("lmdb"):
                is_lmdb = True
        if dataset.get("dataroot_LQ") is not None:
            dataset["dataroot_LQ"] = osp.expanduser(dataset["dataroot_LQ"])
            if dataset["dataroot_LQ"].endswith("lmdb"):
                is_lmdb = True
        dataset["data_type"] = "lmdb" if is_lmdb else "img"

    # paths
    opt.setdefault("path", {})
    for key, path in opt["path"].items():
        if path and "resume" not in key and "strict" not in key and "pretrain" not in key:
            opt["path"][key] = osp.expanduser(path)
    opt["path"]["root"] = os.environ.get("GLARE_ROOT", os.getcwd())

    if is_train:
        experiments_root = osp.join(opt["path"]["root"], "experiments", opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_state"] = osp.join(experiments_root, "training_state")
        opt["path"]["log"] = experiments_root
        opt["path"]["val_images"] = osp.join(experiments_root, "val_images")

        # debug-name overrides (reference: options.py:54-58)
        if "debug" in opt["name"]:
            opt["train"]["val_freq"] = 8
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(opt["path"]["root"], "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root

    # network scale
    if "network_G" in opt:
        opt["network_G"]["scale"] = scale

    # relative learning-rate milestones (reference: options.py:70-80)
    train = opt.get("train")
    if train is not None:
        niter = train.get("niter")
        if train.get("T_period_rel") is not None:
            train["T_period"] = [int(x * niter) for x in train["T_period_rel"]]
        if train.get("restarts_rel") is not None:
            train["restarts"] = [int(x * niter) for x in train["restarts_rel"]]
        if train.get("lr_steps_rel") is not None:
            train["lr_steps"] = [int(x * niter) for x in train["lr_steps_rel"]]
        if train.get("lr_steps_inverse_rel") is not None:
            train["lr_steps_inverse"] = [int(x * niter) for x in train["lr_steps_inverse_rel"]]

    return opt


def save_opt(opt, path):
    with open(path, "w") as f:
        yaml.dump(_plain(opt), f, default_flow_style=False)


def _plain(o):
    if isinstance(o, dict):
        return {k: _plain(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_plain(v) for v in o]
    return o


def dict2str(opt, indent_l=1):
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg


def check_resume(opt, resume_iter):
    """Adjust pretrain paths when resuming (reference: options.py:116-130)."""
    logger = logging.getLogger("base")
    if opt["path"].get("resume_state"):
        if opt["path"].get("pretrain_model_G") or opt["path"].get("pretrain_model_D"):
            logger.warning("pretrain_model paths will be ignored when resuming training.")
        opt["path"]["pretrain_model_G"] = osp.join(
            opt["path"]["models"], f"{resume_iter}_G"
        )
        logger.info("Set [pretrain_model_G] to %s", opt["path"]["pretrain_model_G"])
