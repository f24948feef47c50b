"""Stage-1 option parsing (reference: basicsr/utils/options.py:82-194).

argparse + YAML; ``--force_yml`` key overrides; ``--debug`` name prefix;
``--auto_resume``; per-process seed offset (the reference's seed+rank). The
``--launcher`` flag is accepted for CLI parity — JAX SPMD replaces
torch.distributed process groups, and multi-host init is
``jax.distributed.initialize`` driven by env vars.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import yaml

from ...options.options import Loader, dict_to_nonedict


def ordered_yaml_load(path):
    with open(path, "r") as f:
        return yaml.load(f, Loader=Loader)


def parse_options(root_path, is_train=True, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument(
        "--launcher", choices=["none", "pytorch", "slurm", "jax"], default="none"
    )
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument(
        "--force_yml", nargs="+", default=None,
        help="Force to update yml files. Examples: train:ema_decay=0.999",
    )
    args = parser.parse_args(argv)

    opt = ordered_yaml_load(args.opt)

    # distributed settings: SPMD via jax sharding; multi-host via
    # jax.distributed.initialize (env-driven), not NCCL process groups.
    opt["dist"] = args.launcher not in ("none",)
    opt["rank"], opt["world_size"] = 0, 1
    if opt["dist"]:
        import jax

        try:
            jax.distributed.initialize()
        except Exception:
            pass
        opt["rank"] = jax.process_index()
        opt["world_size"] = jax.process_count()

    # random seed (+rank offset, reference: options.py:108-114)
    seed = opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed
    opt["manual_seed"] = seed + opt["rank"]

    # force_yml overrides
    if args.force_yml is not None:
        for entry in args.force_yml:
            keys, value = entry.split("=")
            keys, value = keys.strip(), value.strip()
            value = f"{value}"
            eval_str = "opt"
            for key in keys.split(":"):
                eval_str += f'["{key}"]'
            eval_str += "=value"
            try:
                value = yaml.safe_load(value)
            except Exception:
                pass
            exec(eval_str)

    opt["auto_resume"] = args.auto_resume
    opt["is_train"] = is_train

    if args.debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    if opt.get("num_gpu") == "auto":
        import jax

        opt["num_gpu"] = jax.device_count()

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_name = phase.split("_")[0]
        dataset["phase"] = phase_name
        if "scale" in opt:
            dataset["scale"] = opt["scale"]

    if is_train:
        experiments_root = os.path.join(root_path, "experiments", opt["name"])
        opt["path"] = opt.get("path") or {}
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = os.path.join(experiments_root, "models")
        opt["path"]["training_states"] = os.path.join(experiments_root, "training_states")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = os.path.join(experiments_root, "visualization")
        if args.debug:
            opt["val"] = opt.get("val") or {}
            opt["val"]["val_freq"] = 8
            opt["logger"] = opt.get("logger") or {}
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = os.path.join(root_path, "results", opt["name"])
        opt["path"] = opt.get("path") or {}
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = os.path.join(results_root, "visualization")

    return dict_to_nonedict(opt), args
