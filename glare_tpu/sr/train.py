"""Config-driven stage-1 training pipeline (reference: basicsr/train.py:107-243).

``python -m glare_tpu.sr.train -opt confs/stage1_HQ_pretrain.yml``

Kept: resume-state discovery, experiment dirs, TB init, train/val loaders
with rank-sharded sampling (EnlargedSampler), message logger, the iter loop
with validation and checkpoint hooks.
"""

from __future__ import annotations

import datetime
import glob
import logging
import math
import os
import time

import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import EnlargedSampler
from ..utils import mkdir_and_rename, set_random_seed, setup_logger
from ..utils.metrics import PSNR, calculate_ssim, img_as_ubyte
from ..utils.util import natsorted
from .data import build_dataloader, build_dataset
from .models import build_model
from .utils import AvgTimer, MessageLogger, get_env_info, parse_options
from .utils.logger import init_tb_logger


def load_resume_state(opt):
    resume_state_path = None
    if opt.get("auto_resume"):
        state_path = os.path.join("experiments", opt["name"], "training_states")
        if os.path.isdir(state_path):
            states = natsorted(glob.glob(os.path.join(state_path, "*.state")))
            if states:
                resume_state_path = states[-1]
                opt["path"]["resume_state"] = resume_state_path
    else:
        if opt["path"].get("resume_state"):
            resume_state_path = opt["path"]["resume_state"]
    return resume_state_path


def create_train_val_dataloader(opt, logger):
    train_loader, val_loaders = None, []
    train_sampler = None
    total_iters = 0
    total_epochs = 0
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            dataset_enlarge_ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            train_set = build_dataset(dataset_opt)
            train_sampler = EnlargedSampler(
                len(train_set), opt["world_size"], opt["rank"], dataset_enlarge_ratio
            )
            train_loader = build_dataloader(train_set, dataset_opt, seed=opt["manual_seed"])
            num_iter_per_epoch = math.ceil(
                len(train_set) * dataset_enlarge_ratio /
                (dataset_opt.get("batch_size_per_gpu", 1) * opt["world_size"])
            )
            total_iters = int(opt["train"]["total_iter"])
            total_epochs = math.ceil(total_iters / max(num_iter_per_epoch, 1))
            logger.info(
                f"Training statistics:\n\tNumber of train images: {len(train_set)}"
                f"\n\tTotal epochs: {total_epochs}; iters: {total_iters}."
            )
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dataset_opt)
            val_loaders.append(build_dataloader(val_set, dataset_opt, seed=opt["manual_seed"]))
    return train_loader, train_sampler, val_loaders, total_epochs, total_iters


def validate(model, val_loader, current_iter, logger, tb_logger, opt):
    psnrs, ssims = [], []
    n_max = (opt["val"] or {}).get("n_max", 16) or 16
    for i, batch in enumerate(val_loader):
        if i >= n_max:
            break
        out = model.test(jnp.asarray(batch["lq"]))
        out = np.clip(np.asarray(out)[0], 0, 1)
        gt = np.asarray(batch["gt"])[0]
        psnrs.append(PSNR(gt, out))
        ssims.append(calculate_ssim(img_as_ubyte(gt), img_as_ubyte(out)))
    psnr, ssim = float(np.mean(psnrs)), float(np.mean(ssims))
    logger.info(f"# Validation # iter {current_iter} PSNR {psnr:.4f} SSIM {ssim:.4f}")
    if tb_logger:
        tb_logger.add_scalar("val/psnr", psnr, current_iter)
        tb_logger.add_scalar("val/ssim", ssim, current_iter)
    dataset_name = "val"
    model._initialize_best_metric_results(dataset_name)
    if "psnr" in (opt["val"] or {}).get("metrics", {"psnr": {}}):
        improved = model._update_best_metric_result(dataset_name, "psnr", psnr, current_iter)
        if improved:
            model.save_best(current_iter)
    return psnr


def train_pipeline(root_path=".", argv=None):
    opt, args = parse_options(root_path, is_train=True, argv=argv)
    # default metrics entry so best-tracking works without conf noise
    if opt["val"] is None:
        opt["val"] = {"metrics": {"psnr": {"type": "psnr", "better": "higher"}}}
    elif opt["val"].get("metrics") is None:
        opt["val"]["metrics"] = {"psnr": {"type": "psnr", "better": "higher"}}

    resume_state_path = load_resume_state(opt)
    if resume_state_path is None and opt["rank"] == 0:
        mkdir_and_rename(opt["path"]["experiments_root"])
        os.makedirs(opt["path"]["models"], exist_ok=True)
        os.makedirs(opt["path"]["training_states"], exist_ok=True)

    setup_logger("base", opt["path"]["log"], "train", screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(get_env_info())

    set_random_seed(opt["manual_seed"])

    tb_logger = None
    if (opt.get("logger") or {}).get("use_tb_logger") and "debug" not in opt["name"]:
        # wandb first so it can sync_tensorboard (reference: train.py:35-42)
        if ((opt["logger"].get("wandb") or {}).get("project")) is not None:
            from .utils.logger import init_wandb_logger

            init_wandb_logger(opt)
        tb_logger = init_tb_logger(os.path.join(opt["path"]["experiments_root"], "tb_logger"))

    train_loader, train_sampler, val_loaders, total_epochs, total_iters = (
        create_train_val_dataloader(opt, logger)
    )

    model = build_model(opt)

    start_epoch, current_iter = 0, 0
    if resume_state_path is not None:
        template = {"params_g": model.params_g, "opt_state_g": model.opt_state_g}
        if hasattr(model, "params_d"):
            template["params_d"] = model.params_d
            template["opt_state_d"] = model.opt_state_d
        payload = model.resume_training_state(resume_state_path, template)
        start_epoch, current_iter = payload["epoch"], payload["iter"]
        model.params_g = payload["state"]["params_g"]
        model.opt_state_g = payload["state"]["opt_state_g"]
        if "params_d" in payload["state"]:
            model.params_d = payload["state"]["params_d"]
            model.opt_state_d = payload["state"]["opt_state_d"]
        logger.info(f"Resuming training from epoch {start_epoch}, iter {current_iter}")

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    iter_timer, data_timer = AvgTimer(), AvgTimer()
    start_time = time.time()
    val_freq = (opt.get("val") or {}).get("val_freq") or 10 ** 12
    save_freq = (opt.get("logger") or {}).get("save_checkpoint_freq") or 10 ** 12

    for epoch in range(start_epoch, total_epochs + 1):
        if current_iter >= total_iters:
            break
        train_sampler.set_epoch(epoch)
        for batch in train_loader:
            data_timer.record()
            current_iter += 1
            if current_iter > total_iters:
                break
            model.optimize_parameters(current_iter, batch)
            iter_timer.record()
            if current_iter % (opt["logger"].get("print_freq") or 100) == 0:
                log_vars = {"epoch": epoch, "iter": current_iter,
                            "lrs": [float(opt["train"]["optim_g"].get("lr", 0))],
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time()}
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)
            if current_iter % save_freq == 0:
                logger.info("Saving models and training states.")
                model.save(epoch, current_iter)
            if current_iter % val_freq == 0 and val_loaders:
                for vl in val_loaders:
                    validate(model, vl, current_iter, logger, tb_logger, opt)
            data_timer.start()
            iter_timer.start()

    consumed = datetime.timedelta(seconds=int(time.time() - start_time))
    logger.info(f"End of training. Time consumed: {consumed}")
    model.save(epoch=-1, current_iter=current_iter)
    if val_loaders:
        for vl in val_loaders:
            validate(model, vl, current_iter, logger, tb_logger, opt)
    return model, current_iter


if __name__ == "__main__":
    train_pipeline()
