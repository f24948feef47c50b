"""Training loop shared by stage 2 and stage 3
(reference: code/train_stage2.py:52-364 / train_stage3.py:52-360).

Kept behaviors: resume_state auto-discovery, experiment-dir archival,
tensorboard scalars every 5 iters (loss, lr, time/iteration, time/data,
eta), checkpoint cadence with late-training densification (every 200/100/50
iters past 30k/40k/50k, train_stage2.py:337-343), best-PSNR snapshots,
keep-2 training states.
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_dataloader, create_dataset
from ..models import create_model
from ..options import dict_to_nonedict, dict2str, parse
from ..utils import Timer, TickTock, mkdir_and_rename, mkdirs, set_random_seed, setup_logger
from ..utils.metrics import PSNR, gray_mean_adjust
from ..utils.util import get_resume_paths, opt_get


def get_resume_state(opt):
    resume_state_path, _ = get_resume_paths(opt)
    if resume_state_path is None or not os.path.isfile(resume_state_path):
        return None, None
    return resume_state_path, None


def main(stage=2, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", default=f"./confs/train_stage{stage}_LOL.yml")
    parser.add_argument("--niter", type=int, default=None, help="override train.niter")
    args = parser.parse_args(argv)
    opt = parse(args.opt, is_train=True)
    if args.niter:
        opt["train"]["niter"] = args.niter
        if opt["train"].get("lr_steps_rel"):
            opt["train"]["lr_steps"] = [
                int(x * args.niter) for x in opt["train"]["lr_steps_rel"]
            ]
    opt = dict_to_nonedict(opt)

    resume_state_path, _ = get_resume_state(opt)

    if resume_state_path is None:
        mkdir_and_rename(opt["path"]["experiments_root"])
        mkdirs(
            path for key, path in opt["path"].items()
            if isinstance(path, str) and key not in ("experiments_root", "strict_load", "pretrain_model_G", "resume_state", "root", "pretrained_vqgan")
            and "pretrain" not in key and "resume" not in key
        )

    setup_logger("base", opt["path"]["log"], "train_" + opt["name"], level=logging.INFO,
                 screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(dict2str(opt))

    tb_logger = None
    if opt.get("use_tb_logger") and "debug" not in opt["name"]:
        try:
            from tensorboardX import SummaryWriter

            tb_dir = os.path.join(opt["path"]["experiments_root"], "tb_logger")
            tb_logger = SummaryWriter(log_dir=tb_dir)
        except Exception as e:  # tensorboard is optional
            logger.warning("tensorboard unavailable: %s", e)

    seed = opt_get(opt, ["train", "manual_seed"], 10) or 10
    set_random_seed(seed)

    # datasets
    dataset_opt_train = opt["datasets"]["train"]
    train_set = create_dataset(dataset_opt_train, train=True, all_opt=opt)
    train_loader = create_dataloader(True, train_set, dataset_opt_train, opt, seed=seed)
    dataset_opt_val = opt["datasets"]["val"]
    val_set = create_dataset(dataset_opt_val, train=False, all_opt=opt)
    val_loader = create_dataloader(False, val_set, dataset_opt_val, opt, seed=seed)

    total_iters = int(opt["train"]["niter"])
    total_epochs = int(math.ceil(total_iters / max(len(train_loader), 1)))
    logger.info("Total epochs: %d, iters: %d", total_epochs, total_iters)

    model = create_model(opt)

    current_step = 0
    start_epoch = 0
    if resume_state_path is not None:
        logger.info("Resuming from %s", resume_state_path)
        start_epoch, current_step = model.resume_training(resume_state_path)

    timer = Timer()
    tick_tock = TickTock()
    print_freq = opt["logger"]["print_freq"] or 100
    save_freq = int(opt["logger"]["save_checkpoint_freq"] or 1000)
    val_freq = int(opt["train"]["val_freq"] or 10 ** 12)
    best_psnr = -1.0

    t_start = time.time()
    for epoch in range(start_epoch, total_epochs + 10):
        if current_step > total_iters:
            break
        tick_tock.tick()
        for batch in train_loader:
            tick_tock.tock()
            current_step += 1
            if current_step > total_iters:
                break
            timer.tick()
            feed = {
                "LQ": jnp.asarray(batch["LQ"]),
                "GT": jnp.asarray(batch["GT"]),
            }
            losses = model.optimize_parameters(feed, current_step)
            timer.tock()

            # failure detection: a NaN/inf loss aborts the step stream and
            # auto-reloads the newest healthy training state (the reference
            # has no recovery beyond manual resume; SURVEY.md §5)
            log_vals = list(model.get_current_log().values())
            if log_vals and not all(math.isfinite(v) for v in log_vals):
                logger.warning(
                    "Non-finite loss at iter %d: %s — reloading newest state",
                    current_step, model.get_current_log(),
                )
                from ..utils.util import get_resume_paths

                state_path, _ = get_resume_paths(
                    {"path": dict(opt["path"], resume_state="auto")}
                )
                if state_path and os.path.isfile(state_path):
                    _, current_step = model.resume_training(state_path)
                    continue
                raise FloatingPointError(
                    f"non-finite loss at iter {current_step} and no state to reload"
                )

            if current_step % print_freq == 0:
                avg_it = timer.get_average_and_reset()
                avg_data = tick_tock.get_average_and_reset()
                eta = (total_iters - current_step) * max(avg_it, 0)
                lr_now = float(model.schedule(current_step))
                msg = (
                    f"<epoch:{epoch:3d}, iter:{current_step:8,d}, lr:{lr_now:.3e}> "
                    + " ".join(f"{k}: {v:.4e}" for k, v in model.get_current_log().items())
                    + f" it/s:{1.0 / max(avg_it, 1e-9):.2f} eta:{eta / 3600:.2f}h"
                )
                logger.info(msg)
                if tb_logger:
                    for k, v in model.get_current_log().items():
                        tb_logger.add_scalar(f"loss/{k}", v, current_step)
                    tb_logger.add_scalar("lr", lr_now, current_step)
                    tb_logger.add_scalar("time/iteration", avg_it, current_step)
                    tb_logger.add_scalar("time/data", avg_data, current_step)
                    tb_logger.add_scalar("eta_h", eta / 3600, current_step)

            # checkpoint cadence with late-training densification
            dens = (
                (current_step > 50000 and current_step % 50 == 0)
                or (current_step > 40000 and current_step % 100 == 0)
                or (current_step > 30000 and current_step % 200 == 0)
            )
            if current_step % save_freq == 0 or dens:
                logger.info("Saving models and training states.")
                model.save(current_step)
                model.save_training(epoch, current_step)

            if current_step % val_freq == 0:
                psnr = validate(model, val_loader, opt, stage, current_step, logger, tb_logger)
                if psnr > best_psnr:
                    best_psnr = psnr
                    model.save(f"best_psnr_{current_step}")
            tick_tock.tick()

    model.save(current_step)
    model.save_training(epoch, current_step)
    logger.info("End of training. Total time: %.1fs", time.time() - t_start)
    return model, current_step


def validate(model, val_loader, opt, stage, step, logger, tb_logger=None, n_max=4):
    psnrs = []
    for i, batch in enumerate(val_loader):
        if i >= n_max:
            break
        lq = jnp.asarray(batch["LQ"])
        gt = np.asarray(batch["GT"])[0]
        sr = model.get_sr(lq)
        if stage == 2:
            sr = model.decode_latent(sr)
        sr = np.clip(np.asarray(sr)[0], 0, 1)
        if sr.shape != gt.shape:
            sr = sr[: gt.shape[0], : gt.shape[1]]
        sr = gray_mean_adjust(sr, gt)
        psnrs.append(PSNR(gt, sr))
    mean_psnr = float(np.mean(psnrs)) if psnrs else float("nan")
    logger.info("# Validation # PSNR: %.4f (step %d)", mean_psnr, step)
    if tb_logger:
        tb_logger.add_scalar("val/psnr", mean_psnr, step)
    return mean_psnr
