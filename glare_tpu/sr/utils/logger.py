"""Training observability (reference: basicsr/utils/logger.py).

AvgTimer (:10-44), MessageLogger (:45-117, epoch/iter/lr/time/eta + tb
scalars), tensorboard init helper, environment banner.
"""

from __future__ import annotations

import datetime
import logging
import time


class AvgTimer:
    def __init__(self, window=200):
        self.window = window
        self.current_time = 0
        self.total_time = 0
        self.count = 0
        self.avg_time = 0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """Formats per-iteration training logs and mirrors them to tensorboard."""

    def __init__(self, opt, start_iter=1, tb_logger=None):
        self.exp_name = opt["name"]
        logger_opt = opt["logger"] or {}
        self.interval = logger_opt.get("print_freq", 100)
        self.start_iter = start_iter
        self.max_iters = (opt.get("train") or {}).get("total_iter", 0)
        self.use_tb_logger = bool(logger_opt.get("use_tb_logger"))
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = logging.getLogger("base")

    def __call__(self, log_vars):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch")
        lrs = log_vars.pop("lrs", [])

        message = f"[{self.exp_name[:20]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:("
        message += ", ".join(f"{v:.3e}" for v in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(max(eta_sec, 0))))
            message += f"[eta: {eta_str}, time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger and self.use_tb_logger:
                key = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir):
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except Exception:
        return None


def init_wandb_logger(opt):
    """Sync tensorboard logs to wandb (reference: logger.py:126-143).

    Activates when the `wandb` package is installed (it is not baked into
    this image); otherwise logs a warning and returns None so training
    proceeds with tensorboard only.
    """
    import logging

    logger = logging.getLogger("glare_tpu.sr")
    try:
        import wandb
    except ImportError:
        logger.warning(
            "wandb logger requested (logger.wandb.project) but the wandb "
            "package is not installed; continuing with tensorboard only"
        )
        return None

    project = opt["logger"]["wandb"]["project"]
    resume_id = (opt["logger"]["wandb"] or {}).get("resume_id")
    if resume_id:
        wandb_id = resume_id
        resume = "allow"
        logger.warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id = wandb.util.generate_id()
        resume = "never"
    wandb.init(
        id=wandb_id, resume=resume, name=opt["name"], config=opt,
        project=project, sync_tensorboard=True,
    )
    logger.info(f"Use wandb logger with id={wandb_id}; project={project}.")
    return wandb_id


def get_env_info():
    import jax

    return (
        f"\nglare_tpu stage-1 framework"
        f"\n\tjax: {jax.__version__}"
        f"\n\tbackend: {jax.default_backend()}"
        f"\n\tdevices: {jax.device_count()}"
    )
