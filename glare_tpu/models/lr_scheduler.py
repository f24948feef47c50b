"""LR schedules as pure step->lr functions (optax-compatible).

Parity targets: MultiStepLR_Restart and CosineAnnealingLR_Restart
(reference: code/models/lr_scheduler.py:8-65) plus the linear warmup from
BaseModel.update_learning_rate (base_model.py:67-80). The torch versions are
stateful multiplicative schedulers; these are the equivalent closed forms.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def multistep_restart_schedule(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.5,
    restarts: Optional[Sequence[int]] = None,
    restart_weights: Optional[Sequence[int]] = None,
    warmup_iter: int = -1,
):
    """lr(step) = base * weight(last restart <= step) * gamma^{#milestones in
    (last_restart, step]}, with linear warmup over the first warmup_iter
    steps."""
    milestones = np.asarray(sorted(milestones or []), np.int64)
    restarts = np.asarray(sorted(restarts or [0]), np.int64)
    restart_weights = np.asarray(
        restart_weights if restart_weights is not None else [1.0] * len(restarts),
        np.float32,
    )
    if restarts[0] != 0:
        restarts = np.concatenate([[0], restarts])
        restart_weights = np.concatenate([[1.0], restart_weights])

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        ri = jnp.sum(step >= jnp.asarray(restarts)) - 1
        last_restart = jnp.asarray(restarts)[ri]
        weight = jnp.asarray(restart_weights)[ri]
        n = jnp.sum(
            (jnp.asarray(milestones)[None, :] > last_restart)
            & (jnp.asarray(milestones)[None, :] <= step)
        ) if len(milestones) else jnp.asarray(0)
        lr = base_lr * weight * (gamma ** n.astype(jnp.float32))
        if warmup_iter > 0:
            lr = jnp.where(
                step < warmup_iter, base_lr * step.astype(jnp.float32) / warmup_iter, lr
            )
        return lr

    return schedule


def cosine_restart_schedule(
    base_lr: float,
    T_period: Sequence[int],
    eta_min: float = 0.0,
    restarts: Optional[Sequence[int]] = None,
    restart_weights: Optional[Sequence[int]] = None,
    warmup_iter: int = -1,
):
    """Cosine annealing with warm restarts (closed form of the reference)."""
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1.0] * len(restarts))
    starts = np.asarray([0] + restarts, np.int64)
    weights = np.asarray([1.0] + list(restart_weights), np.float32)
    periods = np.asarray(T_period, np.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        ri = jnp.sum(step >= jnp.asarray(starts)) - 1
        last_restart = jnp.asarray(starts)[ri]
        weight = jnp.asarray(weights)[ri]
        T = jnp.asarray(periods)[ri]
        t = (step - last_restart).astype(jnp.float32)
        lr = eta_min + (base_lr * weight - eta_min) * (1 + jnp.cos(math.pi * t / T)) / 2
        if warmup_iter > 0:
            lr = jnp.where(
                step < warmup_iter, base_lr * step.astype(jnp.float32) / warmup_iter, lr
            )
        return lr

    return schedule


def build_schedule(train_opt: dict):
    """Construct the schedule named by a GLARE train conf
    (reference: LLFlow_model.py:121-139)."""
    scheme = train_opt.get("lr_scheme", "MultiStepLR")
    base_lr = float(train_opt["lr_G"])
    warmup = int(train_opt.get("warmup_iter") or -1)
    if scheme == "MultiStepLR":
        return multistep_restart_schedule(
            base_lr,
            train_opt.get("lr_steps") or [],
            gamma=float(train_opt.get("lr_gamma") or 0.1),
            restarts=train_opt.get("restarts"),
            restart_weights=train_opt.get("restart_weights"),
            warmup_iter=warmup,
        )
    if scheme == "CosineAnnealingLR_Restart":
        return cosine_restart_schedule(
            base_lr,
            train_opt["T_period"],
            eta_min=float(train_opt.get("eta_min") or 0.0),
            restarts=train_opt.get("restarts"),
            restart_weights=train_opt.get("restart_weights"),
            warmup_iter=warmup,
        )
    raise NotImplementedError(f"lr_scheme {scheme}")
