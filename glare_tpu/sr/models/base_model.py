"""Base trainer for the stage-1 framework
(reference: basicsr/models/base_model.py).

Functional-JAX equivalents of: model_to_device/DDP (jit + sharding instead),
get_optimizer, scheduler setup, EMA (`model_ema`:85 -> optax incremental
update), best-metric tracking (:50-84), save/load with params/params_ema
keys and 3-retry IO (:212-257), training-state save/resume, and
reduce_loss_dict (:371-396 — a jax.lax.pmean in multi-host settings; host
floats here).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ...utils.util import natsorted


class BaseSRModel:
    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt.get("is_train", True)
        self.schedulers = []
        self.log_dict: Dict[str, float] = {}
        self.best_metric_results: Dict[str, Any] = {}

    # ---------------- EMA ----------------

    @staticmethod
    @partial(jax.jit, static_argnames=("decay",), donate_argnums=(1,))
    def model_ema(params, ema_params, decay=0.999):
        """ema = ema * decay + params * (1 - decay) (reference: base_model.py:85-95).

        Jitted (decay static, old EMA donated): the eager tree.map issued
        one tiny dispatch per parameter tensor — several hundred host->TPU
        round trips per training iteration, which the round-5 stage-1
        profile measured as 94%% of wall (PROFILE_STAGE1_r05.json,
        host_gap 311 ms/img vs 21 ms device)."""
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay), ema_params, params
        )

    @staticmethod
    @partial(jax.jit, static_argnames=("decay",), donate_argnums=(1,))
    def model_ema_flat(params, ema_flat, decay=0.999):
        """EMA against a FLAT-stored average: one concat + one fused axpy
        kernel instead of one kernel per parameter tensor. The pytree
        variant above costs ~36 ms/iter on the stage-1 net (82 launch-
        bound kernels, measured round 5); this runs in <1 ms. Callers keep
        the running average flat and unravel only when it is consumed
        (checkpoint save / eval swap)."""
        from jax.flatten_util import ravel_pytree

        flat = ravel_pytree(params)[0].astype(ema_flat.dtype)
        return ema_flat * decay + flat * (1 - decay)

    # ---------------- best-metric tracking ----------------

    def _initialize_best_metric_results(self, dataset_name):
        if dataset_name in self.best_metric_results:
            return
        record = {}
        for metric, content in self.opt["val"]["metrics"].items():
            better = content.get("better", "higher")
            init_val = float("-inf") if better == "higher" else float("inf")
            record[metric] = dict(better=better, val=init_val, iter=-1)
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(self, dataset_name, metric, val, current_iter):
        record = self.best_metric_results[dataset_name][metric]
        improved = (
            val >= record["val"] if record["better"] == "higher" else val <= record["val"]
        )
        if improved:
            record["val"] = val
            record["iter"] = current_iter
        return improved

    # ---------------- persistence ----------------

    def save_network(self, param_dicts, net_label, current_iter, param_keys=("params",)):
        """Save with params/params_ema keys and retry IO
        (reference: base_model.py:212-257)."""
        if current_iter == -1:
            current_iter = "latest"
        save_filename = f"net_{net_label}_{current_iter}.flax"
        save_path = os.path.join(self.opt["path"]["models"], save_filename)
        os.makedirs(self.opt["path"]["models"], exist_ok=True)
        payload = dict(zip(param_keys, param_dicts))
        data = serialization.to_bytes(payload)
        for retry in range(3):
            try:
                with open(save_path, "wb") as f:
                    f.write(data)
                break
            except Exception as e:
                print(f"Save model error: {e}, remaining retry times: {2 - retry}")
                time.sleep(1)
        return save_path

    @staticmethod
    def load_network_params(path, template, param_key="params", strict=True):
        with open(path, "rb") as f:
            data = f.read()
        restored = serialization.msgpack_restore(data)
        if param_key in restored:
            restored = restored[param_key]
        elif "params" in restored:
            restored = restored["params"]
        from ...models.base_model import _merge_loose

        if strict:
            return serialization.from_bytes(template, serialization.msgpack_serialize(restored)) \
                if not isinstance(restored, dict) else _strict_cast(template, restored)
        return _merge_loose(template, restored)

    def save_training_state(self, epoch, current_iter, state):
        os.makedirs(self.opt["path"]["training_states"], exist_ok=True)
        fn = os.path.join(self.opt["path"]["training_states"], f"{current_iter}.state")
        payload = {"epoch": epoch, "iter": current_iter, "state": state}
        with open(fn, "wb") as f:
            f.write(serialization.to_bytes(payload))
        import glob

        existing = natsorted(glob.glob(os.path.join(self.opt["path"]["training_states"], "*.state")))
        for old in existing[:-2]:
            os.remove(old)
        return fn

    def resume_training_state(self, path, template_state):
        with open(path, "rb") as f:
            data = f.read()
        payload = {"epoch": 0, "iter": 0, "state": template_state}
        return serialization.from_bytes(payload, data)

    def reduce_loss_dict(self, loss_dict):
        """Average losses across data-parallel replicas when distributed
        (reference: base_model.py:371-396). Single-host: float cast.

        Returns a LAZY dict: the device->host read (one ~30 ms tunnel
        round trip on this backend, measured round 5) happens on first
        VALUE access, not per iteration — the train loop only reads losses
        every print-freq iters, so steady-state iterations never block on
        the transfer. All values ride ONE stacked transfer when they do
        materialize."""
        return _LazyLossDict(loss_dict)

    def get_current_log(self):
        return self.log_dict


class _LazyLossDict(dict):
    """Loss dict whose device scalars materialize to floats on first value
    access (one stacked transfer for all keys). Keys/len/iteration are free;
    any value read triggers the transfer. Keeps reference API (floats in
    log_dict) without paying a device sync on every training iteration."""

    def __init__(self, raw):
        super().__init__(raw)
        self._materialized = False

    def _materialize(self):
        if self._materialized:
            return
        self._materialized = True
        keys = [k for k in dict.keys(self)
                if hasattr(dict.__getitem__(self, k), "dtype")]
        if keys:
            stacked = np.asarray(jnp.stack(
                [jnp.asarray(dict.__getitem__(self, k), jnp.float32)
                 for k in keys]))
            for k, v in zip(keys, stacked.tolist()):
                dict.__setitem__(self, k, v)
        for k in dict.keys(self):
            v = dict.__getitem__(self, k)
            if not isinstance(v, float):
                dict.__setitem__(self, k, float(v))

    def __getitem__(self, k):
        self._materialize()
        return dict.__getitem__(self, k)

    def get(self, k, default=None):
        self._materialize()
        return dict.get(self, k, default)

    def items(self):
        self._materialize()
        return dict.items(self)

    def values(self):
        self._materialize()
        return dict.values(self)

    def copy(self):
        self._materialize()
        return dict(dict.items(self))


def _strict_cast(template, restored):
    import jax.numpy as jnp

    def cast(t, r):
        if isinstance(t, dict):
            return {k: cast(t[k], r[k]) for k in t}
        return jnp.asarray(r)

    return cast(template, restored)
