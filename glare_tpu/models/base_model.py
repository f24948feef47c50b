"""Base trainer: checkpoint/state IO, LR bookkeeping
(reference: code/models/base_model.py:16-234).

Artifacts mirror the reference's two-file split:
  * ``{iter}_G.flax``  — network params (flax msgpack bytes; the torch
    analogue is ``{iter}_G.pth``)
  * ``{iter}.state``   — training state {epoch, iter, opt_state, params}
    with only the 2 newest kept (base_model.py:188-219)

``resume_training`` restores optimizer state; ``load_network`` tolerates
missing/extra leaves when strict=False (the reference's strict=False
load_state_dict).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from ..utils.util import natsorted, opt_get


class BaseModel:
    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt.get("is_train", False)
        self.log_dict = {}

    # ---------------- checkpoint IO ----------------

    def _models_dir(self):
        return self.opt["path"]["models"]

    def _state_dir(self):
        return self.opt["path"]["training_state"]

    def save_network(self, params, network_label, iter_label):
        os.makedirs(self._models_dir(), exist_ok=True)
        fn = os.path.join(self._models_dir(), f"{iter_label}_{network_label}.flax")
        with open(fn, "wb") as f:
            f.write(serialization.to_bytes(params))
        return fn

    @staticmethod
    def load_params(path, template=None, strict=True):
        with open(path, "rb") as f:
            data = f.read()
        if template is not None:
            if strict:
                return serialization.from_bytes(template, data)
            try:
                return serialization.from_bytes(template, data)
            except Exception:
                # tolerant merge: keep template leaves missing from the file
                loaded = serialization.msgpack_restore(data)
                return _merge_loose(template, loaded)
        return serialization.msgpack_restore(data)

    def save_training_state(self, epoch, iter_step, state_pytree):
        """Keep only the 2 newest .state files (reference: base_model.py:205-218)."""
        os.makedirs(self._state_dir(), exist_ok=True)
        fn = os.path.join(self._state_dir(), f"{iter_step}.state")
        payload = {"epoch": epoch, "iter": iter_step, "state": state_pytree}
        with open(fn, "wb") as f:
            f.write(serialization.to_bytes(payload))
        existing = natsorted(glob.glob(os.path.join(self._state_dir(), "*.state")))
        for old in existing[:-2]:
            os.remove(old)
        return fn

    @staticmethod
    def load_training_state(path, template_state):
        with open(path, "rb") as f:
            data = f.read()
        payload = {"epoch": 0, "iter": 0, "state": template_state}
        return serialization.from_bytes(payload, data)

    # ---------------- misc parity helpers ----------------

    def get_current_log(self):
        return self.log_dict

    def get_network_description(self, params):
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        return f"{type(self).__name__}", n


def _merge_loose(template, loaded):
    if isinstance(template, dict) and isinstance(loaded, dict):
        out = {}
        for k, v in template.items():
            out[k] = _merge_loose(v, loaded[k]) if k in loaded else v
        return out
    if loaded is None:
        return template
    if hasattr(template, "shape") and hasattr(loaded, "shape"):
        if tuple(template.shape) != tuple(loaded.shape):
            return template
    import jax.numpy as jnp

    return jnp.asarray(loaded)
