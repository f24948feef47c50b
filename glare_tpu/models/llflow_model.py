"""Stage-2 trainer: conditional-flow NLL over the frozen VQGAN latent
(reference: code/models/LLFlow_model.py).

Functional JAX redesign of the torch wrapper:
  * one jitted ``train_step`` replaces feed_data/optimize_parameters
    (LLFlow_model.py:181-250): encoder_gt = stop_grad(vq.encode(GT)),
    loss = weight_fl * mean(nll) (+ optional weight_l1 reverse branch)
  * adam with two param groups — '.RRDB.' (the conditional encoder,
    weight_decay 1e-5) vs the flow (weight_decay_G) — via
    optax.multi_transform (LLFlow_model.py:90-121). Note: the reference
    passes 'beta1'/'beta2' as param-group keys, which torch.optim.Adam
    ignores (it reads 'betas'), so it silently trains with (0.9, 0.999);
    we honor the conf's intent and use (beta1, beta2).
  * bf16/f32 policy instead of AMP GradScaler; flow math stays f32.
  * ActNorm data-dependent init runs once on the first batch
    (``initialize_actnorm``), replacing torch's lazy in-forward init.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..modules.flow_layers import merge_actnorm_init
from ..modules.llflow_vqgan2 import LLFlowVQGAN2
from ..modules.vqmodel import VQModel
from ..utils.util import get_resume_paths, opt_get
from .base_model import BaseModel
from .lr_scheduler import build_schedule
from .networks import define_Flow, find_vqgan


def _label_params(params):
    """'rrdb' for conditional-encoder params, 'other' for the flow."""

    def walk(tree, in_rrdb):
        if isinstance(tree, dict):
            return {k: walk(v, in_rrdb or k == "RRDB") for k, v in tree.items()}
        return "rrdb" if in_rrdb else "other"

    return walk(params, False)


class LLFlowModel(BaseModel):
    def __init__(self, opt, step=0):
        super().__init__(opt)
        self.opt = opt
        train_opt = opt.get("train") or {}
        self.heats = opt_get(opt, ["val", "heats"])
        self.hr_size = opt_get(opt, ["datasets", "train", "GT_size"], 256) or 256

        # inference_dtype: bfloat16 halves HBM traffic on the conv stacks;
        # training keeps f32 params with f32 flow math either way
        dtype = None
        if not self.is_train and (opt.get("inference_dtype") == "bfloat16"):
            import jax.numpy as _jnp

            dtype = _jnp.bfloat16
        self.netG = define_Flow(opt, step, dtype=dtype)
        self.net_hq = find_vqgan(opt, dtype=dtype)

        seed = int(opt_get(opt, ["train", "manual_seed"], 10) or 10)
        rng = jax.random.PRNGKey(seed)
        self.rngs = jax.random.split(rng, 4)

        s = self.hr_size
        dummy_lr = jnp.zeros((1, s, s, 3), jnp.float32)
        dummy_gt = jnp.zeros((1, s, s, 3), jnp.float32)
        dummy_latent = jnp.zeros((1, s // 4, s // 4, 3), jnp.float32)

        self.vq_variables = self.net_hq.init(self.rngs[0], dummy_gt)
        self.params = self.netG.init(
            self.rngs[1], dummy_latent, dummy_lr, method=LLFlowVQGAN2.normal_flow
        )["params"]
        self._actnorm_inited = False

        # pretrained VQGAN (converted .flax; reference loads vqgan.pkl)
        vq_path = opt_get(opt, ["path", "pretrained_vqgan"])
        if vq_path and os.path.exists(self._flaxify(vq_path)):
            self.vq_variables = self.load_params(
                self._flaxify(vq_path), self.vq_variables, strict=False
            )
            self._vq_loaded = True
        else:
            self._vq_loaded = False

        if self.is_train:
            self._build_optimizer(train_opt)
        self.log_dict = {}
        self._jit_cache = {}

        # SPMD data parallelism: batch sharded over a 1-D 'data' mesh,
        # params replicated; XLA inserts the gradient all-reduce (the
        # reference's DataParallel/DDP+NCCL surface, SURVEY.md §2.3).
        self.mesh = None
        n_dev = jax.device_count()
        if n_dev > 1 and (opt.get("use_dp", True)):
            from ..parallel.mesh import make_mesh, replicate, shard_batch

            self.mesh = make_mesh()
            self._repl = replicate(self.mesh)
            self._shard = shard_batch(self.mesh)

    def _put_batch(self, x):
        if self.mesh is not None and x.shape[0] % self.mesh.size == 0:
            return jax.device_put(x, self._shard)
        return x

    @staticmethod
    def _flaxify(path):
        base, ext = os.path.splitext(path)
        return path if ext == ".flax" else base + ".flax"

    # ---------------- optimizer ----------------

    def _build_optimizer(self, train_opt):
        wd_G = float(train_opt.get("weight_decay_G") or 0)
        b1 = float(train_opt.get("beta1") or 0.9)
        b2 = float(train_opt.get("beta2") or 0.99)
        self.schedule = build_schedule(train_opt)

        def adam(wd):
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=b2),
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.scale_by_learning_rate(self.schedule),
            )

        labels = _label_params(self.params)
        self.tx = optax.multi_transform(
            {"other": adam(wd_G), "rrdb": adam(1e-5)}, labels
        )
        self.opt_state = self.tx.init(self.params)
        self.weight_fl = float(opt_get(self.opt, ["train", "weight_fl"], 1) or 1)
        self.weight_l1 = float(opt_get(self.opt, ["train", "weight_l1"], 0) or 0)

    # ---------------- actnorm data-dependent init ----------------

    def initialize_actnorm(self, batch):
        """Run once on the first train batch (torch inits lazily in-forward)."""
        if self._actnorm_inited:
            return
        gt_latent = self.encode_gt_latent(batch["GT"])
        (z, nll, _), stats = self.netG.apply(
            {"params": self.params},
            gt_latent,
            batch["LQ"],
            ddinit=True,
            method=LLFlowVQGAN2.normal_flow,
            mutable=["actnorm_init"],
        )
        self.params = merge_actnorm_init(self.params, stats["actnorm_init"])
        self._actnorm_inited = True

    # ---------------- jitted steps ----------------

    def encode_gt_latent(self, gt):
        fn = self._jit_cache.get("encode_gt")
        if fn is None:
            @jax.jit
            def fn(vq_variables, gt):
                h, _ = self.net_hq.apply(vq_variables, gt, method=VQModel.encode)
                return jax.lax.stop_gradient(h)

            self._jit_cache["encode_gt"] = fn
        return fn(self.vq_variables, gt)

    def _train_step_fn(self):
        fn = self._jit_cache.get("train_step")
        if fn is None:
            netG = self.netG
            weight_fl = self.weight_fl
            tx = self.tx

            def loss_fn(params, gt_latent, lq):
                _, nll, _ = netG.apply(
                    {"params": params}, gt_latent, lq, method=LLFlowVQGAN2.normal_flow
                )
                return weight_fl * jnp.mean(nll)

            @jax.jit
            def fn(params, opt_state, gt_latent, lq):
                loss, grads = jax.value_and_grad(loss_fn)(params, gt_latent, lq)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            self._jit_cache["train_step"] = fn
        return fn

    def optimize_parameters(self, batch, step):
        if not self._actnorm_inited:
            self.initialize_actnorm(batch)
        gt_latent = self.encode_gt_latent(self._put_batch(batch["GT"]))
        step_fn = self._train_step_fn()
        self.params, self.opt_state, loss = step_fn(
            self.params, self.opt_state, gt_latent, self._put_batch(batch["LQ"])
        )
        loss = float(loss)
        self.log_dict["nll_loss"] = loss
        return loss

    # ---------------- eval ----------------

    def get_sr(self, lq, heat=None):
        """Reverse flow -> VQGAN *latent* (parity: stage-2 netG output is the
        latent; test_stage2.py decodes it explicitly)."""
        fn = self._jit_cache.get("get_sr")
        if fn is None:
            @jax.jit
            def fn(params, lq):
                x, _ = self.netG.apply(
                    {"params": params}, lq, method=LLFlowVQGAN2.reverse_flow
                )
                return x

            self._jit_cache["get_sr"] = fn
        return fn(self.params, lq)

    def decode_latent(self, latent):
        fn = self._jit_cache.get("decode")
        if fn is None:
            @jax.jit
            def fn(vq_variables, latent):
                dec, _, _ = self.net_hq.apply(vq_variables, latent, method=VQModel.decode)
                return dec

            self._jit_cache["decode"] = fn
        return fn(self.vq_variables, latent)

    def get_encode_nll(self, lq, gt):
        gt_latent = self.encode_gt_latent(gt)
        _, nll, _ = self.netG.apply(
            {"params": self.params}, gt_latent, lq, method=LLFlowVQGAN2.normal_flow
        )
        return float(jnp.mean(nll))

    # ---------------- persistence ----------------

    def save(self, iter_label):
        return self.save_network(self.params, "G", iter_label)

    def save_training(self, epoch, iter_step):
        state = {"params": self.params, "opt_state": self.opt_state}
        return self.save_training_state(epoch, iter_step, state)

    def resume_training(self, path):
        template = {"params": self.params, "opt_state": self.opt_state}
        payload = self.load_training_state(path, template)
        self.params = payload["state"]["params"]
        self.opt_state = payload["state"]["opt_state"]
        self._actnorm_inited = True
        return payload["epoch"], payload["iter"]

    def load_network(self, load_path, strict=True):
        self.params = self.load_params(self._flaxify(load_path), self.params, strict=strict)
        self._actnorm_inited = True

    def load(self):
        resume_state, resume_model = get_resume_paths(self.opt)
        if resume_model is not None and os.path.exists(self._flaxify(resume_model)):
            self.load_network(resume_model, strict=True)
            return
        load_path_G = opt_get(self.opt, ["path", "pretrain_model_G"])
        if load_path_G and os.path.exists(self._flaxify(load_path_G)):
            self.load_network(load_path_G, strict=self.opt["path"].get("strict_load", True))
