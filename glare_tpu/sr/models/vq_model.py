"""Stage-1 codebook trainer: GAN-trained weighted-VQ autoencoder
(reference: basicsr/models/dehaze_vq_model.py, registered VQDehazeModel).

HQ stage: train codebook autoencoder on normal-light images with
codebook + pixel + perceptual + GAN losses. LQ stage: freeze decoder /
codebook (frozen_module_keywords) and supervise with GT indices from the
frozen HQ model.

JAX redesign: two jitted steps per iteration — g_step (generator losses,
grads masked for frozen modules) and d_step (UNet-SN discriminator real/
fake) — plus EMA and best-metric tracking from BaseSRModel.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.util import opt_get
from ..archs import build_network
from ..losses import build_loss
from ..registry import MODEL_REGISTRY
from .base_model import BaseSRModel


def _label_frozen(params, keywords):
    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: walk(v, frozen or any(kw in k for kw in keywords)) for k, v in tree.items()
            }
        return "frozen" if frozen else "train"

    return walk(params, False)


@MODEL_REGISTRY.register()
class VQDehazeModel(BaseSRModel):
    def __init__(self, opt):
        super().__init__(opt)
        self.opt = opt
        seed = int(opt.get("manual_seed") or 0)
        self.rng = jax.random.PRNGKey(seed)

        self.net_g = build_network(opt["network_g"])
        self.LQ_stage = bool(opt["network_g"].get("LQ_stage", False))

        gt_size = opt_get(opt, ["datasets", "train", "gt_size"], 256) or 256
        dummy = jnp.zeros((1, gt_size, gt_size, 3), jnp.float32)
        self.params_g = self.net_g.init(self._next_rng(), dummy)["params"]
        if opt["network_g"].get("use_semantic_loss"):
            # semantic head params aren't touched by encode_and_decode
            scale0 = int(opt["network_g"]["codebook_params"][0][0])
            emb0 = int(opt["network_g"]["codebook_params"][0][2])
            zq_dummy = jnp.zeros((1, scale0, scale0, emb0), jnp.float32)
            sem_params = self.net_g.init(
                self._next_rng(), zq_dummy, method=self.net_g.semantic_embed
            )["params"]
            self.params_g = {**self.params_g, **sem_params}

        self.net_hq = None
        self.params_hq = None
        if self.LQ_stage:
            load_path = opt["path"].get("pretrain_network_hq")
            hq_opt = dict(opt["network_g"])
            hq_opt["LQ_stage"] = False
            self.net_hq = build_network(hq_opt)
            self.params_hq = self.net_hq.init(self._next_rng(), dummy)["params"]
            if load_path and os.path.exists(load_path):
                self.params_hq = self.load_network_params(
                    load_path, self.params_hq, strict=False
                )
                self.params_g = self.load_network_params(
                    load_path, self.params_g, strict=False
                )

        load_path = opt["path"].get("pretrain_network_g")
        if load_path and os.path.exists(load_path):
            self.params_g = self.load_network_params(load_path, self.params_g, strict=False)

        # EMA is stored FLAT (one fused axpy/iter instead of one kernel per
        # tensor — see BaseSRModel.model_ema_flat); unraveled only at save
        from jax.flatten_util import ravel_pytree

        ema_flat, self._ema_unravel = ravel_pytree(self.params_g)
        self.params_g_ema = ema_flat
        self.params_g_best = self.params_g
        self._jit = {}

        if self.is_train:
            self._init_training()

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ---------------- training setup ----------------

    def _init_training(self):
        train_opt = self.opt["train"]
        self.net_d = build_network(self.opt["network_d"])
        disc_in = int(self.opt["network_d"].get("num_in_ch", 3))
        gt_size = opt_get(self.opt, ["datasets", "train", "gt_size"], 256) or 256
        # the discriminator judges the quantized latent (dehaze_vq_model.py:183)
        scale = int(self.opt["network_g"]["codebook_params"][0][0])
        dummy_d = jnp.zeros((1, scale, scale, disc_in), jnp.float32)
        d_vars = self.net_d.init(self._next_rng(), dummy_d)
        self.params_d = d_vars["params"]
        self.spectral_d = d_vars.get("spectral", {})

        self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
        self.cri_perceptual = (
            build_loss(train_opt["perceptual_opt"]) if train_opt.get("perceptual_opt") else None
        )
        self.cri_gan = build_loss(train_opt["gan_opt"]) if train_opt.get("gan_opt") else None
        self.semantic_w = 0.0
        self._vgg = None
        if train_opt.get("semantic_opt") and self.opt["network_g"].get("use_semantic_loss"):
            from ...modules.losses import VGG16Features, load_vgg16_params

            self.semantic_w = float(train_opt["semantic_opt"].get("loss_weight", 0.1))
            self._vgg = (VGG16Features(), load_vgg16_params())
        self.use_dis = bool(train_opt.get("gan_opt") and train_opt["gan_opt"].get("loss_weight", 0) != 0)
        self.net_d_iters = train_opt.get("net_d_iters", 1)
        self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
        self.codebook_w = opt_get(train_opt, ["codebook_opt", "loss_weight"], 1.0) or 1.0
        self.ema_decay = float(train_opt.get("ema_decay") or 0.999)

        def make_optimizer(o):
            o = dict(o)
            t = o.pop("type", "Adam")
            lr = float(o.pop("lr", 1e-4))
            betas = o.pop("betas", (0.9, 0.99))
            if t.lower() in ("adam", "adamw"):
                wd = float(o.pop("weight_decay", 0) or 0)
                tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd) if wd else optax.adam(lr, b1=betas[0], b2=betas[1])
                return tx
            raise NotImplementedError(t)

        g_tx = make_optimizer(train_opt["optim_g"])
        frozen_kws = self.opt["network_g"].get("frozen_module_keywords") or []
        if self.LQ_stage and frozen_kws:
            labels = _label_frozen(self.params_g, frozen_kws)
            g_tx = optax.multi_transform({"train": g_tx, "frozen": optax.set_to_zero()}, labels)
        self.tx_g = g_tx
        self.opt_state_g = self.tx_g.init(self.params_g)
        self.tx_d = make_optimizer(train_opt["optim_d"])
        self.opt_state_d = self.tx_d.init(self.params_d)

    # ---------------- jitted steps ----------------

    def _g_step(self):
        fn = self._jit.get("g")
        if fn is None:
            net_g, net_hq, net_d = self.net_g, self.net_hq, getattr(self, "net_d", None)
            cri_pix, cri_perceptual, cri_gan = self.cri_pix, self.cri_perceptual, self.cri_gan
            codebook_w = self.codebook_w
            use_gan = self.use_dis
            LQ_stage = self.LQ_stage
            tx = self.tx_g
            semantic_w = self.semantic_w
            vgg = self._vgg

            def loss_fn(params_g, params_hq, params_d, spectral_d, lq, gt, use_gan_now):
                gt_indices = None
                if LQ_stage:
                    _, _, _, _, _, gt_idx_list = net_hq.apply(
                        {"params": params_hq}, gt, method=net_hq.encode_and_decode
                    )
                    gt_indices = [jax.lax.stop_gradient(i) for i in gt_idx_list]
                    out, out_res, l_codebook, feat_q, z_q, _ = net_g.apply(
                        {"params": params_g}, lq, gt_indices=gt_indices,
                        method=net_g.encode_and_decode,
                    )
                else:
                    out, out_res, l_codebook, feat_q, z_q, _ = net_g.apply(
                        {"params": params_g}, gt, method=net_g.encode_and_decode
                    )
                rec = out_res if out_res is not None else out
                losses = {}
                total = codebook_w * l_codebook
                losses["l_codebook"] = total
                if cri_pix is not None:
                    l_pix = cri_pix(rec, gt)
                    total = total + l_pix
                    losses["l_pix"] = l_pix
                if cri_perceptual is not None:
                    l_percep, l_style = cri_perceptual(rec, gt)
                    if l_percep is not None:
                        total = total + l_percep
                        losses["l_percep"] = l_percep
                    if l_style is not None:
                        total = total + l_style
                        losses["l_style"] = l_style
                if semantic_w > 0:
                    # semantic cluster loss (reference: dehaze_vq_model.py
                    # semantic_opt + dehaze_vq_weight_arch.py:402-418)
                    vgg_mod, vgg_params = vgg
                    src = lq if LQ_stage else gt
                    feat = jax.lax.stop_gradient(vgg_mod.apply(vgg_params, src)[-1])
                    sem = net_g.apply(
                        {"params": params_g}, z_q, method=net_g.semantic_embed
                    )
                    if feat.shape[1:3] != sem.shape[1:3]:
                        feat = jax.image.resize(
                            feat, (feat.shape[0],) + sem.shape[1:3] + (feat.shape[-1],),
                            method="bilinear",
                        )
                    l_sem = jnp.mean((sem.astype(jnp.float32) - feat.astype(jnp.float32)) ** 2)
                    l_sem = l_sem * semantic_w
                    total = total + l_sem
                    losses["l_semantic"] = l_sem
                if use_gan:
                    fake_pred = net_d.apply(
                        {"params": params_d, "spectral": spectral_d}, z_q,
                        update_stats=False,
                    )
                    l_g_gan = cri_gan(fake_pred, True, is_disc=False) * use_gan_now
                    total = total + l_g_gan
                    losses["l_g_gan"] = l_g_gan
                return total, (losses, z_q)

            @jax.jit
            def fn(params_g, opt_state_g, params_hq, params_d, spectral_d, lq, gt, use_gan_now):
                (total, (losses, z_q)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params_g, params_hq, params_d, spectral_d, lq, gt, use_gan_now
                )
                updates, opt_state_g = tx.update(grads, opt_state_g, params_g)
                params_g = optax.apply_updates(params_g, updates)
                losses["l_g_total"] = total
                return params_g, opt_state_g, losses, z_q

            self._jit["g"] = fn
        return self._jit["g"]

    def _d_step(self):
        fn = self._jit.get("d")
        if fn is None:
            net_d, cri_gan, tx = self.net_d, self.cri_gan, self.tx_d

            def d_loss(params_d, spectral_d, real, fake):
                real_pred, vars_r = net_d.apply(
                    {"params": params_d, "spectral": spectral_d}, real,
                    update_stats=True, mutable=["spectral"],
                )
                l_d_real = cri_gan(real_pred, True, is_disc=True)
                fake_pred = net_d.apply(
                    {"params": params_d, "spectral": vars_r["spectral"]}, fake,
                    update_stats=False,
                )
                l_d_fake = cri_gan(fake_pred, False, is_disc=True)
                aux = {
                    "l_d_real": l_d_real,
                    "l_d_fake": l_d_fake,
                    "out_d_real": jnp.mean(real_pred),
                    "out_d_fake": jnp.mean(fake_pred),
                    "spectral": vars_r["spectral"],
                }
                return l_d_real + l_d_fake, aux

            @jax.jit
            def fn(params_d, spectral_d, opt_state_d, real, fake):
                (_, aux), grads = jax.value_and_grad(d_loss, has_aux=True)(
                    params_d, spectral_d, real, fake
                )
                updates, opt_state_d = tx.update(grads, opt_state_d, params_d)
                params_d = optax.apply_updates(params_d, updates)
                spectral = aux.pop("spectral")
                return params_d, spectral, opt_state_d, aux

            self._jit["d"] = fn
        return self._jit["d"]

    def optimize_parameters(self, current_iter, batch):
        lq = jnp.asarray(batch["lq"])
        gt = jnp.asarray(batch["gt"])
        use_gan_now = jnp.float32(
            1.0 if (self.use_dis and current_iter > self.net_d_init_iters) else 0.0
        )
        g = self._g_step()
        self.params_g, self.opt_state_g, losses, z_q = g(
            self.params_g, self.opt_state_g, self.params_hq, getattr(self, "params_d", None),
            getattr(self, "spectral_d", None), lq, gt, use_gan_now,
        )
        loss_dict = dict(losses)

        if self.use_dis and current_iter > self.net_d_init_iters and not self.opt["train"].get("fixed_disc", False):
            # real = quantized latent of GT through the (HQ or current) model
            # (jit-cached: an eager flax apply dispatches op-by-op on this
            # backend and dominated the d step)
            zgt = self._jit.get("zgt")
            if zgt is None:
                net = self.net_hq if self.LQ_stage else self.net_g
                zgt = jax.jit(lambda p, x: net.apply(
                    {"params": p}, x, method=net.encode_and_decode)[4])
                self._jit["zgt"] = zgt
            z_gt = zgt(self.params_hq if self.LQ_stage else self.params_g, gt)
            d = self._d_step()
            self.params_d, self.spectral_d, self.opt_state_d, d_losses = d(
                self.params_d, self.spectral_d, self.opt_state_d,
                jax.lax.stop_gradient(z_gt), jax.lax.stop_gradient(z_q),
            )
            loss_dict.update(d_losses)

        if self.ema_decay > 0:
            self.params_g_ema = self.model_ema_flat(
                self.params_g, self.params_g_ema, self.ema_decay)

        self.log_dict = self.reduce_loss_dict(loss_dict)
        return self.log_dict

    # ---------------- eval ----------------

    def test(self, lq):
        """Flip-reflect pad to x32, forward, crop (reference:
        dehaze_vq_weight_arch.py:563-583)."""
        fn = self._jit.get("test")
        if fn is None:
            net_g = self.net_g

            @jax.jit
            def fn(params, lq):
                out, out_res, _, _, _, idx = net_g.apply(
                    {"params": params}, lq, method=net_g.encode_and_decode
                )
                return out, out_res

            self._jit["test"] = fn
        b, h_old, w_old, c = lq.shape
        wsz = 32
        h_pad = (h_old // wsz + 1) * wsz - h_old
        w_pad = (w_old // wsz + 1) * wsz - w_old
        lq = jnp.concatenate([lq, jnp.flip(lq, 1)], 1)[:, : h_old + h_pad]
        lq = jnp.concatenate([lq, jnp.flip(lq, 2)], 2)[:, :, : w_old + w_pad]
        out, out_res = fn(self.params_g, lq)
        result = out_res if out_res is not None else out
        return result[:, :h_old, :w_old]

    def test_tile(self, lq, tile_size=240, tile_pad=16):
        """Real-ESRGAN halo tiling (reference: dehaze_vq_weight_arch.py:501-561)."""
        import math

        b, height, width, c = lq.shape
        output = np.zeros((b, height, width, 3), np.float32)
        tiles_x = math.ceil(width / tile_size)
        tiles_y = math.ceil(height / tile_size)
        for y in range(tiles_y):
            for x in range(tiles_x):
                isx, isy = x * tile_size, y * tile_size
                iex, iey = min(isx + tile_size, width), min(isy + tile_size, height)
                isx_p, isy_p = max(isx - tile_pad, 0), max(isy - tile_pad, 0)
                iex_p, iey_p = min(iex + tile_pad, width), min(iey + tile_pad, height)
                tile = lq[:, isy_p:iey_p, isx_p:iex_p, :]
                out_tile = np.asarray(self.test(jnp.asarray(tile)))
                osy_t, osx_t = isy - isy_p, isx - isx_p
                output[:, isy:iey, isx:iex] = out_tile[
                    :, osy_t : osy_t + (iey - isy), osx_t : osx_t + (iex - isx)
                ]
        return output

    # ---------------- persistence ----------------

    def save(self, epoch, current_iter):
        self.save_network(
            [self.params_g, self._ema_unravel(self.params_g_ema)], "g",
            current_iter, param_keys=("params", "params_ema"),
        )
        if hasattr(self, "params_d"):
            self.save_network([self.params_d], "d", current_iter)
        state = {
            "params_g": self.params_g,
            "opt_state_g": self.opt_state_g,
        }
        if hasattr(self, "params_d"):
            state["params_d"] = self.params_d
            state["opt_state_d"] = self.opt_state_d
        self.save_training_state(epoch, current_iter, state)

    def save_best(self, current_iter):
        self.params_g_best = self.params_g
        self.save_network([self.params_g], "g_best", "")
