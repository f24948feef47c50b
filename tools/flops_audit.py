"""FLOP audit for stage-3 inference at the 600x400 protocol shape.

Produces the auditable numbers VERDICT r1 asked for: per-component FLOPs
from XLA's own cost model (`jit(...).lower().compile().cost_analysis()`),
the implied img/s ceiling at 100% MFU on one v5e chip, and — given a
measured img/s — the achieved MFU. bench.py imports `stage3_flops` to
report MFU next to throughput.

Peak used for the ceiling: TPU v5e ~197 TFLOP/s bf16 (public spec,
jax-ml.github.io/scaling-book hardware table); f32 ~49 TFLOP/s.

Usage:
  python -m tools.flops_audit [--height 420] [--width 620] [--measured 4.0]
"""

from __future__ import annotations

import argparse
import json
import os

V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0


def _flops(fn, *args):
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0)), cost


def build_stage3(height=420, width=620, dtype_name="bfloat16", dcn_impl="pallas"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glare_tpu.modules.vqllflow_deformable import VQLLFLOWDeformable
    from glare_tpu.modules.vqmodel import VQModel

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    netG = VQLLFLOWDeformable(K=12, L=2, dtype=dtype, dcn_impl=dcn_impl)
    vq = VQModel(dtype=dtype)

    def init_all(rng):
        rngs = jax.random.split(rng, 3)
        init_lr = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vq_vars = vq.init(rngs[0], init_lr)
        g_params = netG.init(rngs[1], init_lr, method=VQLLFLOWDeformable.latent_half)["params"]
        x0, enc0 = netG.apply({"params": g_params}, init_lr, method=VQLLFLOWDeformable.latent_half)
        _, _, code0 = vq.apply(vq_vars, x0, method=vq.decode)
        aft_params = netG.init(rngs[2], x0, code0, enc0["mid_feat"],
                               method=VQLLFLOWDeformable.aft_half)["params"]
        return {**g_params, **aft_params}, vq_vars

    params, vq_vars = jax.jit(init_all)(jax.random.PRNGKey(0))
    lq = jnp.asarray(np.log(np.clip(
        np.random.RandomState(0).rand(1, height, width, 3).astype(np.float32), 1e-3, None)))
    return netG, vq, params, vq_vars, lq


def stage3_flops(height=420, width=620, dtype_name="bfloat16", dcn_impl="pallas",
                 per_component=False):
    """Total stage-3 forward FLOPs per image (XLA cost model).

    Note: XLA does not see inside Pallas kernels, so the DCN warp FLOPs are
    added analytically (GEMM 2*P*K*C*O + bilinear select-chain VPU work when
    dcn_impl == 'pallas').
    """
    import jax

    netG, vq, params, vq_vars, lq = build_stage3(height, width, dtype_name, dcn_impl)

    def latent(params, lq):
        return netG.apply({"params": params}, lq, method=netG.latent_half)

    def decode(vq_vars, x):
        return vq.apply(vq_vars, x, method=vq.decode)

    def aft(params, x, code, mid):
        return netG.apply({"params": params}, x, code, mid, method=netG.aft_half)

    f_lat, _ = _flops(latent, params, lq)
    x, enc = jax.jit(latent)(params, lq)
    f_dec, _ = _flops(decode, vq_vars, x)
    dec = jax.jit(decode)(vq_vars, x)
    f_aft, _ = _flops(aft, params, x, dec[2], enc["mid_feat"])

    # Pallas DCN warps, invisible to the XLA cost model: per warp at
    # [H, W, C] -> O channels, G groups: GEMM 2*H*W*K*C*O plus the
    # select-chain bilinear build 2 * H*W * K*G * cells * Cg (cells =
    # band_rows * (2R+3) with R=2 -> 63).
    dcn_analytic = 0.0
    if dcn_impl == "pallas":
        for (h_, w_, c_, o_) in [(height, width, 128, 128),
                                 (height // 2, width // 2, 256, 256)]:
            p_ = h_ * w_
            gemm = 2 * p_ * 9 * c_ * o_
            chain = 2 * p_ * 9 * 4 * 63 * (c_ // 4)
            dcn_analytic += gemm + chain
    total = f_lat + f_dec + f_aft + dcn_analytic
    parts = {
        "latent_half": f_lat,
        "vq_decode": f_dec,
        "aft_half(xla)": f_aft,
        "dcn_pallas_analytic": dcn_analytic,
    }
    return (total, parts) if per_component else total


def stage2_train_flops(batch=4, gt_size=320):
    """Stage-2 training-step FLOPs (VQGAN GT-encode + 28-step flow NLL +
    grads + adam) per image, from the XLA cost model. Fully XLA (no Pallas
    ops in stage 2), so cost_analysis covers everything."""
    import jax
    import jax.numpy as jnp
    import optax

    from glare_tpu.modules.llflow_vqgan2 import LLFlowVQGAN2
    from glare_tpu.modules.vqmodel import VQModel

    netG = LLFlowVQGAN2(K=12, L=2)
    vq = VQModel()
    b, s = batch, gt_size

    def init_all(rng):
        rngs = jax.random.split(rng, 2)
        gt = jnp.zeros((1, s, s, 3), jnp.float32)
        latent = jnp.zeros((1, s // 4, s // 4, 3), jnp.float32)
        vq_vars = vq.init(rngs[0], gt)
        params = netG.init(rngs[1], latent, gt, method=LLFlowVQGAN2.normal_flow)["params"]
        return params, vq_vars

    params, vq_vars = jax.jit(init_all)(jax.random.PRNGKey(0))
    tx = optax.adam(5e-4, b1=0.9, b2=0.99)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(params, vq_vars, lq, gt):
        h, _ = vq.apply(vq_vars, gt, method=vq.encode)
        gt_latent = jax.lax.stop_gradient(h)
        _, nll, _ = netG.apply({"params": params}, gt_latent, lq,
                               method=LLFlowVQGAN2.normal_flow)
        return jnp.mean(nll)

    def step(params, opt_state, lq, gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, vq_vars, lq, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    lq = jnp.zeros((b, s, s, 3), jnp.float32)
    gt = jnp.zeros((b, s, s, 3), jnp.float32)
    f_step, _ = _flops(step, params, opt_state, lq, gt)
    return f_step / b


def build_stage3_train(batch=2, gt_size=256, dtype_name="float32", dcn_impl="xla", remat=True,
                       max_offset=2):
    """Stage-3 AFT training-step ingredients at the shipped conf's shapes
    (train_stage3_LOL.yml: GT_size 256, batch 2): frozen latent_half + VQ
    decode, trainable AFT, loss = l1 + 0.01*VGG16-percep + 0.2*(1-msssim)
    (glare_tpu/models/vqllflowd_model.py:_train_step_fn). dcn_impl: 'xla'
    (exact, chunked-gather backward) or 'chain' (clamped dense select-chain,
    gather-free fwd+bwd — see ops/dcn.py modulated_deform_conv_chain).
    dtype_name='bfloat16' builds the nets with bf16 compute (f32 params,
    f32 loss) — the TPU analogue of the reference's AMP autocast training
    (train.mixed_precision in the conf). Returns
    (step_fn, params, opt_state, lq, gt)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from glare_tpu.models.vqllflowd_model import _label_trainable
    from glare_tpu.modules.losses import PerceptualNetwork
    from glare_tpu.modules.msssim import msssim
    from glare_tpu.modules.vqllflow_deformable import VQLLFLOWDeformable
    from glare_tpu.modules.vqmodel import VQModel

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    netG = VQLLFLOWDeformable(K=12, L=2, dcn_impl=dcn_impl, remat=remat, dtype=dtype,
                              dcn_max_offset=max_offset)
    vq = VQModel(dtype=dtype)
    b, s = batch, gt_size

    def init_all(rng):
        rngs = jax.random.split(rng, 3)
        lr = jnp.zeros((1, s, s, 3), jnp.float32)
        vq_vars = vq.init(rngs[0], lr)
        g_params = netG.init(rngs[1], lr, method=VQLLFLOWDeformable.latent_half)[
            "params"
        ]
        x0, enc0 = netG.apply(
            {"params": g_params}, lr, method=VQLLFLOWDeformable.latent_half
        )
        _, _, code0 = vq.apply(vq_vars, x0, method=vq.decode)
        aft_params = netG.init(
            rngs[2], x0, code0, enc0["mid_feat"], method=VQLLFLOWDeformable.aft_half
        )["params"]
        return {**g_params, **aft_params}, vq_vars

    params, vq_vars = jax.jit(init_all)(jax.random.PRNGKey(0))
    perceptual = PerceptualNetwork()

    adam = optax.adam(5e-5, b1=0.9, b2=0.99)
    tx = optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, _label_trainable(params)
    )
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(params, vq_vars, lq, gt):
        x, lr_enc = netG.apply({"params": params}, lq, method=netG.latent_half)
        x = jax.lax.stop_gradient(x)
        mid = [jax.lax.stop_gradient(m) for m in lr_enc["mid_feat"]]
        _, _, code = vq.apply(vq_vars, x, method=vq.decode)
        code = [jax.lax.stop_gradient(c) for c in code]
        rec = netG.apply(
            {"params": params}, x, code, mid, method=netG.aft_half
        ).astype(jnp.float32)
        sr = jnp.clip(rec, 0.0, 1.0)
        l1 = jnp.mean(jnp.abs(sr - gt))
        percep = perceptual(sr, gt) * 0.01
        ssim_l = (1.0 - msssim(sr, gt, normalize=True)) * 0.2
        return l1 + percep + ssim_l

    def step(params, opt_state, lq, gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, vq_vars, lq, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    lq = jnp.asarray(
        np.log(np.clip(rng.rand(b, s, s, 3).astype(np.float32), 1e-3, None))
    )
    gt = jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32))
    return step, params, opt_state, lq, gt


def stage2_infer_flops(height=420, width=620, batch=8, dtype_name="bfloat16"):
    """Stage-2 eval path (flow inverse -> VQ decode, test_stage2 protocol)."""
    import jax
    import jax.numpy as jnp

    from glare_tpu.modules.llflow_vqgan2 import LLFlowVQGAN2
    from glare_tpu.modules.vqmodel import VQModel

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    netG = LLFlowVQGAN2(K=12, L=2, dtype=dtype)
    vq = VQModel(dtype=dtype)

    def init_all(rng):
        rngs = jax.random.split(rng, 2)
        lr0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        return (netG.init(rngs[1], lr0, reverse=True)["params"],
                vq.init(rngs[0], lr0))

    params, vq_vars = jax.jit(init_all)(jax.random.PRNGKey(0))
    lq = jnp.zeros((batch, height, width, 3), jnp.float32)

    f_rev, _ = _flops(lambda p, x: netG.apply(
        {"params": p}, x, method=LLFlowVQGAN2.reverse_flow), params, lq)
    latent = jax.jit(lambda p, x: netG.apply(
        {"params": p}, x, method=LLFlowVQGAN2.reverse_flow))(params, lq)[0]
    f_dec, _ = _flops(lambda v, x: vq.apply(v, x, method=vq.decode),
                      vq_vars, latent)
    return (f_rev + f_dec) / batch


def stage1_train_flops(batch=4, gt_size=256):
    """One stage-1 GAN iteration (g step + z_gt forward + d step) at the
    shipped conf shapes (confs/stage1_HQ_pretrain.yml)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from glare_tpu.sr.models.vq_model import VQDehazeModel

    tmp = tempfile.mkdtemp(prefix="glare_audit_s1_")
    opt = {
        "is_train": True, "manual_seed": 0,
        "network_g": {"type": "VQWeightDehazeNet", "gt_resolution": gt_size,
                      "norm_type": "gn", "act_type": "silu",
                      "use_quantize": True,
                      "codebook_params": [[gt_size // 4, 1024, 512]],
                      "LQ_stage": False, "use_weight": False},
        "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 512},
        "datasets": {"train": {"gt_size": gt_size}},
        "path": {"models": f"{tmp}/models", "training_states": f"{tmp}/states"},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                  "optim_d": {"type": "Adam", "lr": 1e-4},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                  "perceptual_opt": {"type": "PerceptualLoss",
                                     "layer_weights": {"relu1_2": 1.0,
                                                       "relu2_2": 1.0,
                                                       "relu3_3": 1.0},
                                     "perceptual_weight": 1.0,
                                     "style_weight": 0},
                  "gan_opt": {"type": "GANLoss", "gan_type": "hinge",
                              "loss_weight": 0.1},
                  "codebook_opt": {"loss_weight": 1.0},
                  "net_d_init_iters": 0},
        "val": {"metrics": {"psnr": {"type": "psnr", "better": "higher"}}},
    }
    model = VQDehazeModel(opt)
    rng = np.random.RandomState(0)
    lq = jnp.asarray(rng.rand(batch, gt_size, gt_size, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(batch, gt_size, gt_size, 3), jnp.float32)

    def flops_of(jitted, *a):
        cost = jitted.lower(*a).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    # lower the model's own jitted step fns directly
    g = model._g_step()
    f_g = flops_of(g, model.params_g, model.opt_state_g, model.params_hq,
                   model.params_d, model.spectral_d, lq, gt, jnp.float32(1.0))
    net = model.net_g
    zgt = jax.jit(lambda p, x: net.apply(
        {"params": p}, x, method=net.encode_and_decode)[4])
    f_z = flops_of(zgt, model.params_g, gt)
    z = zgt(model.params_g, gt)
    f_d = flops_of(model._d_step(), model.params_d, model.spectral_d,
                   model.opt_state_d, z, z)
    return (f_g + f_z + f_d) / batch


def stage3_train_flops(batch=2, gt_size=256):
    """Per-image FLOPs of the stage-3 AFT training step (XLA cost model —
    the whole step is XLA, no Pallas ops on the differentiable path)."""
    step, params, opt_state, lq, gt = build_stage3_train(batch, gt_size)
    f_step, _ = _flops(step, params, opt_state, lq, gt)
    return f_step / batch


def write_audit(path, payload):
    import json

    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dcn_impl", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--measured", type=float, default=None,
                    help="measured img/s to convert into MFU")
    ap.add_argument("--train", action="store_true",
                    help="also audit the stage-2 training step @320^2 b4")
    ap.add_argument("--out", default="FLOPS_AUDIT.json",
                    help="persist results for bench.py's MFU line ('' skips)")
    args = ap.parse_args()

    total, parts = stage3_flops(args.height, args.width, args.dtype,
                                args.dcn_impl, per_component=True)
    peak = V5E_BF16_TFLOPS if args.dtype == "bfloat16" else V5E_F32_TFLOPS
    print(f"stage-3 forward @ {args.height}x{args.width} ({args.dtype}, dcn={args.dcn_impl})")
    for k, v in parts.items():
        print(f"  {k:24s} {v / 1e12:8.3f} TFLOP")
    print(f"  {'TOTAL':24s} {total / 1e12:8.3f} TFLOP/img")

    # The cost model undercounts the ten 16k-token attention blocks (their
    # matmuls sit inside the query-chunk loop); the device-trace measurement
    # (tools/profile_stage3.py -> PROFILE_r03.json, XLA model_flops) is the
    # honest stage-3 denominator. Prefer it at the protocol geometry so a
    # refresh of FLOPS_AUDIT.json never silently reinflates the MFU/ceiling
    # (the cost-model number stays in the payload for reference).
    source = "xla-cost-model"
    cost_model_total = total
    if (args.height, args.width, args.dtype) == (420, 620, "bfloat16"):
        prof_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE_r03.json")
        try:
            with open(prof_path) as f:
                measured_tflop = float(json.load(f)["model_tflop_per_img"])
            total = measured_tflop * 1e12
            source = "device-trace model_flops (PROFILE_r03.json)"
            print(f"  using measured {measured_tflop:.2f} TFLOP/img from the "
                  f"device trace (cost model: {cost_model_total / 1e12:.2f} — "
                  f"undercounts the attention loop)")
        except (OSError, KeyError, ValueError):
            pass

    ceiling = peak * 1e12 / total
    print(f"v5e {peak:.0f} TFLOP/s peak -> {ceiling:.1f} img/s at 100% MFU")
    print(f">200 img/s target needs {200 * total / 1e12 / peak * 100:.0f}% MFU "
          f"on MXU-only accounting")
    if args.measured:
        print(f"measured {args.measured} img/s -> MFU {args.measured / ceiling * 100:.1f}%")

    payload = {
        "stage3": {
            "height": args.height, "width": args.width, "dtype": args.dtype,
            "dcn_impl": args.dcn_impl,
            "tflop_per_img": round(total / 1e12, 4),
            "tflop_source": source,
            "cost_model_tflop_per_img": round(cost_model_total / 1e12, 4),
            "parts_tflop": {k: round(v / 1e12, 4) for k, v in parts.items()},
            "v5e_peak_tflops": peak,
            "ceiling_img_s_100mfu": round(ceiling, 2),
        },
    }
    if args.train:
        f_train = stage2_train_flops()
        t_ceiling = V5E_F32_TFLOPS * 1e12 / f_train
        print(f"stage-2 train step @320^2 b4 (f32): {f_train / 1e12:.3f} TFLOP/img "
              f"-> {t_ceiling:.1f} img/s at 100% MFU (f32 peak)")
        payload["stage2_train"] = {
            "gt_size": 320, "batch": 4, "dtype": "float32",
            "tflop_per_img": round(f_train / 1e12, 4),
            "v5e_peak_tflops": V5E_F32_TFLOPS,
            "ceiling_img_s_100mfu": round(t_ceiling, 2),
        }
        f3_train = stage3_train_flops()
        t3_ceiling = V5E_F32_TFLOPS * 1e12 / f3_train
        print(f"stage-3 train step @256^2 b2 (f32): {f3_train / 1e12:.3f} TFLOP/img "
              f"-> {t3_ceiling:.1f} img/s at 100% MFU (f32 peak)")
        payload["stage3_train"] = {
            "gt_size": 256, "batch": 2, "dtype": "float32",
            "tflop_per_img": round(f3_train / 1e12, 4),
            "v5e_peak_tflops": V5E_F32_TFLOPS,
            "ceiling_img_s_100mfu": round(t3_ceiling, 2),
        }
        f1_train = stage1_train_flops()
        t1_ceiling = V5E_F32_TFLOPS * 1e12 / f1_train
        print(f"stage-1 GAN iter @256^2 b4 (f32): {f1_train / 1e12:.3f} TFLOP/img "
              f"-> {t1_ceiling:.1f} img/s at 100% MFU (f32 peak)")
        payload["stage1_train"] = {
            "gt_size": 256, "batch": 4, "dtype": "float32",
            "tflop_per_img": round(f1_train / 1e12, 4),
            "v5e_peak_tflops": V5E_F32_TFLOPS,
            "ceiling_img_s_100mfu": round(t1_ceiling, 2),
        }
        f2i = stage2_infer_flops()
        ceil2i = V5E_BF16_TFLOPS * 1e12 / f2i
        print(f"stage-2 infer @620x420 (bf16): {f2i / 1e12:.3f} TFLOP/img "
              f"-> {ceil2i:.1f} img/s at 100% MFU")
        payload["stage2_infer"] = {
            "height": 420, "width": 620, "batch": 8, "dtype": "bfloat16",
            "tflop_per_img": round(f2i / 1e12, 4),
            "v5e_peak_tflops": V5E_BF16_TFLOPS,
            "ceiling_img_s_100mfu": round(ceil2i, 2),
        }
    if args.out:
        write_audit(args.out, payload)


if __name__ == "__main__":
    main()
