"""Chaos-floor control for the 600x400 protocol-geometry parity test.

Runs the REFERENCE torch chain (VQ decode + AFT decode, golden-DCN
semantics) twice on the same 620x420 protocol input: once on its own flow
latent, once with 2e-6 relative Gaussian noise on that latent (the
measured cross-framework latent delta at this geometry), and reports the
protocol PSNR of torch against itself plus the warp-block offset
magnitudes that drive the amplification.

Result recorded in PARITY.md ("Protocol-geometry parity"): with the
test's original fully-random conv_offset weights the torch chain scores
~30 dB against ITSELF, i.e. the untempered 45 dB bar is unreachable for
any bit-inexact reimplementation — which is why
tests/test_torch_parity.py::TestProtocolGeometryParity tempers the two
offset heads to the <=6.4 px regime real checkpoints live in
(OFFSET_HIST_r05.json) before asserting the bar.

Usage (CPU, ~10 min):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m tools.parity_chaos_control [--temper]

--temper applies the same offset-head scaling as the shipped test, to
show the control flips to a high self-consistency PSNR in that regime.

Reference chain: /root/reference/code/infer_dataset_lol.py:113-144,
models/modules/VQLLFLOWDeformable_arch.py:222-250.
"""

from __future__ import annotations

import argparse
import sys
import types

import numpy as np

REPO = "/root/repo"
REF = "/root/reference/code"


def _install_ref_stubs():
    import torch

    if "natsort" not in sys.modules:
        stub = types.ModuleType("natsort")
        stub.natsort = types.SimpleNamespace(natsorted=sorted)
        stub.natsorted = sorted
        sys.modules["natsort"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: None
        tv_utils.save_image = lambda *a, **k: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")
        pl_stub.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl_stub
    sys.path.insert(0, REF)
    vgg_stub = types.ModuleType("models.modules.vgg_arch")
    vgg_stub.VGGFeatureExtractor = lambda *a, **k: torch.nn.Identity()
    sys.modules["models.modules.vgg_arch"] = vgg_stub


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--temper", action="store_true",
                    help="apply the shipped test's offset-head tempering")
    ap.add_argument("--noise", type=float, default=2e-6,
                    help="relative latent perturbation")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    sys.path.insert(0, f"{REPO}/tests")
    import torch

    _install_ref_stubs()
    import models.modules.deformableDecoder_arch as dd_arch
    from models.modules import flow as ref_flow
    from models.modules.VQLLFLOWDeformable_arch import (
        VQLLFLOWDeformable as TorchNet,
    )
    from models.modules.VQModel_arch import VQModel as TorchVQ

    from glare_tpu.options import dict_to_nonedict
    from glare_tpu.utils.imgproc import impad
    from glare_tpu.utils.metrics import PSNR, gray_mean_adjust
    from golden_dcn import modulated_deform_conv_golden_fast

    def golden_mdcn(x, offset, mask, weight, bias, stride, padding,
                    dilation, groups, deformable_groups):
        out = modulated_deform_conv_golden_fast(
            x.detach().numpy(), offset.detach().numpy(),
            mask.detach().numpy(), weight.detach().numpy(),
            bias.detach().numpy() if bias is not None else None,
            stride=stride, padding=padding, dilation=dilation,
            deformable_groups=deformable_groups,
        )
        return torch.from_numpy(out.astype(np.float32))

    dd_arch.modulated_deform_conv = golden_mdcn
    orig_to = torch.Tensor.to

    def cpu_to(self, *a, **kw):
        a = tuple("cpu" if isinstance(x, (str, torch.device))
                  and str(x).startswith("cuda") else x for x in a)
        return orig_to(self, *a, **kw)

    torch.Tensor.to = cpu_to

    # identical model construction + randomization to the shipped test
    opt = dict_to_nonedict({
        "scale": 1, "le_curve": False, "sigmoid_output": False,
        "to_yuv": False, "cond_encoder": "ConEncoder1",
        "datasets": {"train": {"GT_size": 160, "quant": 32}},
        "network_G": {"flow": {
            "K": 12, "L": 2, "coupling": "CondAffineSeparatedAndCond",
            "additionalFlowNoAffine": 2, "conditionInFeaDim": 64,
            "split": {"enable": False}}},
    })
    tm = TorchNet(opt=opt, K=12)
    g0 = torch.Generator().manual_seed(30)
    sd = tm.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g0) * 0.05
    tm.load_state_dict(sd)
    tm.eval()
    tvq = TorchVQ()
    g1 = torch.Generator().manual_seed(31)
    sd = tvq.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g1) * 0.2
    tvq.load_state_dict(sd)
    tvq.eval()
    g = torch.Generator().manual_seed(32)
    with torch.no_grad():
        for mod in list(tm.modules()) + list(tvq.modules()):
            if isinstance(mod, torch.nn.GroupNorm):
                mod.weight.copy_(1.0 + 0.1 * torch.randn(mod.weight.shape,
                                                         generator=g))
                mod.bias.copy_(0.05 * torch.randn(mod.bias.shape, generator=g))
            elif hasattr(mod, "invconv"):
                w = torch.linalg.qr(torch.randn(3, 3, generator=g))[0]
                mod.invconv.weight.copy_(w)
            elif isinstance(mod, ref_flow.Conv2dZeros):
                mod.weight.mul_(0.02)
                mod.bias.mul_(0.02)
                mod.logs.mul_(0.02)
        if args.temper:
            for w_idx, s in ((0, 2.5e-4), (1, 2.0e-5)):
                co = tm.deformable_decoder.warp[w_idx].dcn.conv_offset
                co.weight.mul_(s)
                co.bias.mul_(s)

    # protocol input
    rng = np.random.RandomState(7)
    lr_u8 = (rng.rand(400, 600, 3) * 60).astype(np.uint8)
    gt = rng.rand(400, 600, 3).astype(np.float64)
    lr = impad(lr_u8, bottom=20, left=20).astype(np.float32) / 255.0
    lq = np.log(np.clip(lr + 1e-3, 1e-3, None))[None]
    tlq = torch.from_numpy(lq.transpose(0, 3, 1, 2))

    off_stats = {}

    def mk_hook(name):
        def hook(mod, inp, out):
            o = out.detach()
            offs = o[:, : 2 * (o.shape[1] // 3)]
            off_stats[name] = (float(offs.abs().max()),
                               float(offs.abs().mean()))
        return hook

    for w in (0, 1):
        tm.deformable_decoder.warp[w].dcn.conv_offset.register_forward_hook(
            mk_hook(f"warp_{w}"))

    with torch.no_grad():
        lr_enc = tm.RRDB(tlq, mid_feat=True)
        z = lr_enc["color_map"]
        logdet = torch.zeros_like(tlq[:, 0, 0, 0])
        lat, _ = tm.flowUpsamplerNet(rrdbResults=lr_enc, z=z, eps_std=0.0,
                                     reverse=True, logdet=logdet)

    def run_chain(latent):
        with torch.no_grad():
            _, _, code_out = tvq.decode(latent)
            out = tm.deformable_decoder(latent, code_out,
                                        lr_enc["mid_feat"])
        return out.numpy().transpose(0, 2, 3, 1)[0]

    lat_np = lat.numpy()
    prng = np.random.RandomState(0)
    pert = lat_np * (1 + args.noise
                     * prng.randn(*lat_np.shape).astype(np.float32))

    a = run_chain(torch.from_numpy(lat_np))
    print(f"warp offset |.| (max, mean) px: {off_stats}")
    b = run_chain(torch.from_numpy(pert))

    def post(sr):
        sr = sr[:400, 20:, :]
        return gray_mean_adjust(np.clip(sr, 0, 1).astype(np.float64), gt)

    psnr = PSNR(post(a), post(b))
    print(f"torch-vs-torch ({args.noise:.0e} latent noise, "
          f"temper={args.temper}) protocol PSNR: {psnr:.2f} dB")


if __name__ == "__main__":
    main()
