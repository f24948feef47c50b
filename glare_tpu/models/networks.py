"""Network factory (reference: code/models/networks.py:28-53).

``define_Flow`` builds the generator named by ``network_G.which_model_G``;
``find_vqgan`` builds the frozen VQGAN named by ``network_VQGAN.type``.
"""

from __future__ import annotations

from ..modules.llflow_vqgan2 import LLFlowVQGAN2
from ..modules.vqllflow_deformable import VQLLFLOWDeformable
from ..modules.vqmodel import VQModel
from ..utils.util import opt_get


def _flow_kwargs(opt):
    flow = opt_get(opt, ["network_G", "flow"], {}) or {}
    quant = opt_get(opt, ["datasets", "train", "quant"], 255) or 255
    return dict(
        K=flow.get("K") or 12,
        L=flow.get("L") or 2,
        additional_flow_no_affine=int(flow.get("additionalFlowNoAffine") or 0),
        hidden_channels=flow.get("hidden_channels") or 64,
        coupling=flow.get("coupling") or "CondAffineSeparatedAndCond",
        quant=float(quant),
    )


def define_Flow(opt, step=0, dtype=None):
    which_model = opt_get(opt, ["network_G", "which_model_G"])
    kw = _flow_kwargs(opt)
    if which_model == "LLFlowVQGAN2":
        return LLFlowVQGAN2(dtype=dtype, **kw)
    if which_model == "VQLLFLOWDeformable":
        warp_mode = opt_get(opt, ["network_G", "warp_mode"], "dcn") or "dcn"
        # training defaults to the chain op: clamped-offset DCNv2 as a dense
        # select-chain whose autodiff backward is gather/scatter-free —
        # 3.6x faster than the XLA-gather path (8.9 vs 2.5 img/s @256^2 b2,
        # PERF_NOTES.md). Inference defaults to the exact unbounded op for
        # strict parity; set network_G.dcn_impl to override either.
        dcn_impl = opt_get(opt, ["network_G", "dcn_impl"], None) or (
            "chain" if opt.get("is_train") else "xla")
        # remat the AFT decoder blocks when training with the gather-based
        # DCN (stage-3 @256^2 b2 otherwise exceeds one v5e's HBM). The
        # chain op's backward is gather/scatter-free and fits without
        # remat, where dropping it is a further 14% (10.18 vs 8.90 img/s,
        # 98% f32 MFU, PERF_NOTES.md round-3 sweep); no-op for inference.
        remat = opt_get(opt, ["network_G", "remat"],
                        bool(opt.get("is_train")) and dcn_impl != "chain")
        # clamp radius for the clamped impls (pallas/chain); 2 matches the
        # learned-offset regime, 4 widens the safety margin (PERF_NOTES.md)
        dcn_r = int(opt_get(opt, ["network_G", "dcn_max_offset"], 2) or 2)
        # 'hybrid': exact-tail capacity (row-block fraction for the cascade,
        # pixel fraction for 'hybrid_gather') and the cascade's tail radius
        # (exact for |offset| <= R_tail; see ops/dcn_pallas.py cascade)
        dcn_cap = float(
            opt_get(opt, ["network_G", "dcn_hybrid_capacity"], 0.125) or 0.125)
        dcn_tail = int(
            opt_get(opt, ["network_G", "dcn_hybrid_tail_offset"], 8) or 8)
        return VQLLFLOWDeformable(dtype=dtype, warp_mode=warp_mode,
                                  dcn_impl=dcn_impl, dcn_max_offset=dcn_r,
                                  dcn_hybrid_capacity=dcn_cap,
                                  dcn_hybrid_tail_offset=dcn_tail,
                                  remat=bool(remat), **kw)
    raise NotImplementedError(f"Generator model [{which_model}] not recognized")


def find_vqgan(opt, dtype=None, vq_backend="auto"):
    cfg = opt.get("network_VQGAN") or {}
    t = cfg.get("type") or "VQModel"
    if t != "VQModel":
        raise NotImplementedError(f"VQGAN type [{t}] not recognized")
    return VQModel(
        resolution=cfg.get("resolution") or 256,
        n_embed=cfg.get("n_embed") or 8192,
        embed_dim=cfg.get("embed_dim") or 3,
        z_channels=cfg.get("z_channels") or 3,
        in_channels=cfg.get("in_channels") or 3,
        out_ch=cfg.get("out_ch") or 3,
        ch=cfg.get("ch") or 128,
        ch_mult=tuple(cfg.get("ch_mult") or (1, 2, 4)),
        num_res_blocks=cfg.get("num_res_blocks") or 2,
        attn_resolutions=tuple(cfg.get("attn_resolutions") or (64,)),
        dtype=dtype,
        vq_backend=vq_backend,
    )
