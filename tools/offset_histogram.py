"""Measure the learned DCN offset distribution of a stage-3 checkpoint.

The fast DCN paths (Pallas kernel, chain op) clamp offsets to [-R, R]
(default R=2). This tool quantifies whether the clamp is parity-safe for a
given checkpoint: it runs stage-3 on real (or synthetic) inputs, captures
each DCNv2Pack's raw offsets (sown in modules/deformable_decoder.py), and
reports percentiles plus the fraction of taps exceeding R in {1, 2, 4, 8}
— the committed-evidence format round-2 verdict #4 asks for.

The exact CUDA path samples at unbounded positions
(deform_conv_cuda_kernel.cu:261-330); the reference itself only warns when
mean |offset| > 50 (deform_conv.py wrapper). conv_offset is
zero-initialized, so a fresh init reports all-zero offsets (smoke mode).

Usage:
  python -m tools.offset_histogram [--ckpt path/to/NNN_G.flax]
      [--images LOLdataset/eval15/low] [--height 420 --width 620] [--n 4]

Prints one JSON line per warp plus a combined verdict line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax.numpy as jnp
import numpy as np


def collect_offsets(netG, vq, params, vq_vars, lq):
    """Returns {warp_name: offsets [B,H,W,G,K,2]} for one batch."""
    from glare_tpu.modules.vqllflow_deformable import VQLLFLOWDeformable
    from glare_tpu.modules.vqmodel import VQModel

    # raw-offset sows are gated off by default (they cost ~150 MB/batch
    # under a capturing apply); flip them on for this audit clone
    netG = netG.clone(dcn_audit_offsets=True)
    x, lr_enc = netG.apply({"params": params}, lq,
                           method=VQLLFLOWDeformable.latent_half)
    _, _, code_out = vq.apply(vq_vars, x, method=VQModel.decode)
    _, st = netG.apply(
        {"params": params}, x, code_out, lr_enc["mid_feat"],
        method=VQLLFLOWDeformable.aft_half,
        capture_intermediates=lambda mdl, name: name == "offsets",
        mutable=["intermediates"],
    )

    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            # flax sow stores intermediates as a tuple of tap values
            if "offsets" in tree and not isinstance(tree["offsets"], dict):
                out["/".join(path)] = np.asarray(tree["offsets"][0])
            for k, v in tree.items():
                if k != "offsets":
                    walk(v, path + [k])

    walk(st["intermediates"], [])
    return out


RADII = (1, 2, 4, 8)


def offset_stats(chunks):
    """chunks: list of [B,H,W,G,K,2] raw offsets (one per audited batch).
    Returns the evidence dict: tap-Linf percentiles + out-of-band fractions
    at tap, pixel, and row-block granularity. Row blocks are the cascade
    tail's capacity unit (ops/dcn_pallas.py), reported at both block sizes
    the kernel can run (rows_per_step 16 for R_tail < 6, 8 otherwise)."""
    mx = np.concatenate(
        [np.abs(c.reshape(-1, 2)).max(axis=-1) for c in chunks])
    # per-tap Linf (the clamp is per-component, Linf is the conservative
    # bound: a tap is exactly reproduced iff Linf <= R)
    q = lambda p: round(float(np.percentile(mx, p)), 4)
    pix = np.concatenate(
        [np.abs(c).max(axis=(3, 4, 5)).reshape(-1) for c in chunks])
    blk_fr = {}
    for rpb in (8, 16):
        blks = []
        for c in chunks:
            row = np.abs(c).max(axis=(2, 3, 4, 5))  # [B, H]
            B_, H_ = row.shape
            Hb = -(-H_ // rpb) * rpb
            rowp = np.pad(row, [(0, 0), (0, Hb - H_)])
            blks.append(rowp.reshape(B_, -1, rpb).max(axis=2).reshape(-1))
        blk = np.concatenate(blks)
        blk_fr[str(rpb)] = {str(r): round(float((blk > r).mean()), 6)
                            for r in RADII}
    # per-deformable-group stats: cost of an exact band kernel scales as
    # (input channels) x (2R+1)^2, so if drift is concentrated in a subset
    # of the G offset groups, per-group radius dispatch (channel-sliced
    # kernel calls summed) beats one wide radius for the whole warp.
    G = chunks[0].shape[3]
    groups = []
    for g in range(G):
        gm = np.concatenate(
            [np.abs(c[:, :, :, g]).max(axis=-1).reshape(-1) for c in chunks])
        groups.append({
            "max": round(float(gm.max()), 4),
            "p999": round(float(np.percentile(gm, 99.9)), 4),
            "frac_exceed": {str(r): round(float((gm > r).mean()), 6)
                            for r in RADII},
        })
    # per-(g,k) tap Linf maxima: the statistic behind per-tap radius
    # dispatch (modulated_deform_conv_pallas max_offset=[G][K] radii) —
    # drift is tap-specific even when it is not group-specific, and each
    # tap's select-chain cost is (2*ceil(max_gk+1)+1)^2 independently.
    per_gk = np.maximum.reduce(
        [np.abs(c).max(axis=(0, 1, 2, 5)) for c in chunks])  # [G, K]
    per_gk_mat = [[round(float(v), 4) for v in row] for row in per_gk]
    return {
        "taps": int(mx.size),
        "p50": q(50), "p90": q(90), "p99": q(99), "p999": q(99.9),
        "max": round(float(mx.max()), 4),
        "frac_exceed": {str(r): round(float((mx > r).mean()), 6)
                        for r in RADII},
        "pix_frac_exceed": {str(r): round(float((pix > r).mean()), 6)
                            for r in RADII},
        "rowblk_frac_exceed_by_rpb": blk_fr,
        "per_group": groups,
        "per_gk_max": per_gk_mat,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--images", default=None)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    from tools.flops_audit import build_stage3

    netG, vq, params, vq_vars, _ = build_stage3(
        args.height, args.width, "float32", "xla")
    if args.ckpt:
        from flax import serialization

        with open(args.ckpt, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    batches = []
    if args.images:
        import cv2

        for p in sorted(glob.glob(os.path.join(args.images, "*.png")))[: args.n]:
            img = cv2.imread(p)[:, :, ::-1].astype(np.float32) / 255.0
            img = img[: args.height, : args.width]
            ph, pw = args.height - img.shape[0], args.width - img.shape[1]
            img = np.pad(img, [(0, ph), (0, pw), (0, 0)], mode="reflect")
            batches.append(np.log(np.clip(img + 1e-3, 1e-3, None))[None])
    else:
        rng = np.random.RandomState(0)
        for _ in range(args.n):
            base = rng.rand(args.height, args.width, 3).astype(np.float32) * 0.15
            batches.append(np.log(np.clip(base + 1e-3, 1e-3, None))[None])

    per_warp = {}
    for b in batches:
        for name, offs in collect_offsets(netG, vq, params, vq_vars,
                                          jnp.asarray(b)).items():
            per_warp.setdefault(name, []).append(offs)

    all_chunks, warp_stats = [], []
    for name, chunks in sorted(per_warp.items()):
        all_chunks.extend(chunks)
        ws = offset_stats(chunks)
        warp_stats.append(ws)
        print(json.dumps({"warp": name, **ws}))
    combined = offset_stats(all_chunks)
    combined["clamp2px_parity_safe"] = combined["frac_exceed"]["2"] < 1e-3
    # capacity is one knob shared by every DCN call: the binding constraint
    # is the WORST per-warp block fraction, not the tap-weighted mean
    combined["rowblk_frac_exceed_by_rpb_worstwarp"] = {
        rpb: {str(r): max(ws["rowblk_frac_exceed_by_rpb"][rpb][str(r)]
                          for ws in warp_stats)
              for r in RADII}
        for rpb in ("8", "16")
    }
    print(json.dumps({"warp": "ALL", **combined}))


if __name__ == "__main__":
    main()
