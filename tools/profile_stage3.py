"""Op-level device profile of stage-3 inference on the real chip.

Captures a ``jax.profiler`` trace around the 3-phase stage-3 pipeline
(latent_half | vq_decode | aft_half) and aggregates the TPU device plane's
complete events into per-op self-time — replacing the round-2
estimated-bandwidth attribution with a measured trace (round-2 verdict
weak #1). The raw trace (xplane + trace.json.gz) stays on disk for
TensorBoard/Perfetto.

Usage: python -m tools.profile_stage3 [--batch 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import numpy as np

from tools.flops_audit import build_stage3


def _phase_fns(netG, vq, params, vq_vars):
    from glare_tpu.modules.vqllflow_deformable import VQLLFLOWDeformable
    from glare_tpu.modules.vqmodel import VQModel

    latent = jax.jit(lambda p, x: netG.apply(
        {"params": p}, x, method=VQLLFLOWDeformable.latent_half))
    decode = jax.jit(lambda v, x: vq.apply(v, x, method=VQModel.decode))
    aft = jax.jit(lambda p, x, c, m: netG.apply(
        {"params": p}, x, c, m, method=VQLLFLOWDeformable.aft_half))

    def forward(lq):
        x, lr_enc = latent(params, lq)
        _, _, code_out = decode(vq_vars, x)
        return aft(params, x, code_out, lr_enc["mid_feat"])

    return forward


def aggregate_trace(log_dir, n_img):
    """Leaf-level (while-bodies attributed, module/while parents excluded)
    per-HLO-category device time with XLA's own model_flops and
    bytes_accessed — yielding measured TFLOP/s and GB/s per class."""
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {log_dir}"
    data = json.load(gzip.open(paths[-1]))
    # only the per-op device track: the device pid also carries "Steps"
    # (step-number spans covering whole iterations) and "XLA Modules"
    # (whole-executable spans) threads whose events carry
    # device_duration_ps too — counting those doubles whole steps into a
    # giant '?' category (seen on the stage-1 GAN profile, round 5)
    op_tids = {(e["pid"], e["tid"]) for e in data["traceEvents"]
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and (e.get("args") or {}).get("name") == "XLA Ops"}
    evs = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and "device_duration_ps" in (e.get("args") or {})
           and (e["pid"], e.get("tid")) in op_tids]
    whiles = sorted((e["ts"], e["ts"] + e["dur"])
                    for e in evs if e["name"].startswith("while"))

    def in_while(e):
        ts = e["ts"]
        for a, b in whiles:
            if a <= ts < b:
                return True
            if a > ts:
                return False
        return False

    agg = defaultdict(lambda: [0.0, 0.0, 0.0])
    for e in evs:
        n = e["name"]
        if n.startswith("while") or n.startswith("jit_"):
            continue  # parents: their bodies are separate leaf events
        a = e["args"]
        key = ("attention-loop" if in_while(e) else "main",
               a.get("hlo_category", "?"))
        agg[key][0] += float(a["device_duration_ps"]) / 1e9
        agg[key][1] += float(a.get("model_flops") or 0)
        agg[key][2] += float(a.get("bytes_accessed") or 0)
    # per-op self time (op names collapse fused-instruction suffixes) for
    # attributing inside coarse categories like "data formatting".
    # Keyed by (base, category): events sharing a base name can carry
    # different hlo_category values, and merging them under the last-seen
    # label made top_ops disagree with the breakdown (ADVICE r03).
    ops = defaultdict(float)
    for e in evs:
        n = e["name"]
        if n.startswith("while") or n.startswith("jit_"):
            continue
        a = e["args"]
        base = n.split(".")[0]
        ops[(base, a.get("hlo_category", "?"))] += (
            float(a["device_duration_ps"]) / 1e9)
    top_ops = [{"op": k[0], "category": k[1],
                "ms_per_img": round(v / n_img, 2)}
               for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:25]]
    rows = []
    for (w, c), (t, f, b) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        rows.append({"where": w, "category": c,
                     "ms_per_img": round(t / n_img, 2),
                     "tflops_rate": round(f / t * 1e-9, 1),
                     "gbps": round(b / t * 1e-6)})
    total_t = sum(v[0] for v in agg.values())
    total_f = sum(v[1] for v in agg.values())
    return rows, total_t, total_f, top_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dcn_impl", default="pallas",
                    choices=["pallas", "xla", "chain", "hybrid"])
    ap.add_argument("--log_dir", default="/tmp/glare_stage3_trace")
    ap.add_argument("--out", default="PROFILE_r04.json")
    args = ap.parse_args()

    netG, vq, params, vq_vars, lq = build_stage3(
        args.height, args.width, args.dtype, args.dcn_impl)
    if args.batch > 1:
        lq = np.broadcast_to(np.asarray(lq), (args.batch, *lq.shape[1:]))
        lq = jax.numpy.asarray(lq)
    forward = _phase_fns(netG, vq, params, vq_vars)

    for _ in range(2):
        out = forward(lq)
    np.asarray(out).ravel()[0]

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.log_dir)
    for _ in range(args.iters):
        out = forward(lq)
    np.asarray(out).ravel()[0]
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    n_img = args.batch * args.iters
    print(f"traced {args.iters} iters batch {args.batch}: "
          f"{n_img / dt:.2f} img/s (incl. trace overhead)")

    rows, total_t, total_f, top_ops = aggregate_trace(args.log_dir, n_img)
    tflop_img = total_f / 1e12 / n_img
    print(f"\nleaf device time {total_t / n_img:.1f} ms/img, "
          f"XLA model_flops {tflop_img:.2f} TFLOP/img "
          f"(ceiling {197 / tflop_img:.1f} img/s at 100% MFU)")
    print(f"{'where':15s} {'category':24s} {'ms/img':>7s} {'TFLOP/s':>8s} {'GB/s':>7s}")
    for r in rows:
        if r["ms_per_img"] < 0.03:
            continue
        print(f"{r['where']:15s} {r['category'][:24]:24s} "
              f"{r['ms_per_img']:7.2f} {r['tflops_rate']:8.1f} {r['gbps']:7d}")
    print("\ntop ops by self time:")
    for o in top_ops:
        if o["ms_per_img"] >= 0.1:
            print(f"  {o['ms_per_img']:7.2f}  {o['category'][:18]:18s} {o['op'][:70]}")
    import json as _json

    out_path = args.out
    with open(out_path, "w") as f:
        _json.dump({"config": f"stage3 inference {args.width}x{args.height} "
                              f"{args.dtype} B={args.batch} {args.dcn_impl}-DCN, "
                              f"{args.iters} traced iters",
                    "leaf_ms_per_img": round(total_t / n_img, 1),
                    "model_tflop_per_img": round(tflop_img, 2),
                    "implied_ceiling_img_s_100mfu": round(197 / tflop_img, 1),
                    "breakdown": rows, "top_ops": top_ops},
                   f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
