"""Op-level device profile of stage-3 inference on the real chip.

Captures a ``jax.profiler`` trace around the 3-phase stage-3 pipeline
(latent_half | vq_decode | aft_half) and aggregates the TPU device plane's
complete events into per-op self-time — replacing the round-2
estimated-bandwidth attribution with a measured trace (round-2 verdict
weak #1). The raw trace (xplane + trace.json.gz) stays on disk for
TensorBoard/Perfetto.

Usage: python -m tools.profile_stage3 [--batch 8] [--iters 3] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
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


def aggregate_trace(log_dir, top=40, pattern="TPU"):
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {log_dir}"
    data = json.load(gzip.open(paths[-1]))
    events = data["traceEvents"]
    # pid -> process name
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items() if pattern in n}
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    t_min, t_max = float("inf"), 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        # strip uniquing suffixes: fusion.1234 -> fusion
        base = re.sub(r"[.\d]+$", "", name) or name
        agg[base] += dur
        count[base] += 1
        total += dur
        t_min = min(t_min, ev.get("ts", t_min))
        t_max = max(t_max, ev.get("ts", 0) + ev.get("dur", 0))
    wall = (t_max - t_min) / 1e3 if t_max > t_min else 0.0
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return rows, count, total, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--width", type=int, default=620)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dcn_impl", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--log_dir", default="/tmp/glare_stage3_trace")
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

    rows, cnt, total, wall = aggregate_trace(args.log_dir, args.top)
    print(f"\nTPU device plane: {total:.1f} ms busy over {wall:.1f} ms wall "
          f"({100 * total / max(wall, 1e-9):.0f}% occupancy), "
          f"{total / n_img:.2f} ms busy/img")
    print(f"{'op (base name)':44s} {'ms':>9s} {'ms/img':>8s} {'%':>5s} {'n':>5s}")
    for name, ms in rows:
        print(f"{name[:44]:44s} {ms:9.2f} {ms / n_img:8.2f} "
              f"{100 * ms / total:5.1f} {cnt[name]:5d}")


if __name__ == "__main__":
    main()
