"""Bucketize a prof_render trace into named cost groups (round-5 verdict
#2b: the non-sweep ~33% of the forward render needs a current breakdown).

Parses the perfetto trace prof_render.py leaves under --logdir and
classifies every leaf device op by its HLO output shape + opcode into:

  sweep      winner-reduce sweep steps ((f32[sz,256], s32[sz,256]) tuple
             reduces) — ALSO reports pairs swept (cnt x sz x R*L x P) and
             the implied Gpairs/s + VPU utilization at the audited
             flops/pair (flops_audit.py)
  fetch      treelet block-gather fusions (f32[sz, C*L])
  select     O(K)/O(ks) per-step treelet selection (entry-array scans,
             argmin iota reduces, entry clears — shapes [sz, kpad])
  cull       dense super cull + expansion steps (shapes [sz, ks] / [sz, R*S])
  lane1m     full-width per-lane elementwise (leading dim == n_lanes,
             incl. [9, n] / [1, n] layouts) — bounce body, shade, RNG,
             sphere pass, chained bookkeeping
  ladder     compaction machinery (argsort, row gathers/scatters)
  other      everything else

Usage: run prof_render.py first (it leaves the trace), then
  python experiments/prof_buckets.py [--logdir /tmp/tpupt_prof]
      [--lanes 1048576] [--kpad 464] [--rl 64] [--flops-per-pair 69.8]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re

VPU_ROOFLINE = 5.5e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/tpupt_prof")
    ap.add_argument("--lanes", type=int, default=1048576)
    ap.add_argument("--kpad", type=int, default=464)
    ap.add_argument("--rl", type=int, default=64, help="R*L pairs per packet-step")
    ap.add_argument("--packet", type=int, default=256)
    ap.add_argument("--flops-per-pair", type=float, default=69.8,
                    help="measured by flops_audit.py on the compiled step")
    ap.add_argument("--detail", action="store_true")
    args = ap.parse_args()

    traces = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {args.logdir} — run prof_render.py first"
    with gzip.open(sorted(traces)[-1], "rt") as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    shape_re = re.compile(r"(f32|s32|u32|pred)\[([0-9,]*)\]")

    def classify(name, long_name):
        shapes = [
            (t, tuple(int(x) for x in dims.split(",")) if dims else ())
            for t, dims in shape_re.findall(long_name.split(" = ", 1)[-1][:160])
        ]
        lead = shapes[0][1] if shapes else ()
        n = args.lanes
        # sweep winner-reduce: tuple (f32[sz,P], s32[sz,P]) select_reduce
        if (
            name.startswith("select_reduce_fusion")
            and len(shapes) >= 2
            and len(lead) == 2
            and lead[1] == args.packet
            and shapes[1][0] == "s32"
            and shapes[1][1] == lead
        ):
            return "sweep", lead[0]
        if len(lead) == 2 and lead[1] in (args.kpad, args.kpad * 13 // 1):
            return "select", None
        # argmin iota reduces over the entry array -> (f32[sz], s32[sz])
        if name.startswith("iota_reduce") and len(lead) == 1:
            return "select", None
        if name.startswith(("reduce_min", "reduce_max")) and len(lead) == 1:
            return "select", None
        if len(lead) == 2 and lead[1] in (13 * 32, 13 * 64, 13 * 16):
            return "fetch", None
        if len(lead) == 2 and lead[1] <= 64 and lead[1] != args.packet:
            return "cull", None  # super cull / expansion shapes [sz, ks|R*S]
        if lead and (lead[0] == n or lead[0] in (1, 9) and len(lead) == 2 and lead[1] == n):
            return "lane1m", None
        if lead and lead[0] == n // args.packet:
            return "ladder", None
        if name.startswith(("sort", "gather", "scatter", "copy", "dynamic")):
            return "ladder", None
        return "other", None

    agg = collections.defaultdict(float)
    detail = collections.defaultdict(float)
    sweep_pairs = 0
    sweep_ms = 0.0
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("while", "jit_", "conditional")):
            continue
        long_name = e.get("args", {}).get("long_name", "")
        dur = e.get("dur", 0) / 1e3
        bucket, sz = classify(name, long_name)
        agg[bucket] += dur
        total += dur
        detail[(bucket, name[:40], long_name.split(" = ", 1)[-1][:40])] += dur
        if bucket == "sweep":
            sweep_pairs += sz * args.rl * args.packet
            sweep_ms += dur

    print(f"total leaf device time: {total:.1f} ms")
    for b, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {b:8s} {ms:8.1f} ms  {ms/total*100:5.1f}%")
    if sweep_ms:
        gp = sweep_pairs / (sweep_ms / 1e3) / 1e9
        fl = gp * 1e9 * args.flops_per_pair
        print(
            f"sweep: {sweep_pairs/1e9:.2f} Gpairs in {sweep_ms:.1f} ms = "
            f"{gp:.1f} Gpairs/s x {args.flops_per_pair} flops/pair = "
            f"{fl/1e12:.2f} TFLOP/s = {fl/VPU_ROOFLINE*100:.1f}% of the "
            f"5.5 TFLOP/s VPU roofline"
        )
    if args.detail:
        for (b, nm, sh), ms in sorted(detail.items(), key=lambda kv: -kv[1])[:80]:
            print(f"  {ms:8.2f} ms {b:8s} {nm:40s} {sh}")


if __name__ == "__main__":
    main()
