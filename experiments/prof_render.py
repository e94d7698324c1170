"""Profile the forward bunny render on TPU and aggregate device-op time.

Captures a jax.profiler trace of the production forward render (bunny
product scene, 1024^2, spp from --spp), then parses the perfetto
trace.json.gz and prints the top device ops by total duration, with HLO
metadata where available.  This is the tool that decides what to optimize
next (DESIGN.md perf log).

Usage: python experiments/prof_render.py [--spp 4] [--size 1024]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--mb", type=int, default=50)
    ap.add_argument("--rr", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/tpupt_prof")
    ap.add_argument("--scene", default="bunny",
                    choices=("bunny", "multimesh", "ajax", "ajax_hi"))
    args = ap.parse_args()

    import jax
    from functools import partial

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    from tpupt.bench import harness
    from tpupt.render.integrator import render_image

    scene, camera = getattr(harness, f"_scene_{args.scene}")()
    w = h = args.size
    if args.scene in ("ajax", "ajax_hi"):
        w, h = 720, 1280  # the scene's native portrait framing
    fn = jax.jit(partial(
        render_image, width=w, height=h, spp=args.spp,
        max_bounces=args.mb, rr_start=args.rr,
    ))
    buf, rays = fn(scene, camera)
    jax.block_until_ready(buf.color)
    t0 = time.perf_counter()
    buf, rays = fn(scene, camera)
    jax.block_until_ready(buf.color)
    wall = time.perf_counter() - t0
    print(f"render: {wall*1e3:.1f} ms, {int(rays)/wall/1e6:.2f} Mrays/s", file=sys.stderr)

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        buf, rays = fn(scene, camera)
        jax.block_until_ready(buf.color)

    traces = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {args.logdir}"
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)

    events = data["traceEvents"]
    # find TPU device pids (process_name metadata)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    print(f"processes: {pid_names}", file=sys.stderr)

    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        a = e.get("args", {})
        if name.startswith(("while", "jit_", "conditional")):
            continue  # containers double-count their bodies
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
        if name not in meta:
            src = a.get("source", "")
            long = a.get("long_name", "")
            shape = long.split(" = ", 1)[-1].split(" fusion", 1)[0][:48]
            meta[name] = (src.replace("/root/repo/experiments/../", ""), shape)

    print(f"\ntotal leaf device op time: {total:.1f} ms (wall {wall*1e3:.1f} ms)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        src, shape = meta.get(name, ("", ""))
        print(f"{dur:9.2f} ms  x{cnt[name]:<5d} {name[:28]:28s} {shape:48s} {src}")


if __name__ == "__main__":
    main()
