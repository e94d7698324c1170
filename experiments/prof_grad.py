"""Profile the fwd+bwd (differentiable) bunny step on TPU.

Same trace aggregation as prof_render.py but over the BASELINE metric
config: jax.grad of an L2 loss over render_image(differentiable=True)
w.r.t. all scene parameters, 1024^2, spp=4, 8 bounces.

Usage: python experiments/prof_grad.py [--spp 4 --size 1024 --mb 8]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/tpupt_prof_grad")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    from tpupt.bench.harness import _scene_bunny
    from tpupt.diff.params import extract_params, with_params
    from tpupt.render.integrator import render_image

    scene, camera = _scene_bunny()
    target = jnp.zeros((args.size * args.size, 3))

    def loss_fn(params, scene, camera):
        s = with_params(scene, params)
        buf, rays = render_image(
            s, camera, args.size, args.size, args.spp,
            max_bounces=args.mb, differentiable=True,
        )
        return jnp.sum((buf.color - target) ** 2), rays

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    params = extract_params(scene)
    g, rays = grad_fn(params, scene, camera)
    jax.block_until_ready(g["bg_up"])
    t0 = time.perf_counter()
    g, rays = grad_fn(params, scene, camera)
    jax.block_until_ready(g["bg_up"])
    wall = time.perf_counter() - t0
    print(f"fwd+bwd: {wall*1e3:.1f} ms, {int(rays)/wall/1e6:.2f} Mrays/s",
          file=sys.stderr)

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        g, rays = grad_fn(params, scene, camera)
        jax.block_until_ready(g["bg_up"])

    traces = glob.glob(f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace under {args.logdir}"
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)

    events = data["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    meta = {}
    shape_agg = collections.defaultdict(float)
    shape_cnt = collections.defaultdict(int)
    shape_of = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("while", "jit_", "conditional")):
            continue
        a = e.get("args", {})
        dur = e.get("dur", 0) / 1e3
        agg[name] += dur
        cnt[name] += 1
        total += dur
        if name not in meta:
            src = a.get("source", "")
            long = a.get("long_name", "")
            shape = long.split(" = ", 1)[-1].split(" fusion", 1)[0][:48]
            meta[name] = (src.replace("/root/repo/experiments/../", ""), shape)
            m = re.search(r"= \(?([a-z0-9]+\[[0-9,]*\])", long)
            shape_of[name] = m.group(1) if m else "?"
        shape_agg[shape_of[name]] += dur
        shape_cnt[shape_of[name]] += 1

    print(f"\ntotal leaf device op time: {total:.1f} ms (wall {wall*1e3:.1f} ms)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        src, shape = meta.get(name, ("", ""))
        print(f"{dur:9.2f} ms  x{cnt[name]:<5d} {name[:28]:28s} {shape:48s} {src}")
    print("\nby leading output shape:")
    for s, d in sorted(shape_agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d:9.2f} ms x{shape_cnt[s]:<6d} {s}")


if __name__ == "__main__":
    main()
