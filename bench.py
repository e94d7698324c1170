"""Benchmark harness (BASELINE.md): renders the flagship bunny-BVH config
and prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline: forward Mrays/s/chip at 1024x1024 on the bunny scene
(BASELINE.json target: >= 100 Mrays/s/chip => vs_baseline = value / 100).

Rays are counted as actually-traced path segments (sum over bounces of
live lanes), the honest version of W*H*spp*avg_bounces.

Extra configs (--all) cover the other BASELINE configs; they print to
stderr so the driver still sees exactly one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 100.0


def _bench_forward(scene, camera, width, height, spp, max_bounces, iters, rr_start=None):
    import jax
    from functools import partial
    from tpupt.render.integrator import render_image

    fn = jax.jit(
        partial(
            render_image,
            width=width,
            height=height,
            spp=spp,
            max_bounces=max_bounces,
            rr_start=rr_start,
        )
    )
    # warmup/compile
    buffers, rays = fn(scene, camera)
    jax.block_until_ready(buffers.color)

    t0 = time.perf_counter()
    total_rays = 0
    for _ in range(iters):
        buffers, rays = fn(scene, camera)
        total_rays += int(rays)
    jax.block_until_ready(buffers.color)
    secs = time.perf_counter() - t0
    return total_rays / secs / 1e6, secs, total_rays


def _bench_fwd_bwd(scene, camera, width, height, spp, max_bounces, iters):
    import jax
    import jax.numpy as jnp
    from tpupt.diff.params import extract_params, with_params
    from tpupt.render.integrator import render_image

    target = jnp.zeros((width * height, 3))

    def loss_fn(params, scene, camera):
        s = with_params(scene, params)
        buf, rays = render_image(
            s, camera, width, height, spp, max_bounces=max_bounces, differentiable=True
        )
        return jnp.sum((buf.color - target) ** 2), rays

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    params = extract_params(scene)
    g, rays = grad_fn(params, scene, camera)
    jax.block_until_ready(g["bg_up"])

    t0 = time.perf_counter()
    total_rays = 0
    for _ in range(iters):
        g, rays = grad_fn(params, scene, camera)
        total_rays += int(rays)
    jax.block_until_ready(g["bg_up"])
    secs = time.perf_counter() - t0
    # fwd+bwd: count primal segments only (conservative)
    return total_rays / secs / 1e6, secs, total_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=50)
    ap.add_argument("--all", action="store_true", help="also run secondary configs (stderr)")
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)

    import __graft_entry__ as ge

    scene, camera = ge._flagship_scene(mesh_subdiv=4)  # 5120-tri bunny substitute

    mrays, secs, rays = _bench_forward(
        scene, camera, args.size, args.size, args.spp, args.max_bounces, args.iters
    )
    print(
        f"forward bunny {args.size}^2 spp={args.spp}: {mrays:.2f} Mrays/s "
        f"({rays} rays in {secs:.3f}s)",
        file=sys.stderr,
    )

    if args.all:
        m2, s2, r2 = _bench_fwd_bwd(scene, camera, 512, 512, 1, 8, max(1, args.iters // 2))
        print(f"fwd+bwd bunny 512^2: {m2:.2f} Mrays/s ({r2} rays in {s2:.3f}s)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "fwd_mrays_per_sec_per_chip_bunny1024",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
