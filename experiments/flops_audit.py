"""Audit the sweep step's flops/pair from the COMPILED program (round-5
verdict #2a).

The round-4 structural-limit claim ("sweep at ~76% of the 5.5 TFLOP/s
VPU roofline") divided a measured pair rate by a hand-estimated ~70 f32
ops/pair that was never counted.  This script compiles the EXACT
production step (`tpupt.accel.packets.sweep_step` — the same function
every ladder rung while-loops) at production rung shapes and reads
`compile().cost_analysis()['flops']`, then re-times the step in a
32-step fori_loop to put measured flops over measured seconds.

Notes on what the count means:
  * XLA's HloCostAnalysis counts every elementwise arithmetic op
    (mul/add/div/min/max/compare/select) as 1 flop per output element —
    the same currency as vpu_roofline.py's marginal-rate measurement
    (which counted its mul/sub chains the same way), so the utilization
    ratio is apples-to-apples.
  * flops of the compiled step are static (masks select, they don't
    branch), so one number covers every trip.

Usage: python experiments/flops_audit.py [--steps 32] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VPU_ROOFLINE = 5.5e12  # measured marginal-rate f32 peak (vpu_roofline.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scene", default="bunny", choices=("bunny", "ajax"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpupt.utils.cache import setup_compile_cache

    setup_compile_cache("bench")

    from tpupt.accel import packets as pk
    from tpupt.bench import harness
    from tpupt.core import camera as cam
    from tpupt.sampling.rng import jitter_counters, pixel_seed, uniform

    scene, camera = getattr(harness, f"_scene_{args.scene}")()
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]
    print(f"scene={args.scene} K={K} L={L} P={pk.PACKET} R={pk.FETCH_R}",
          file=sys.stderr)

    # real production primaries at 1024^2 (flops are shape-static; real
    # rays keep the timed dynamics honest)
    w = h = 1024
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    seed = pixel_seed(pix, jnp.int32(0))
    c0, c1 = jitter_counters()
    fx = (pix % jnp.uint32(w)).astype(jnp.float32) + uniform(seed, c0)
    fy = (pix // jnp.uint32(w)).astype(jnp.float32) + uniform(seed, c1)
    ro, rd = cam.generate_rays(camera, w, h, fx, fy)
    n = w * h
    t_min = jnp.full((n,), 1e-3)
    t_seed = jnp.full((n,), pk.BIG)
    active = jnp.ones((n,), bool)

    rows, act_p, np_, p = pk._pack_rows(ro, rd, t_min, t_seed, active)
    rows["entry"] = pk._cull_entries(scene, rows, act_p)
    zero_p = rows["t"] * 0.0
    if rows["entry"].shape[1] >= pk._LEX_SEL_MIN_K:
        rows["sel_val"] = zero_p[:, 0] - pk.BIG
        rows["sel_idx"] = zero_p[:, 0].astype(jnp.int32) - 1
    rows["slot"] = zero_p.astype(jnp.int32) - 1
    rows["nx"] = zero_p
    rows["ny"] = zero_p
    rows["nz"] = zero_p
    rows["obj"] = zero_p - 1.0
    rows["src"] = zero_p[:, 0].astype(jnp.int32) + jnp.arange(
        np_, dtype=jnp.int32
    )
    rows = jax.block_until_ready(rows)

    variants = {
        "fwd  (6ch)": ((), (), pk.FETCH_R),
        "diff (15ch)": (pk._DIFF_KEYS, pk._DIFF_COMPS, pk.FETCH_R_DIFF),
    }
    for name, (ek, ec, R) in variants.items():
        for sz in (np_, np_ // 8):
            sub = {k: v[:sz] for k, v in rows.items()}
            for k in ek:
                sub[k] = sub["t"] * 0.0 + (1.0 if k in ("e1x", "e2y") else 0.0)

            def step(r, ek=ek, ec=ec, R=R):
                return pk.sweep_step(scene, r, R, L, ek, ec, False)

            pairs = sz * R * L * p
            try:
                ca = jax.jit(step).lower(sub).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", float("nan")))
                trans = float(ca.get("transcendentals", 0.0))
                byts = float(ca.get("bytes accessed", float("nan")))
                print(
                    f"{name} sz={sz:5d}: flops={flops:.3e} "
                    f"({flops/pairs:6.1f}/pair) transcendental={trans:.2e} "
                    f"bytes={byts:.3e} ({byts/pairs:5.1f}/pair)"
                )
            except Exception as e:
                flops = float("nan")
                print(f"{name} sz={sz}: cost_analysis failed: {e}")

            def loop(r, step=step):
                return lax.fori_loop(0, args.steps, lambda i, rr: step(rr), r)

            jl = jax.jit(loop)
            out = jl(sub)
            float(out["t"][0, 0])  # fenced warmup
            best = 1e9
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out = jl(sub)
                float(out["t"][0, 0])
                best = min(best, time.perf_counter() - t0)
            gpairs = pairs * args.steps / best / 1e9
            fl_s = flops * args.steps / best
            print(
                f"{name} sz={sz:5d}: {best*1e3:7.2f} ms/{args.steps} steps  "
                f"{gpairs:6.1f} Gpairs/s  {fl_s/1e12:5.2f} TFLOP/s  "
                f"= {fl_s/VPU_ROOFLINE*100:5.1f}% of the 5.5 TFLOP/s roofline"
            )


if __name__ == "__main__":
    main()
