"""Measure the v5e VPU f32 roofline honestly.

DESIGN.md (r2) recorded "~39 TFLOP/s f32 on fused chains" and concluded
the sweep's ~60 Gpairs/s (~4.2 TFLOP/s at ~70 f32 ops/pair) sits at ~10%
of peak — the premise behind VERDICT r3 #1's below-XLA mandate.  That
number was a measurement artifact.  Two relay timing traps, both hit
while building this (recorded in CLAUDE.md):

  * XLA constant-folds linear x*c+d chains of any depth into ONE fma —
    op chains must be nonlinear (x*(1-x)*c, x*x+c) to survive;
  * through the relay, repeated executions of the IDENTICAL (program,
    inputs) pair can return in ~0.07 ms — below even the ~6 ms dispatch
    latency — i.e. the result is served from a cache, and
    block_until_ready alone does not reliably fence small programs.
    A HOST FETCH of an output fences correctly (the production bench
    harness fetches int(rays) per call, which is why its numbers were
    never affected — verified: per-call bunny renders time identically
    at 0.708 s across repeats).

Method: the op chain runs inside a fori_loop whose trip count is a
TRACED argument (distinct calls per trip count), fenced by fetching one
output element; the roofline is the MARGINAL rate between two trip
counts, which cancels dispatch + fetch + loop-entry overhead.

Measured 2026-08-20 (v5e via relay): logistic 5.4, poly2 5.5, mixed 4.6
TFLOP/s marginal — the true VPU f32 roofline is ~5.5 TFLOP/s, and the
production sweep's 60 Gpairs/s is ~76%% of it, not 10%%.

Usage: python experiments/vpu_roofline.py [--mb 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_UNROLL = 96  # ops per element per trip (static unroll inside the loop)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64, help="array size in MiB")
    ap.add_argument("--t1", type=int, default=64)
    ap.add_argument("--t2", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    n = args.mb * 1024 * 1024 // 4
    x0 = jnp.linspace(0.25, 0.75, n, dtype=jnp.float32).reshape(-1, 256)

    def body_logistic(i, x):
        c = jnp.float32(3.5) + i.astype(jnp.float32) * 1e-9
        for _ in range(_UNROLL // 3):
            x = x * (jnp.float32(1.0) - x) * c
        return x

    def body_poly2(i, x):
        c = jnp.float32(-1.401155) + i.astype(jnp.float32) * 1e-9
        y = x * jnp.float32(0.998) + jnp.float32(1e-3)
        for _ in range(_UNROLL // 8):
            x = x * x + c
            y = y * y - c
            x = x - y * jnp.float32(1e-9)
            y = y + x * jnp.float32(1e-9)
        return x + y * jnp.float32(1e-9)

    def body_mixed(i, x):
        c = jnp.float32(0.5) + i.astype(jnp.float32) * 1e-9
        y = x * jnp.float32(0.9) + jnp.float32(0.05)
        z = x * jnp.float32(1.1) - c
        for _ in range(_UNROLL // 10):
            h = x * y - z * z
            q = y * z - x * x
            m = h > q
            x = jnp.where(m, h - q, x)
            y = y + q * jnp.float32(1e-7)
        return x + y * jnp.float32(1e-9)

    per_trip = {
        "logistic": 3 * (_UNROLL // 3),
        "poly2   ": 8 * (_UNROLL // 8),
        "mixed   ": 10 * (_UNROLL // 10),
    }

    def timed(fn, trips):
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(x0, jnp.int32(trips))
            jax.block_until_ready(out)
            _ = float(out[0, 0])  # host fetch fences the relay
            best = min(best, time.perf_counter() - t0)
        return best

    for name, body in (
        ("logistic", body_logistic),
        ("poly2   ", body_poly2),
        ("mixed   ", body_mixed),
    ):
        @jax.jit
        def run(x, trips, body=body):
            return lax.fori_loop(0, trips, body, x)

        timed(run, 2)  # warm compile
        s1 = timed(run, args.t1)
        s2 = timed(run, args.t2)
        dflops = per_trip[name] * (args.t2 - args.t1) * n
        print(
            f"{name}: t{args.t1} {s1*1e3:7.1f} ms, t{args.t2} {s2*1e3:7.1f} ms "
            f"-> marginal {dflops/max(s2-s1,1e-9)/1e12:5.2f} TFLOP/s"
        )


if __name__ == "__main__":
    main()
