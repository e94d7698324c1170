"""Per-bounce live-lane / live-packet-row counts for the UNCHAINED
integrator at the fwd+bwd BASELINE config (round-5 verdict #1).

The differentiable scan pays full width every bounce; a width ladder can
only help if whole PACKET-row slices actually die off per bounce (a row
stays live while ANY of its 256 lanes is alive, and rows are contiguous
quarter-scanlines at 1024^2 — spatially correlated, so row liveness
decays slower than lane liveness).  This probe measures the real decay
and is the basis for the static rung schedule (TPUPT_DIFF_LADDER).

Usage: python experiments/diff_live_rows.py [--size 1024 --spp 4 --mb 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--scene", default="bunny")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpupt.utils.cache import setup_compile_cache

    setup_compile_cache("bench")

    from tpupt.accel.packets import PACKET
    from tpupt.bench import harness
    from tpupt.render.integrator import _bounce_body, _init_paths
    from tpupt.render.intersect import intersect_scene_ids

    scene, camera = getattr(harness, f"_scene_{args.scene}")()
    w = h = args.size

    def one_sample(it):
        state, seed, _ = _init_paths(scene, camera, w, h, it)

        def body(st, b):
            alive = st["alive"]
            lanes = jnp.sum(alive, dtype=jnp.int32)
            rows = jnp.sum(
                jnp.any(alive.reshape(-1, PACKET), axis=1), dtype=jnp.int32
            )
            st = _bounce_body(
                scene, seed, st, b, None, intersect_scene_ids,
                use_refine=False,
            )
            return st, (lanes, rows)

        _, (lanes, rows) = lax.scan(
            body, state, jnp.arange(args.mb, dtype=jnp.int32)
        )
        return lanes, rows

    @jax.jit
    def run():
        return lax.map(
            one_sample, jnp.arange(args.spp, dtype=jnp.int32)
        )

    lanes, rows = jax.block_until_ready(run())
    n = w * h
    np_ = n // PACKET
    print(f"{args.scene} {w}x{h} spp={args.spp} mb={args.mb} "
          f"lanes={n} rows={np_}")
    print("sample bounce  lanes(live%)   rows(live%)")
    import numpy as np

    lanes, rows = np.asarray(lanes), np.asarray(rows)
    for s in range(args.spp):
        for b in range(args.mb):
            print(
                f"{s:3d} {b:5d}  {lanes[s, b]:9d} ({lanes[s, b]/n*100:5.1f}%)"
                f"  {rows[s, b]:6d} ({rows[s, b]/np_*100:5.1f}%)"
            )
    mean_rows = rows.mean(axis=0) / np_
    print("mean row fraction per bounce:",
          " ".join(f"{f:.3f}" for f in mean_rows))


if __name__ == "__main__":
    main()
