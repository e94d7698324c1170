"""Re-sweep treelet leaf size L and packet size P on TPU after the
variadic winner-reduce change shifted the sweep's cost structure
(DESIGN.md: parameter choices must be re-measured when the per-step
fixed costs change).

Usage: python experiments/sweep_lp.py [--size 1024] [--spp 4]
Prints one line per (L, P) combo with Mrays/s.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--mb", type=int, default=50)
    ap.add_argument("--rr", type=int, default=8)
    ap.add_argument("--leaves", default="16,32")
    ap.add_argument("--packets", default="128,256")
    args = ap.parse_args()

    import jax
    from functools import partial

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    import tpupt.accel.packets as pk
    from tpupt.bench.harness import _scene_bunny
    from tpupt.render.integrator import render_image

    for L in [int(x) for x in args.leaves.split(",")]:
        scene, camera = _scene_bunny(leaf_size=L)
        for P in [int(x) for x in args.packets.split(",")]:
            pk.PACKET = P
            fn = jax.jit(partial(
                render_image, width=args.size, height=args.size,
                spp=args.spp, max_bounces=args.mb, rr_start=args.rr,
            ))
            buf, rays = fn(scene, camera)
            jax.block_until_ready(buf.color)
            t0 = time.perf_counter()
            buf, rays = fn(scene, camera)
            jax.block_until_ready(buf.color)
            wall = time.perf_counter() - t0
            print(
                f"L={L:3d} P={P:3d}: {wall*1e3:7.1f} ms  "
                f"{int(rays)/wall/1e6:6.2f} Mrays/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
