"""Ladder-granularity sweep (round 4).

sec_stats.py (work-efficient replay) vs the production rate implies the
render pays ~2.6x the work-efficient pair count — lockstep waste from
the DIV=2 ladders (bounded at DIV x optimal per rung) plus FETCH_R
overshoot.  Fractional DIVs tighten the bound at the cost of more rungs
(compile size).  One config per process (the DIVs are read from env at
import): run via

  TPUPT_CHAIN_DIV=1.5 TPUPT_LADDER_DIV=2 python experiments/sweep_ladder.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    from functools import partial

    from tpupt.utils.cache import setup_compile_cache

    setup_compile_cache("bench")

    from tpupt.bench.harness import _scene_bunny
    from tpupt.render.integrator import render_image

    scene, camera = _scene_bunny()
    fn = jax.jit(partial(
        render_image, width=1024, height=1024, spp=16, max_bounces=50,
        rr_start=8,
    ))
    out = fn(scene, camera)
    rays = int(out[1])  # host fetch fences (CLAUDE.md relay trap)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(scene, camera)
        rays = int(out[1])
        jax.block_until_ready(out[0].color)
        best = min(best, time.perf_counter() - t0)
    print(
        f"chain_div={os.environ.get('TPUPT_CHAIN_DIV', '2')} "
        f"ladder_div={os.environ.get('TPUPT_LADDER_DIV', '2')}: "
        f"{rays/best/1e6:.2f} Mrays/s ({rays} rays, {best:.3f}s)"
    )


if __name__ == "__main__":
    main()
