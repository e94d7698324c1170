"""Direction-octant ray binning: measure the win it could buy vs what it
costs (round-2 verdict #2).

Binning groups lanes whose ray-direction sign bits agree, so each
256-lane packet sees a half-space-coherent direction set — tightening
per-packet treelet unions for SECONDARY rays (the tile-swizzle negative
result only ever tested spatial coherence of primaries).

Decomposition measured here on the real chip, flagship bunny scene:

  A. intersect_scene_ids on coherent primaries            (baseline)
  B. intersect on diffuse-bounced secondaries, pixel order (the problem)
  C. intersect on the same secondaries, octant-sorted     (the best case
     any binning scheme can reach: B - C is the available win per bounce)
  D. one packed (N, 8) permutation row-gather + one (N, 8) un-permute
     scatter at the same lane count (the unavoidable overhead of applying
     a binning permutation to the intersector inputs and outputs —
     per-lane gathers serialize at ~7.7 ns/lane/op, DESIGN.md)

Adopt binning only if (B - C) clearly exceeds D per bounce.

Usage: python experiments/octant_probe.py [--size 1024]
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
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    from tpupt.core import camera as cam
    from tpupt.core.vec import Vec3
    from tpupt.render.intersect import intersect_scene_ids, refine_hit
    from tpupt.render.materials import shade
    from tpupt.sampling.rng import pixel_seed
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    scene, camera = ge._flagship_scene(mesh_subdiv=4)
    W = H = args.size
    n = W * H

    def primaries(_):
        pix = jnp.arange(n, dtype=jnp.uint32)
        fx = (pix % W).astype(jnp.float32) + 0.5
        fy = (pix // W).astype(jnp.float32) + 0.5
        ro, rd = cam.generate_rays(camera, W, H, fx, fy)
        t_min = jnp.full((n,), jnp.float32(cam.T_MIN_PRIMARY))
        return ro, rd, t_min

    def isect(ro, rd, t_min, active):
        ids, fwd = intersect_scene_ids(scene, ro, rd, t_min, active)
        return ids.t, ids.obj_id

    def bounce_rays(_):
        ro, rd, t_min = primaries(None)
        active = jnp.ones((n,), bool)
        ids, fwd = intersect_scene_ids(scene, ro, rd, t_min, active)
        seed = pixel_seed(jnp.arange(n, dtype=jnp.uint32), 0)
        nro, nrd, nt, _c, _e, _a, _s, _p = shade(
            scene, fwd, ro, rd, t_min,
            Vec3(jnp.ones(n), jnp.ones(n), jnp.ones(n)), seed, 1,
        )
        return nro, nrd, nt, fwd.mask

    def octant_perm(rd):
        key = (
            (rd.x < 0).astype(jnp.int32) * 4
            + (rd.y < 0).astype(jnp.int32) * 2
            + (rd.z < 0).astype(jnp.int32)
        )
        return jnp.argsort(key, stable=True).astype(jnp.int32)

    def timed(f, *a):
        out = jax.block_until_ready(jax.jit(f)(*a))
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = jax.block_until_ready(jax.jit(f)(*a))
            best = min(best, time.perf_counter() - t0)
        return best, out

    ro, rd, t_min = jax.jit(primaries)(None)
    act = jnp.ones((n,), bool)
    tA, _ = timed(isect, ro, rd, t_min, act)
    print(f"A primaries intersect:            {tA*1e3:8.1f} ms")

    nro, nrd, nt, mask = jax.jit(bounce_rays)(None)
    tB, _ = timed(isect, nro, nrd, nt, mask)
    print(f"B secondaries, pixel order:       {tB*1e3:8.1f} ms")

    perm = jax.jit(octant_perm)(nrd)
    sro = Vec3(nro.x[perm], nro.y[perm], nro.z[perm])
    srd = Vec3(nrd.x[perm], nrd.y[perm], nrd.z[perm])
    snt, smask = nt[perm], mask[perm]
    tC, _ = timed(isect, sro, srd, snt, smask)
    print(f"C secondaries, octant-sorted:     {tC*1e3:8.1f} ms   "
          f"(available win B-C = {(tB-tC)*1e3:.1f} ms/bounce)")

    def permute_cost(packed, perm):
        g = packed[perm]  # (N, 8) row gather
        return jnp.zeros_like(packed).at[perm].set(g)  # (N, 8) scatter back

    packed = jnp.stack(
        [nro.x, nro.y, nro.z, nrd.x, nrd.y, nrd.z, nt,
         mask.astype(jnp.float32)], axis=1,
    )
    tD, _ = timed(permute_cost, packed, perm)
    print(f"D permute in + out ((N,8) rows):  {tD*1e3:8.1f} ms   "
          f"(binning overhead/bounce, excl. building the permutation)")
    print(f"verdict: {'ADOPT' if (tB - tC) > 1.1 * tD else 'NEGATIVE'} — "
          f"win {(tB-tC)*1e3:.1f} ms vs overhead {tD*1e3:.1f} ms")


if __name__ == "__main__":
    main()
