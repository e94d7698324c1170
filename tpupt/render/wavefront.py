"""Wavefront ("streaming") integrator with on-device compaction.

The reference's default mode re-launches kernels per bounce and compacts
live paths with `thrust::stable_partition`, reading the surviving count
back to the host every bounce (src/lib/path_tracer.cu:413-470) — a
host↔device sync per bounce.  The TPU-native redesign keeps the whole loop
on device:

  * path state is the same 6-field SoA as the reference `Paths`
    (src/lib/path_tracer.hpp:24-34) plus `pixel_indices` for the final
    scatter-gather;
  * compaction = a stable argsort on the dead mask (dead lanes sink to the
    back), i.e. a permutation — nothing is discarded, exactly like
    stable_partition.  The live count is a traced scalar, never read back;
  * lanes beyond the live count are masked off in intersect/shade, and —
    the actual TPU benefit — compaction keeps live rays contiguous, which
    makes the traversal's node gathers coherent;
  * the RNG keys off the *global pixel index* carried in `pixel_indices`
    (the reference streams off the compacted lane index,
    path_tracer.cu:298-301, so its two modes produce different noise;
    ours are bit-identical — see test_wavefront.py).

Forward-only (use the megakernel integrator for differentiation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpupt.core import camera as cam
from tpupt.core import vec
from tpupt.core.vec import Vec3
from tpupt.core.types import Camera, SceneArrays
from tpupt.render.integrator import MAX_BOUNCES_DEFAULT
from tpupt.render.intersect import (
    background_color,
    intersect_scene_ids,
    refine_hit,
)
from tpupt.render.materials import russian_roulette, shade
from tpupt.sampling.rng import jitter_counters, pixel_seed, uniform


def trace_sample_wavefront(
    scene: SceneArrays,
    camera: Camera,
    width: int,
    height: int,
    iteration,
    max_bounces: int = MAX_BOUNCES_DEFAULT,
    rr_start: int | None = None,
    intersect_fn=intersect_scene_ids,
):
    """One spp pass; returns (color, normal, depth, rays) in pixel order."""
    n = width * height
    pix = jnp.arange(n, dtype=jnp.uint32)
    seed0 = pixel_seed(pix, iteration)
    c0, c1 = jitter_counters()
    fx = (pix % jnp.uint32(width)).astype(jnp.float32) + uniform(seed0, c0)
    fy = (pix // jnp.uint32(width)).astype(jnp.float32) + uniform(seed0, c1)
    ro, rd = cam.generate_rays(camera, width, height, fx, fy)

    state = dict(
        pixel=pix.astype(jnp.int32),
        ro=ro,
        rd=rd,
        t_min=jnp.full((n,), jnp.float32(cam.T_MIN_PRIMARY)),
        radiance=Vec3.full((n,), 0.0, 0.0, 0.0),
        color=Vec3.full((n,), 1.0, 1.0, 1.0),
        alive=jnp.ones((n,), bool),
        spec=jnp.ones((n,), bool),
        pdf_w=jnp.zeros((n,), jnp.float32),
        normal=-rd,
        depth=jnp.full((n,), jnp.float32(1e6)),
    )
    lane = jnp.arange(n, dtype=jnp.int32)

    def cond(carry):
        b, count, st, rays = carry
        return (b < max_bounces) & (count > 0)

    def body(carry):
        b, count, st, rays = carry
        active = lane < count  # live paths are compacted to the front
        rays = rays + count

        seed = pixel_seed(st["pixel"].astype(jnp.uint32), iteration)
        ids, fwd = intersect_fn(scene, st["ro"], st["rd"], st["t_min"], active)
        hit = fwd if fwd is not None else refine_hit(
            scene, st["ro"], st["rd"], st["t_min"], ids
        )

        hit_alive = active & hit.mask
        miss = active & ~hit.mask
        radiance = vec.where(
            miss,
            st["radiance"] + st["color"] * background_color(scene, st["rd"]),
            st["radiance"],
        )
        first = jnp.equal(b, 0)
        normal = vec.where(first & hit.mask, hit.normal, st["normal"])
        depth = jnp.where(first & hit.mask, hit.t, st["depth"])

        new_ro, new_rd, new_t_min, new_color, emitted, absorb, specular, new_pdf = shade(
            scene, hit, st["ro"], st["rd"], st["t_min"], st["color"], seed, b
        )
        has_nee = (
            len(scene.s_light_objs) > 0 or scene.s_tri_light_count > 0
        )
        from tpupt.render.integrator import (
            _nee_direct_light,
            _weighted_emission,
        )

        radiance = _weighted_emission(
            scene, radiance, st, ids, hit, emitted, absorb, hit_alive,
            has_nee,
        )
        if has_nee:
            radiance = radiance + _nee_direct_light(
                scene, hit, st["color"], seed, b, intersect_fn, active
            )
        st = dict(
            pixel=st["pixel"],
            ro=vec.where(hit_alive, new_ro, st["ro"]),
            rd=vec.where(hit_alive, new_rd, st["rd"]),
            t_min=jnp.where(hit_alive, new_t_min, st["t_min"]),
            radiance=radiance,
            color=vec.where(hit_alive, new_color, st["color"]),
            alive=hit_alive & ~absorb,
            spec=jnp.where(hit_alive, specular, st["spec"]),
            pdf_w=jnp.where(hit_alive, new_pdf, st["pdf_w"]),
            normal=normal,
            depth=depth,
        )
        if rr_start is not None:
            tp, al = russian_roulette(st["color"], st["alive"], seed, b)
            apply = b >= rr_start
            st["color"] = vec.where(apply & al, tp, st["color"])
            st["alive"] = jnp.where(apply, al, st["alive"])

        # --- compaction: stable-partition live lanes to the front --------
        # (replaces thrust::stable_partition; built from prefix sums — a
        # 1M-lane argsort costs ~300 ms on v5e, this is ~35 ms)
        from tpupt.render.integrator import _partition_perm

        order, count = _partition_perm(st["alive"])
        st = jax.tree_util.tree_map(lambda v: v[order], st)
        return b + 1, count, st, rays

    _, _, state, rays = lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(n), state, jnp.int32(0))
    )

    final = vec.where(
        state["alive"], state["radiance"] + state["color"], state["radiance"]
    )
    # final gather: scatter by pixel index (reference final_gathering_kernel,
    # src/lib/path_tracer.cu:317-330); boundary rep is (N, 3)
    color = jnp.zeros((n, 3)).at[state["pixel"]].set(final.to_array())
    normal = jnp.zeros((n, 3)).at[state["pixel"]].set(state["normal"].to_array())
    depth = jnp.zeros((n,)).at[state["pixel"]].set(state["depth"])
    return color, normal, depth, rays
