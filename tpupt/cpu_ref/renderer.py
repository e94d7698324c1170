"""Brute-force reference renderer (the correctness oracle).

SURVEY.md §4 calls for "a CPU (pure-jnp) reference renderer" to hold the
golden-image/allclose bar the reference repo never had.  This module swaps
the BVH traversal for an exhaustive test of every triangle of every mesh
object — same integrator, same shading, same RNG — so any disagreement
with the accelerated path isolates the accelerator.

Scales O(rays * triangles); use small meshes / images in tests.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpupt.accel.traverse import moller_trumbore
from tpupt.core import math3d
from tpupt.core.types import HitIds, OBJ_SPHERE, PRIM_SPHERE, PRIM_TRIANGLE, PRIM_NONE
from tpupt.render.integrator import render_image, trace_sample
from tpupt.render.intersect import _sphere_pass, BIG_T

_CHUNK = 512  # triangles per vectorized block


def intersect_scene_ids_brute(scene, ro, rd, t_min, active):
    """Exhaustive closest-hit: same winner semantics as the accelerated
    path (equal-t overwrites, objects scanned in order).  ro/rd are Vec3
    (core/vec.py); the all-pairs math uses (N, C) arrays — fine on CPU."""
    scene = lax.stop_gradient(scene)
    ro = lax.stop_gradient(ro)
    rd = lax.stop_gradient(rd)
    t_min = lax.stop_gradient(t_min)

    n = ro.x.shape[0]
    t_best = jnp.full((n,), BIG_T)
    kind = jnp.full((n,), PRIM_NONE, jnp.int32)
    obj_id = jnp.full((n,), -1, jnp.int32)
    prim_id = jnp.full((n,), -1, jnp.int32)

    t_best, kind, obj_id, prim_id, *_ = _sphere_pass(
        scene, ro, rd, t_min, active, t_best, kind, obj_id, prim_id
    )

    ro_a, rd_a = ro.to_array(), rd.to_array()
    for o, (okind, oprim) in enumerate(zip(scene.s_obj_kind, scene.s_obj_prim)):
        if okind == OBJ_SPHERE:
            continue  # handled in the sphere pass above
        else:
            # mesh extent within the global pools (static metadata)
            lo, hi = scene.s_mesh_tri_range[oprim]
            m = scene.obj_m[o]
            for c0 in range(lo, hi, _CHUNK):
                c1 = min(c0 + _CHUNK, hi)
                tri_ids = jnp.arange(c0, c1, dtype=jnp.int32)
                verts = scene.positions[scene.tri_idx[tri_ids]]  # (C,3,3)
                w = math3d.transform_point(m[None, None], verts)
                # (N, C) all-pairs test
                ok, t = moller_trumbore(
                    ro_a[:, None],
                    rd_a[:, None],
                    w[None, :, 0],
                    w[None, :, 1],
                    w[None, :, 2],
                    t_min[:, None],
                    t_best[:, None],
                )
                # closest within the chunk; ties -> higher tri id to match
                # the accelerated path's <= overwrites in visit order as
                # closely as possible (ties are measure-zero anyway)
                t_masked = jnp.where(ok, t, BIG_T)
                best_c = jnp.argmin(t_masked, axis=1)
                best_ok = jnp.take_along_axis(ok, best_c[:, None], 1)[:, 0]
                best_t = jnp.take_along_axis(t_masked, best_c[:, None], 1)[:, 0]
                take = active & best_ok & (best_t <= t_best)
                t_best = jnp.where(take, best_t, t_best)
                kind = jnp.where(take, PRIM_TRIANGLE, kind)
                obj_id = jnp.where(take, o, obj_id)
                prim_id = jnp.where(take, tri_ids[best_c], prim_id)

    return HitIds(kind=kind, obj_id=obj_id, prim_id=prim_id, t=t_best), None


def render_image_ref(scene, camera, width, height, spp=1, **kw):
    """Reference render: the shared integrator + brute-force intersection."""
    return render_image(
        scene, camera, width, height, spp,
        intersect_fn=intersect_scene_ids_brute, **kw,
    )


def trace_sample_ref(scene, camera, width, height, iteration, **kw):
    return trace_sample(
        scene, camera, width, height, iteration,
        intersect_fn=intersect_scene_ids_brute, **kw,
    )
