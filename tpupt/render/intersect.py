"""Scene-level closest-hit intersection.

Two-phase design for differentiability (SURVEY.md §7 "hard parts"):

  1. ``intersect_scene_ids`` — finds WHICH primitive each ray hits.  Runs
     the stackless BVH traversal (`lax.while_loop`, not reverse-mode
     differentiable) entirely on `stop_gradient` inputs and returns only
     discrete ids + a non-diff t.

  2. ``refine_hit`` — given the ids, recomputes t / point / normal / face
     side in closed form from the *differentiable* scene parameters and ray.
     Gradients w.r.t. vertex positions, sphere center/radius and the ray
     flow through this step; the discrete visibility decision is treated as
     locally constant (standard differentiable-rendering practice).

Mirrors the reference ray_scene_intersection_test
(src/lib/path_tracer.cu:110-128): a linear scan over scene objects —
unrolled statically here since object counts are small — with the winning
object determining material_id, and later equal-t hits overwriting earlier
ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpupt.accel.traverse import traverse_mesh, moller_trumbore
from tpupt.core import math3d
from tpupt.core.types import (
    Hit,
    HitIds,
    OBJ_MESH,
    OBJ_SPHERE,
    PRIM_NONE,
    PRIM_SPHERE,
    PRIM_TRIANGLE,
    SceneArrays,
)

BIG_T = jnp.float32(3.0e38)


def _sphere_candidate(scene, o: int, prim: int, ro, rd, t_min, t_bound):
    """Object-space quadratic sphere test, replicating the reference's
    semantics (src/lib/intersections.cuh:7-41 driven by
    src/lib/path_tracer.cu:87-99):

      * ray transformed to object space with a NORMALIZED direction
      * the t-window check happens in object units against the caller's
        (world-unit) bounds — a reference quirk that is exact for the
        rigid transforms scenes actually use
      * winning t is re-measured in world units as |world_point - origin|
    """
    inv_m = scene.obj_inv_m[o]
    m = scene.obj_m[o]
    center = scene.sphere_center[prim]
    radius = scene.sphere_radius[prim]

    oo, od = math3d.inverse_transform_ray(inv_m[None], ro, rd, normalize_dir=True)
    oc = oo - center
    a = math3d.dot(od, od)
    b = 2.0 * math3d.dot(od, oc)
    c = math3d.dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    use1 = (t1 >= t_min) & (t1 <= t_bound)
    use2 = (t2 >= t_min) & (t2 <= t_bound)
    t_obj = jnp.where(use1, t1, t2)
    hit = (disc >= 0.0) & (use1 | use2)

    point_obj = oo + t_obj[..., None] * od
    point_w = math3d.transform_point(m[None], point_obj)
    t_w = math3d.length(point_w - ro)
    return hit, t_w


def intersect_scene_ids(
    scene: SceneArrays,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min: jnp.ndarray,
    active: jnp.ndarray,
) -> tuple[HitIds, jnp.ndarray]:
    """Discrete closest-hit pass.  All inputs are stop_gradient'ed so the
    internal while_loops never see tangents.  Returns (ids, traversal_steps).
    """
    scene = lax.stop_gradient(scene)
    ro = lax.stop_gradient(ro)
    rd = lax.stop_gradient(rd)
    t_min = lax.stop_gradient(t_min)

    n = ro.shape[0]
    t_best = jnp.full((n,), BIG_T)
    kind = jnp.full((n,), PRIM_NONE, jnp.int32)
    obj_id = jnp.full((n,), -1, jnp.int32)
    prim_id = jnp.full((n,), -1, jnp.int32)
    total_steps = jnp.int32(0)

    for o, (okind, oprim) in enumerate(zip(scene.s_obj_kind, scene.s_obj_prim)):
        if okind == OBJ_SPHERE:
            hit, t_w = _sphere_candidate(scene, o, oprim, ro, rd, t_min, t_best)
            take = active & hit
            t_best = jnp.where(take, t_w, t_best)
            kind = jnp.where(take, PRIM_SPHERE, kind)
            obj_id = jnp.where(take, o, obj_id)
            prim_id = jnp.where(take, oprim, prim_id)
        else:  # OBJ_MESH
            root = jnp.int32(scene.s_mesh_root[oprim])
            tri_local = jnp.full((n,), -1, jnp.int32)
            t_new, tri_local, steps = traverse_mesh(
                scene,
                root,
                scene.obj_m[o],
                scene.obj_inv_m[o],
                ro,
                rd,
                t_min,
                t_best,
                tri_local,
                active,
            )
            take = tri_local >= 0
            t_best = jnp.where(take, t_new, t_best)
            kind = jnp.where(take, PRIM_TRIANGLE, kind)
            obj_id = jnp.where(take, o, obj_id)
            prim_id = jnp.where(take, tri_local, prim_id)
            total_steps = total_steps + steps

    return HitIds(kind=kind, obj_id=obj_id, prim_id=prim_id, t=t_best), total_steps


def refine_hit(
    scene: SceneArrays,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min: jnp.ndarray,
    ids: HitIds,
) -> Hit:
    """Differentiable closed-form recomputation of the winning hit."""
    n = ro.shape[0]
    mask = ids.kind != PRIM_NONE
    safe_obj = jnp.maximum(ids.obj_id, 0)
    safe_prim = jnp.maximum(ids.prim_id, 0)
    m = scene.obj_m[safe_obj]  # (N, 4, 4)
    inv_m = scene.obj_inv_m[safe_obj]

    # --- sphere branch -------------------------------------------------
    s_prim = jnp.where(ids.kind == PRIM_SPHERE, safe_prim, 0)
    center = scene.sphere_center[s_prim]
    radius = scene.sphere_radius[s_prim]
    oo, od = math3d.inverse_transform_ray(inv_m, ro, rd, normalize_dir=True)
    oc = oo - center
    a = math3d.dot(od, od)
    b = 2.0 * math3d.dot(od, oc)
    c = math3d.dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    # the ids pass chose t1 when it was in-window; t1 <= t2 always, so
    # "t1 if t1 >= t_min else t2" reproduces the same root.
    t_obj = jnp.where(t1 >= t_min, t1, t2)
    sp_point_obj = oo + t_obj[..., None] * od
    sp_point = math3d.transform_point(m, sp_point_obj)
    sp_t = math3d.length(sp_point - ro)
    sp_outward = (sp_point_obj - center) / radius[..., None]
    sp_front = math3d.dot(od, sp_outward) < 0.0
    sp_normal_obj = jnp.where(sp_front[..., None], sp_outward, -sp_outward)
    # reference transform_normal leaves the normal un-normalized
    # (src/lib/transform.hpp:60-66); unit for the rigid transforms used.
    sp_normal = math3d.transform_normal(inv_m, sp_normal_obj)

    # --- triangle branch ----------------------------------------------
    t_prim = jnp.where(ids.kind == PRIM_TRIANGLE, safe_prim, 0)
    vidx = scene.tri_idx[t_prim]  # (N, 3)
    verts = scene.positions[vidx]  # (N, 3, 3)
    w = math3d.transform_point(m[:, None], verts)
    p0, p1, p2 = w[:, 0], w[:, 1], w[:, 2]
    e1 = p1 - p0
    e2 = p2 - p0
    h = math3d.cross(rd, e2)
    det = math3d.dot(e1, h)
    f = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = ro - p0
    q = math3d.cross(s, e1)
    tr_t = f * math3d.dot(e2, q)
    tr_point = ro + tr_t[..., None] * rd
    tr_outward = math3d.normalize(math3d.cross(e1, e2))
    tr_front = math3d.dot(rd, tr_outward) < 0.0
    tr_normal = jnp.where(tr_front[..., None], tr_outward, -tr_outward)

    # --- select --------------------------------------------------------
    is_tri = (ids.kind == PRIM_TRIANGLE)[..., None]
    point = jnp.where(is_tri, tr_point, sp_point)
    normal = jnp.where(is_tri, tr_normal, sp_normal)
    t = jnp.where(ids.kind == PRIM_TRIANGLE, tr_t, sp_t)
    front = jnp.where(ids.kind == PRIM_TRIANGLE, tr_front, sp_front)
    mat_id = scene.obj_mat[safe_obj]

    zero3 = jnp.zeros((n, 3))
    return Hit(
        mask=mask,
        t=jnp.where(mask, t, BIG_T),
        point=jnp.where(mask[..., None], point, zero3),
        normal=jnp.where(mask[..., None], normal, zero3),
        front=front & mask,
        mat_id=jnp.where(mask, mat_id, 0),
    )


def background_color(scene: SceneArrays, rd: jnp.ndarray) -> jnp.ndarray:
    """Sky gradient (reference get_background_color,
    src/lib/path_tracer.cu:29-34) with differentiable endpoints."""
    unit = math3d.normalize(rd)
    t = 0.5 * (unit[..., 1] + 1.0)
    return scene.bg_down[None] + t[..., None] * (scene.bg_up - scene.bg_down)[None]
