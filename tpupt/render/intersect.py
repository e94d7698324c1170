"""Scene-level closest-hit intersection (component-SoA hot path).

Two-phase design for differentiability (SURVEY.md §7 "hard parts"):

  1. ``intersect_scene_ids`` — finds WHICH primitive each ray hits.  Runs
     the packet-treelet sweep (`lax.while_loop`, not reverse-mode
     differentiable) entirely on `stop_gradient` inputs and returns only
     discrete ids + a non-diff t.

  2. ``refine_hit`` — given the ids, recomputes t / point / normal / face
     side in closed form from the *differentiable* scene parameters and
     ray.  Gradients w.r.t. vertex positions, sphere center/radius and the
     ray flow through this step; the discrete visibility decision is
     treated as locally constant (standard differentiable-rendering
     practice).  Its per-lane gathers run once per bounce, not per
     traversal step, so they are off the critical path.

Mirrors the reference ray_scene_intersection_test
(src/lib/path_tracer.cu:110-128): objects scanned with the winner setting
material_id and later equal-t hits overwriting earlier ones.  All hot
arrays are (N,)-component (see core/vec.py for the TPU layout rationale).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpupt.accel.packets import (
    _DIFF_KEYS as _PAYLOAD_KEYS,
    intersect_treelets,
    intersect_treelets_anyhit,
)
from tpupt.accel.traverse import traverse_mesh
from tpupt.core import vec
from tpupt.core.vec import Vec3
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


def _sphere_candidate(scene, o: int, prim: int, ro: Vec3, rd: Vec3, t_min, t_bound):
    """Object-space quadratic sphere test, replicating the reference's
    semantics (src/lib/intersections.cuh:7-41 driven by
    src/lib/path_tracer.cu:87-99):

      * ray transformed to object space with a NORMALIZED direction
      * the t-window check happens in object units against the caller's
        (world-unit) bounds — a reference quirk that is exact for the
        rigid transforms scenes actually use
      * winning t is re-measured in world units as |world_point - origin|

    Everything is inline scalar-matrix math (no per-lane gathers): returns
    (hit, t_w, world point, world normal, front) for the forward hit.
    """
    inv_m = scene.obj_inv_m[o]
    m = scene.obj_m[o]
    cx = scene.sphere_center[prim, 0]
    cy = scene.sphere_center[prim, 1]
    cz = scene.sphere_center[prim, 2]
    radius = scene.sphere_radius[prim]

    oo = vec.transform_point(inv_m, ro)
    od = vec.transform_vector(inv_m, rd).normalize()
    oc = oo - Vec3(cx, cy, cz)
    a = od.dot(od)
    b = 2.0 * od.dot(oc)
    c = oc.dot(oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    use1 = (t1 >= t_min) & (t1 <= t_bound)
    use2 = (t2 >= t_min) & (t2 <= t_bound)
    t_obj = jnp.where(use1, t1, t2)
    hit = (disc >= 0.0) & (use1 | use2)

    point_obj = oo + od * t_obj
    point_w = vec.transform_point(m, point_obj)
    t_w = (point_w - ro).length()

    outward = (point_obj - Vec3(cx, cy, cz)) * (1.0 / radius)
    front = od.dot(outward) < 0.0
    normal_obj = vec.where(front, outward, -outward)
    normal_w = vec.transform_normal(inv_m, normal_obj)
    return hit, t_w, point_w, normal_w, front


def _sphere_pass(scene, ro: Vec3, rd: Vec3, t_min, active, t_best, kind, obj_id, prim_id):
    """Linear scan over sphere objects (reference object loop,
    src/lib/path_tracer.cu:110-128), unrolled statically.  Also folds the
    forward hit record (point/normal/front/mat) with zero gathers."""
    n = t_best.shape[0]
    point = Vec3.full((n,), 0.0, 0.0, 0.0)
    normal = Vec3.full((n,), 0.0, 0.0, 0.0)
    front = jnp.zeros((n,), bool)
    mat = jnp.zeros((n,), jnp.int32)
    for o, (okind, oprim) in enumerate(zip(scene.s_obj_kind, scene.s_obj_prim)):
        if okind != OBJ_SPHERE:
            continue
        hit, t_w, pw, nw, fr = _sphere_candidate(
            scene, o, oprim, ro, rd, t_min, t_best
        )
        take = active & hit
        t_best = jnp.where(take, t_w, t_best)
        kind = jnp.where(take, PRIM_SPHERE, kind)
        obj_id = jnp.where(take, o, obj_id)
        prim_id = jnp.where(take, oprim, prim_id)
        point = vec.where(take, pw, point)
        normal = vec.where(take, nw, normal)
        front = jnp.where(take, fr, front)
        mat = jnp.where(take, scene.obj_mat[o], mat)
    return t_best, kind, obj_id, prim_id, point, normal, front, mat


def _intersect_ids_impl(scene, ro, rd, t_min, active, diff_payload):
    scene = lax.stop_gradient(scene)
    ro = lax.stop_gradient(ro)
    rd = lax.stop_gradient(rd)
    t_min = lax.stop_gradient(t_min)

    n = ro.x.shape[0]
    t_best = jnp.full((n,), BIG_T)
    kind = jnp.full((n,), PRIM_NONE, jnp.int32)
    obj_id = jnp.full((n,), -1, jnp.int32)
    prim_id = jnp.full((n,), -1, jnp.int32)

    t_best, kind, obj_id, prim_id, point, normal, front, mat = _sphere_pass(
        scene, ro, rd, t_min, active, t_best, kind, obj_id, prim_id
    )

    tri_vals = None
    if any(k == OBJ_MESH for k in scene.s_obj_kind):
        t_mesh, slot, ex = intersect_treelets(
            scene, ro, rd, t_min, t_best, active, diff_payload=diff_payload
        )
        take = slot >= 0
        t_best = jnp.where(take, t_mesh, t_best)
        kind = jnp.where(take, PRIM_TRIANGLE, kind)
        # winner metadata arrives IN-REGISTER from the sweep (extras):
        # unnormalized cross-normal + object id, selected per step by a
        # one-hot reduce over L.  The former (K*L, 8) slot_pack per-lane
        # row gather + its (N, 8)-minor consumers measured 33% of a
        # 1M-lane forward render (DESIGN.md round-2 profile).
        obj_w = jnp.maximum(ex["obj"].astype(jnp.int32), 0)
        obj_id = jnp.where(take, obj_w, obj_id)
        if diff_payload:
            # the diff path fetches the winner's world triangle by SLOT
            # (refine_hit tri_vals) — the slot_src per-lane gather that
            # used to populate a global-triangle prim_id measured 15% of
            # the whole fwd+bwd step (prof_grad.py r2) and is skipped;
            # prim_id keeps its sphere-pass value on triangle lanes.
            tri_vals = {"slot": slot}
            tri_vals.update({k: ex[k] for k in _PAYLOAD_KEYS})
        else:
            # triangle id: needed only by the (legacy) refine-by-prim-id
            # path — a standalone i32 gather forward renders DCE away
            safe = jnp.maximum(slot, 0)
            prim_id = jnp.where(take, scene.slot_src[safe], prim_id)
        # forward triangle hit record (reference semantics:
        # point = ray(t), outward = normalize(cross(e1, e2)), side flip —
        # src/lib/intersections.cuh:71-82)
        outward = Vec3(ex["nx"], ex["ny"], ex["nz"]).normalize()
        tri_front = rd.dot(outward) < 0.0
        tri_normal = vec.where(tri_front, outward, -outward)
        tri_point = ro + rd * t_mesh
        point = vec.where(take, tri_point, point)
        normal = vec.where(take, tri_normal, normal)
        front = jnp.where(take, tri_front, front)
        # material id from the tiny per-object table via one-hot matmul
        if scene.obj_mat.shape[0] <= _ONEHOT_MAX_ROWS:
            tri_mat = _rows_by_onehot(
                scene.obj_mat.astype(jnp.float32)[:, None], obj_w
            )[0].astype(jnp.int32)
        else:
            tri_mat = scene.obj_mat[obj_w]
        mat = jnp.where(take, tri_mat, mat)

    mask = kind != PRIM_NONE
    fwd = Hit(
        mask=mask,
        t=jnp.where(mask, t_best, BIG_T),
        point=point,
        normal=normal,
        front=front & mask,
        mat_id=mat,
    )
    ids = HitIds(kind=kind, obj_id=obj_id, prim_id=prim_id, t=t_best)
    return ids, fwd, tri_vals


def intersect_scene_ids(
    scene: SceneArrays,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    active: jnp.ndarray,
) -> tuple[HitIds, jnp.ndarray]:
    """Discrete closest-hit pass (production TPU path).

    Spheres: unrolled vectorized scan.  Meshes: packet-treelet sweep
    (accel/packets.py) over the world-baked global treelet table, seeded
    with the sphere-pass t so treelets behind a sphere hit are skipped.
    All inputs are stop_gradient'ed so internal while_loops never see
    tangents.

    Returns (ids, forward_hit): the forward Hit carries point / normal /
    front / material computed with a single per-lane gather (slot -> mat);
    the forward renderer consumes it directly, while the differentiable
    renderer uses only ``ids`` + ``refine_hit`` (XLA dead-code-eliminates
    whichever half is unused).
    """
    ids, fwd, _ = _intersect_ids_impl(scene, ro, rd, t_min, active, False)
    return ids, fwd


def intersect_scene_ids_diff(
    scene: SceneArrays,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    active: jnp.ndarray,
):
    """Production ids pass for the DIFFERENTIABLE renderer.

    Like ``intersect_scene_ids`` but the sweep additionally carries the
    winner's world-space (p0, e1, e2) out in-register (``tri_vals``),
    so ``refine_hit`` needs NO per-lane table gather and no (N, 9)-minor
    arrays — that machinery (slot_src gather, row gather, column slices,
    layout copies) measured ~45% of the whole fwd+bwd step on v5e
    (experiments/prof_grad.py).  tri_vals["slot"] indexes the slot-ordered
    differentiable table the backward pass scatters cotangents into.

    CONTRACT: the caller must trace against a scene whose treelet table
    was rebaked IN-TRACE from ``scene.positions`` (scene/bake.py), so the
    payload values are exactly the differentiable table's values;
    ids.prim_id is NOT populated for triangle lanes.
    """
    ids, _fwd, tri_vals = _intersect_ids_impl(scene, ro, rd, t_min, active, True)
    return ids, tri_vals


def intersect_scene_ids_bvh(
    scene: SceneArrays,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    active: jnp.ndarray,
) -> tuple[HitIds, jnp.ndarray]:
    """Per-ray stackless-BVH variant (accel/traverse.py) — the semantic
    reference for the packet path; plug into the integrator via
    ``intersect_fn``."""
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
        if okind != OBJ_MESH:
            continue
        root = jnp.int32(scene.s_mesh_root[oprim])
        tri_local = jnp.full((n,), -1, jnp.int32)
        t_new, tri_local, steps = traverse_mesh(
            scene, root, scene.obj_m[o], scene.obj_inv_m[o],
            ro_a, rd_a, t_min, t_best, tri_local, active,
        )
        take = tri_local >= 0
        t_best = jnp.where(take, t_new, t_best)
        kind = jnp.where(take, PRIM_TRIANGLE, kind)
        obj_id = jnp.where(take, o, obj_id)
        prim_id = jnp.where(take, tri_local, prim_id)

    # no forward hit: callers refine (this is the semantics-reference path)
    return HitIds(kind=kind, obj_id=obj_id, prim_id=prim_id, t=t_best), None


def occlusion_anyhit(
    scene: SceneArrays,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    t_limit: jnp.ndarray,
    active: jnp.ndarray,
    exclude_obj,
) -> jnp.ndarray:
    """Production shadow test: True where any geometry other than object
    ``exclude_obj`` (the sampled light — a static index, or a per-lane
    i32 array when each lane sampled its own light) hits within
    [t_min, t_limit].

    A shadow ray needs no winner bookkeeping: spheres run the same
    object-space candidate test with the light excluded (statically when
    the index is static — skipping its test entirely — else by a per-lane
    mask), and meshes run the any-hit packet sweep (accel/packets.py),
    which exits a packet the moment every live lane is occluded and culls
    treelets beyond each lane's light distance.  Equivalent to the
    closest-hit criterion "nearest hit is the light" except at exact-tie
    t values (measure zero).
    """
    scene = lax.stop_gradient(scene)
    ro = lax.stop_gradient(ro)
    rd = lax.stop_gradient(rd)
    t_min = lax.stop_gradient(t_min)
    t_limit = lax.stop_gradient(t_limit)
    static_ex = isinstance(exclude_obj, int)

    occ = jnp.zeros_like(active)
    for o, (okind, oprim) in enumerate(zip(scene.s_obj_kind, scene.s_obj_prim)):
        if okind != OBJ_SPHERE or (static_ex and o == exclude_obj):
            continue
        hit, t_w, *_ = _sphere_candidate(scene, o, oprim, ro, rd, t_min, t_limit)
        take = active & hit
        if not static_ex:
            take = take & (exclude_obj != o)
        occ = occ | take
    if any(k == OBJ_MESH for k in scene.s_obj_kind):
        occ = occ | intersect_treelets_anyhit(
            scene, ro, rd, t_min, t_limit, active & ~occ
        )
    return occ


# Per-lane dynamic gathers are the expensive primitive on TPU (~2.3 ms
# per 1M lanes each, DESIGN.md).  For per-OBJECT tables — a handful of
# rows — a one-hot matmul fetches all columns in one MXU pass, and its
# TRANSPOSE is again a matmul (the VJP of a gather is a scatter-add,
# which is far slower still).  Measured: refine_hit fwd 38 ms -> ~12 ms
# at 262k lanes.  Precision.HIGHEST keeps the fetch exact (the default
# TPU f32 matmul decomposes through bf16 and perturbs values).
_ONEHOT_MAX_ROWS = 512


def _rows_by_onehot(table2d: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(O, D) table, (N,) int idx -> (D, N) columns via one-hot matmul.

    The result keeps N on the MINOR axis (full 128-lane vectors); a
    (N, D)-shaped result with tiny D would waste 128-D lanes on every
    downstream slice (the core/vec.py layout rule)."""
    o = table2d.shape[0]
    onehot = (jnp.arange(o, dtype=idx.dtype)[:, None] == idx[None, :]).astype(
        table2d.dtype
    )  # (O, N)
    return lax.dot_general(
        table2d.T,
        onehot,
        (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=table2d.dtype,
    )  # (D, N)


class _LaneMat:
    """Per-lane 4x4 matrix as 16 (N,) component columns.

    Fetched with one one-hot matmul over the (O, 16) object-matrix table
    (see _rows_by_onehot) when the table is small, else 16 per-entry
    gathers from the transposed table — never `obj_m[idx]`, whose (N,4,4)
    result wastes 124 of 128 vector lanes on the minor axis.  Supports the
    `m[..., i, j]` protocol the vec transforms use."""

    def __init__(self, table: jnp.ndarray, idx: jnp.ndarray):
        flat = table.reshape(-1, 16)  # (O, 16)
        if flat.shape[0] <= _ONEHOT_MAX_ROWS:
            rows = _rows_by_onehot(flat, idx)  # (16, N)
            self._e = [rows[k] for k in range(16)]
        else:
            cols = flat.T  # (16, O)
            self._e = [cols[k][idx] for k in range(16)]

    def __getitem__(self, key):
        ell, i, j = key  # (..., i, j)
        assert ell is Ellipsis
        return self._e[i * 4 + j]


import jax as _jax
import numpy as _np


def slot_tri_table(scene: SceneArrays) -> jnp.ndarray:
    """Differentiable (K*L, 9) slot-ordered [p0, e1, e2] table — the
    scatter target of the diff refine path.  Loop-invariant: build it
    ONCE per render (trace_sample hoists it out of the bounce scan; its
    per-bounce rebuild + VJP measured ~35 ms of a 983 ms fwd+bwd step)."""
    from tpupt.scene.bake import world_slot_tris

    w0, w1, w2, _pad = world_slot_tris(scene)
    we1, we2 = w1 - w0, w2 - w0
    return jnp.stack(
        [w0.x, w0.y, w0.z, we1.x, we1.y, we1.z, we2.x, we2.y, we2.z],
        axis=1,
    )


@_jax.custom_vjp
def _fetch_tri_rows(wtable, slot, vals):
    """Winner triangle rows "fetched" from the differentiable slot table.

    Forward: returns ``vals`` — the (p0, e1, e2) components the packet
    sweep already selected IN-REGISTER (bit-equal to wtable[slot] rows
    because the table was rebaked in-trace with the same elementwise
    math), so no per-lane gather and no (N, 9)-minor array ever exists
    in the forward pass.  Backward: the exact VJP of a wtable[slot] row
    gather — ONE packed scatter-add of the stacked cotangents.  ``vals``
    and ``slot`` are sweep outputs (already under stop_gradient); their
    cotangents are zero/float0.
    """
    del wtable, slot
    return vals


def _fetch_tri_rows_fwd(wtable, slot, vals):
    return vals, (slot, wtable.shape)


def _fetch_tri_rows_bwd(res, cot):
    slot, shape = res
    cotm = jnp.stack(cot, axis=1)  # (N, 9) — backward only
    g = jnp.zeros(shape, cotm.dtype).at[jnp.maximum(slot, 0)].add(cotm)
    return (
        g,
        _np.zeros(slot.shape, dtype=_jax.dtypes.float0),
        tuple(jnp.zeros_like(c) for c in cot),
    )


_fetch_tri_rows.defvjp(_fetch_tri_rows_fwd, _fetch_tri_rows_bwd)


def refine_hit(
    scene: SceneArrays,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    ids: HitIds,
    tri_vals: dict | None = None,
) -> Hit:
    """Differentiable closed-form recomputation of the winning hit.

    Runs once per bounce; its handful of N-wide gathers (object matrices,
    sphere params, triangle vertices) are standalone and cheap, unlike
    per-traversal-step gathers.
    """
    n = ro.x.shape[0]
    mask = ids.kind != PRIM_NONE
    safe_obj = jnp.maximum(ids.obj_id, 0)
    safe_prim = jnp.maximum(ids.prim_id, 0)
    m = _LaneMat(scene.obj_m, safe_obj)
    inv_m = _LaneMat(scene.obj_inv_m, safe_obj)

    # --- sphere branch -------------------------------------------------
    s_prim = jnp.where(ids.kind == PRIM_SPHERE, safe_prim, 0)
    if scene.sphere_radius.shape[0] <= _ONEHOT_MAX_ROWS:
        sph = _rows_by_onehot(
            jnp.concatenate(
                [scene.sphere_center, scene.sphere_radius[:, None]], axis=1
            ),
            s_prim,
        )  # (4, N)
        center = Vec3(sph[0], sph[1], sph[2])
        radius = sph[3]
    else:
        center = Vec3(
            scene.sphere_center[:, 0][s_prim],
            scene.sphere_center[:, 1][s_prim],
            scene.sphere_center[:, 2][s_prim],
        )
        radius = scene.sphere_radius[s_prim]
    oo = vec.transform_point(inv_m, ro)
    od = vec.transform_vector(inv_m, rd).normalize()
    oc = oo - center
    a = od.dot(od)
    b = 2.0 * od.dot(oc)
    c = oc.dot(oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 1e-12))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    # the ids pass chose t1 when it was in-window; t1 <= t2 always, so
    # "t1 if t1 >= t_min else t2" reproduces the same root.
    t_obj = jnp.where(t1 >= t_min, t1, t2)
    sp_point_obj = oo + od * t_obj
    sp_point = vec.transform_point(m, sp_point_obj)
    sp_t = (sp_point - ro).length()
    sp_outward = (sp_point_obj - center) * (1.0 / radius)
    sp_front = od.dot(sp_outward) < 0.0
    sp_normal_obj = vec.where(sp_front, sp_outward, -sp_outward)
    # reference transform_normal leaves the normal un-normalized
    # (src/lib/transform.hpp:60-66); unit for the rigid transforms used.
    sp_normal = vec.transform_normal(inv_m, sp_normal_obj)

    # --- triangle branch ----------------------------------------------
    # Per-lane gathers SERIALIZE on TPU (~7.7 ns/lane each — measured
    # 23 ms for 12 of them at 262k lanes), so the per-lane
    # vertex-index + component gathers of the naive formulation dominate
    # the whole fwd+bwd step.  Instead: build a differentiable
    # per-instance WORLD-space triangle table in O(T) from
    # scene.positions (identical elementwise math, so identical values),
    # then fetch each lane's winner with ONE packed row gather.
    t_prim = jnp.where(ids.kind == PRIM_TRIANGLE, safe_prim, 0)
    mesh_objs = [o for o, k in enumerate(scene.s_obj_kind) if k == OBJ_MESH]
    if tri_vals is not None and mesh_objs:
        # Winner rows ride out of the sweep in-register (tri_vals); the
        # differentiable table they "came from" is the slot-ordered
        # world-triangle build (slot_tri_table — the caller rebaked the
        # traced table from positions with the same math, so the values
        # are identical).  _fetch_tri_rows gives them the gather's VJP:
        # one packed scatter into (K*L, 9), which flows to positions
        # through the slot build.  No per-lane forward gather, no
        # slot_src fetch, no (N, 9) arrays — that machinery measured
        # ~45% of fwd+bwd (experiments/prof_grad.py round 2).
        wtable = tri_vals.get("table")
        if wtable is None:
            wtable = slot_tri_table(scene)
        vals = tuple(tri_vals[k] for k in _PAYLOAD_KEYS)
        f0x, f0y, f0z, f1x, f1y, f1z, f2x, f2y, f2z = _fetch_tri_rows(
            wtable, tri_vals["slot"], vals
        )
        p0 = Vec3(f0x, f0y, f0z)
        e1 = Vec3(f1x, f1y, f1z)
        e2 = Vec3(f2x, f2y, f2z)
    elif mesh_objs:
        px, py, pz = scene.positions[:, 0], scene.positions[:, 1], scene.positions[:, 2]
        pool = Vec3(px, py, pz)
        blocks = []
        adj = [0] * len(scene.s_obj_kind)
        base = 0
        for o in mesh_objs:
            mid = scene.s_obj_prim[o]
            lo, hi = scene.s_mesh_tri_range[mid]
            wp = vec.transform_point(scene.obj_m[o], pool)  # (V,) world comps
            tri = scene.tri_idx[lo:hi]
            i0t, i1t, i2t = tri[:, 0], tri[:, 1], tri[:, 2]
            wp0 = Vec3(wp.x[i0t], wp.y[i0t], wp.z[i0t])
            wp1 = Vec3(wp.x[i1t], wp.y[i1t], wp.z[i1t])
            wp2 = Vec3(wp.x[i2t], wp.y[i2t], wp.z[i2t])
            we1, we2 = wp1 - wp0, wp2 - wp0
            blocks.append(jnp.stack(
                [wp0.x, wp0.y, wp0.z, we1.x, we1.y, we1.z, we2.x, we2.y, we2.z],
                axis=1,
            ))  # (Ti, 9)
            adj[o] = base - lo
            base += hi - lo
        wtab = jnp.concatenate(blocks, axis=0)  # (M, 9)
        # per-lane row index: instance base + global tri id (adjustment
        # fetched by one-hot matmul — exact for these small ints)
        adj_lane = _rows_by_onehot(
            jnp.asarray(adj, jnp.float32)[:, None], safe_obj
        )[0].astype(jnp.int32)
        rows = wtab[adj_lane + t_prim]  # (N, 9): the ONE per-lane gather
        p0 = Vec3(rows[:, 0], rows[:, 1], rows[:, 2])
        e1 = Vec3(rows[:, 3], rows[:, 4], rows[:, 5])
        e2 = Vec3(rows[:, 6], rows[:, 7], rows[:, 8])
    else:
        zf = ro.x * 0.0
        p0 = Vec3(zf, zf, zf)
        e1 = Vec3(zf, zf + 1.0, zf)
        e2 = Vec3(zf, zf, zf + 1.0)
    h = rd.cross(e2)
    det = e1.dot(h)
    f = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = ro - p0
    q = s.cross(e1)
    tr_t = f * e2.dot(q)
    tr_point = ro + rd * tr_t
    tr_outward = e1.cross(e2).normalize()
    tr_front = rd.dot(tr_outward) < 0.0
    tr_normal = vec.where(tr_front, tr_outward, -tr_outward)

    # --- select --------------------------------------------------------
    is_tri = ids.kind == PRIM_TRIANGLE
    point = vec.where(is_tri, tr_point, sp_point)
    normal = vec.where(is_tri, tr_normal, sp_normal)
    t = jnp.where(is_tri, tr_t, sp_t)
    front = jnp.where(is_tri, tr_front, sp_front)
    if scene.obj_mat.shape[0] <= _ONEHOT_MAX_ROWS:
        mat_id = _rows_by_onehot(
            scene.obj_mat.astype(jnp.float32)[:, None], safe_obj
        )[0].astype(jnp.int32)
    else:
        mat_id = scene.obj_mat[safe_obj]

    zero = Vec3.full((n,), 0.0, 0.0, 0.0)
    return Hit(
        mask=mask,
        t=jnp.where(mask, t, BIG_T),
        point=vec.where(mask, point, zero),
        normal=vec.where(mask, normal, zero),
        front=front & mask,
        mat_id=jnp.where(mask, mat_id, 0),
    )


def background_color(scene: SceneArrays, rd: Vec3) -> Vec3:
    """Sky gradient (reference get_background_color,
    src/lib/path_tracer.cu:29-34) with differentiable endpoints."""
    unit = rd.normalize()
    t = 0.5 * (unit.y + 1.0)
    down, up = scene.bg_down, scene.bg_up
    return Vec3(
        down[0] + t * (up[0] - down[0]),
        down[1] + t * (up[1] - down[1]),
        down[2] + t * (up[2] - down[2]),
    )
