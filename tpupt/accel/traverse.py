"""Stackless lockstep BVH traversal (device side).

The reference traverses with a per-thread StaticStack<unsigned,24> under
SIMT (src/lib/path_tracer.cu:36-76).  TPU vector lanes run in lockstep with
no per-lane control flow, so the stack becomes the enemy: per-lane stacks in
HBM would be 24 extra ints of state and a scatter/gather per step.

Instead the BVH is flattened depth-first with *skip links* (accel/bvh.py),
making traversal a single int32 of state per ray:

    hit inner node  -> next = node + 1          (first child, pre-order)
    miss / leaf     -> next = skip[node]        (-1 terminates)

One `lax.while_loop` steps every ray in the batch until all lanes have
terminated.  Each step is pure dense vector math plus 4 row gathers
(node AABB, skip link, triangle vertices) which XLA maps onto the VPU.

The AABB test here is *t-bounded* (against [t_min, t_best]) using the
unnormalized object-space direction so object t == world t — strictly more
culling than the reference's unbounded slab test (src/lib/intersections.cuh:
87-103, which even accepts boxes fully behind the ray); this only prunes
subtrees that cannot produce a closer hit, so results are identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpupt.core import math3d

MOLLER_EPS = 1e-7  # reference EPSILON, src/lib/intersections.cuh:54


def moller_trumbore(ro, rd, p0, p1, p2, t_min, t_max):
    """Batched Möller–Trumbore (reference ray_triangle_intersection_test,
    src/lib/intersections.cuh:49-85).  Returns (valid, t)."""
    e1 = p1 - p0
    e2 = p2 - p0
    h = math3d.cross(rd, e2)
    a = math3d.dot(e1, h)
    parallel = jnp.abs(a) < MOLLER_EPS
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = ro - p0
    u = f * math3d.dot(s, h)
    q = math3d.cross(s, e1)
    v = f * math3d.dot(rd, q)
    t = f * math3d.dot(e2, q)
    valid = (
        ~parallel
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
    )
    return valid, t


def _slab_test(oo, inv_d, bmin, bmax, t_min, t_max):
    """Bounded slab test in object space (world-t parametrization)."""
    t0 = (bmin - oo) * inv_d
    t1 = (bmax - oo) * inv_d
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (far >= near) & (far >= t_min) & (near <= t_max)


def traverse_mesh(
    scene,
    root: jnp.ndarray,
    m: jnp.ndarray,
    inv_m: jnp.ndarray,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min: jnp.ndarray,
    t_best: jnp.ndarray,
    tri_best: jnp.ndarray,
    active: jnp.ndarray,
    max_steps: int | None = None,
):
    """Closest-hit traversal of one mesh instance for a flat ray batch.

    Semantics follow the reference ray_mesh_intersection_test
    (src/lib/path_tracer.cu:36-76): the AABB test runs in object space, the
    triangle test transforms the three vertices to world space and
    intersects with the *world* ray, shrinking t on every accepted hit.
    Equal-t hits overwrite (<=), matching the reference's `t > t_max`
    rejection.

    Args:
      root: () i32 absolute root node index for this mesh.
      t_best/tri_best: running closest hit (world t, global triangle id or -1).
      active: (N,) bool — lanes that should traverse at all.
    Returns updated (t_best, tri_best, steps) where steps is the number of
    while-loop iterations executed (for Mrays accounting / perf debugging).
    """
    oo, od = math3d.inverse_transform_ray(inv_m[None], ro, rd, normalize_dir=False)
    inv_d = 1.0 / od  # ±inf on zero components is fine for the slab test

    node0 = jnp.where(active, root, jnp.int32(-1))

    def cond(state):
        node, _, _, steps = state
        alive = jnp.any(node >= 0)
        if max_steps is not None:
            alive &= steps < max_steps
        return alive

    def body(state):
        node, t_b, tri_b, steps = state
        act = node >= 0
        safe = jnp.maximum(node, 0)

        nmin = scene.node_min[safe]
        nmax = scene.node_max[safe]
        tri = scene.node_tri[safe]
        skip = scene.node_skip[safe]
        is_leaf = tri >= 0

        # --- leaf: world-space triangle test ---------------------------
        safe_tri = jnp.maximum(tri, 0)
        vidx = scene.tri_idx[safe_tri]  # (N, 3) i32
        verts = scene.positions[vidx]  # (N, 3, 3)
        wverts = math3d.transform_point(m[None, None], verts)
        ok, t = moller_trumbore(
            ro, rd, wverts[:, 0], wverts[:, 1], wverts[:, 2], t_min, t_b
        )
        take = act & is_leaf & ok
        t_b = jnp.where(take, t, t_b)
        tri_b = jnp.where(take, tri, tri_b)

        # --- inner: bounded slab test in object space ------------------
        box_hit = _slab_test(oo, inv_d, nmin, nmax, t_min, t_b)

        nxt = jnp.where(is_leaf, skip, jnp.where(box_hit, node + 1, skip))
        node = jnp.where(act, nxt, jnp.int32(-1))
        return node, t_b, tri_b, steps + 1

    node, t_best, tri_best, steps = jax.lax.while_loop(
        cond, body, (node0, t_best, tri_best, jnp.int32(0))
    )
    return t_best, tri_best, steps
