"""Exact-t tie-breaking contract (VERDICT r3 #7; CLAUDE.md invariant).

Exact-t intersection ties are REAL: an unjittered ray through a shared
triangle edge hits both adjacent triangles at bit-identical t.  The
production winner reduce keeps the LEFT pair on ties, relying on XLA
evaluating the non-commutative combiner with lower-index partials as the
left operand — implementation-defined.  `exact_ties=True` (default under
TPUPT_DEBUG) adds an explicit positional tie term that is correct BY
CONSTRUCTION under any evaluation order.

Two adversarial constructions:

  1. A planar triangulated grid cut into multiple treelets, swept by an
     unjittered perpendicular ray grid through shared edges and vertices.
     Asserts exact_ties ON == OFF bit-for-bit on every channel.  If this
     ever fails on a new backend/version, the implementation-defined
     assumption broke: flip the default to ON and eat the ~4%.
     (Rays exactly on integer grid lines also sit on BVH node AABB
     planes, where axis-aligned slab math NaN-culls — a degeneracy
     shared with the reference's slab test, so hit-rate assertions use
     only the diagonal-edge-midpoint rays, which lie strictly inside
     every enclosing AABB.)

  2. TWO IDENTICAL coplanar instances of the grid (obj 0 and obj 1):
     every triangle hit ties bit-exactly across instances — ties across
     treelets fetched in the same R-step, with an OBSERVABLE winner (the
     object id).  Sequential later-visit-wins semantics pick obj 1 (its
     treelets are visited after obj 0's at equal entry), and the per-ray
     path and the brute-force oracle both overwrite on `<=` in object
     order, so ALL THREE paths must report obj 1 everywhere.
"""

import numpy as np
import jax.numpy as jnp

from tpupt.accel.packets import intersect_treelets
from tpupt.core.vec import Vec3
from tpupt.scene.description import SceneDescription


def _grid_mesh(n=12, z=0.0):
    """Triangulated (n x n)-quad planar grid at height z, vertices on
    integer coordinates, consistent winding (+z normals)."""
    xs, ys = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
    pos = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, z)], axis=1
    ).astype(np.float32)
    vid = lambda i, j: i * (n + 1) + j
    tris = []
    for i in range(n):
        for j in range(n):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i, j + 1), vid(i + 1, j + 1)
            tris.append([a, c, b])
            tris.append([b, c, d])
    return pos, np.asarray(tris, np.int32)


def _scene(n=12, instances=1):
    v, f = _grid_mesh(n)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("grid", v, f)
    for _ in range(instances):
        d.add_mesh_object("grid", np.eye(4), "m")
    return d.build()


def _down_rays(pts):
    pts = np.asarray(pts, np.float32)
    m = pts.shape[0]
    ro = Vec3(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.full((m,), 5.0))
    rd = Vec3(jnp.zeros((m,)), jnp.zeros((m,)), jnp.full((m,), -1.0))
    return ro, rd, m


def _edge_points(n=12):
    """Every 0.5-step point strictly inside the grid: vertices, axis-edge
    midpoints and diagonal-edge midpoints."""
    return [
        (i, j)
        for i in np.arange(0.5, n, 0.5)
        for j in np.arange(0.5, n, 0.5)
    ]


def _diag_points(n=12):
    """Diagonal-edge midpoints only: exact shared-edge ties, strictly
    inside every enclosing AABB (no axis-plane slab degeneracy)."""
    return [(i + 0.5, j + 0.5) for i in range(n) for j in range(n)]


def test_exact_tie_term_on_off_bit_identical():
    scene = _scene()
    K = scene.tre_min.shape[0]
    assert K >= 4, f"grid must span multiple treelets (K={K})"
    ro, rd, m = _down_rays(_edge_points())
    t_min = jnp.full((m,), 1e-4)
    t_seed = jnp.full((m,), 3.0e38)
    active = jnp.ones((m,), bool)

    t_off, slot_off, ex_off = intersect_treelets(
        scene, ro, rd, t_min, t_seed, active, exact_ties=False
    )
    t_on, slot_on, ex_on = intersect_treelets(
        scene, ro, rd, t_min, t_seed, active, exact_ties=True
    )
    np.testing.assert_array_equal(np.asarray(t_on), np.asarray(t_off))
    np.testing.assert_array_equal(np.asarray(slot_on), np.asarray(slot_off))
    for k in ("nx", "ny", "nz", "obj"):
        np.testing.assert_array_equal(np.asarray(ex_on[k]), np.asarray(ex_off[k]))
    # hits exist and every hit t is exactly the plane distance
    hit = np.asarray(slot_off) >= 0
    assert hit.sum() > m // 2
    np.testing.assert_array_equal(np.asarray(t_off)[hit], np.float32(5.0))


def test_cross_treelet_ties_sequential_semantics_all_paths():
    """Duplicate coplanar instances: every hit is an exact cross-treelet
    (cross-object) tie.  Later-visit-wins must pick obj 1 on the packet
    path — with the explicit term ON and OFF — and the per-ray scene walk
    and the oracle agree (both overwrite on `<=` in object order)."""
    from tpupt.cpu_ref.renderer import intersect_scene_ids_brute
    from tpupt.render.intersect import intersect_scene_ids, intersect_scene_ids_bvh

    scene = _scene(instances=2)
    pts = _diag_points() + [
        (i + dx, j + dy)
        for i in range(0, 12, 2)
        for j in range(0, 12, 2)
        for dx, dy in ((0.25, 0.25), (0.75, 0.75))  # strictly inside a tri
    ]
    ro, rd, m = _down_rays(pts)
    t_min = jnp.full((m,), 1e-4)
    t_seed = jnp.full((m,), 3.0e38)
    active = jnp.ones((m,), bool)
    exact5 = np.full((m,), 5.0, np.float32)

    for flag in (False, True):
        t_p, slot_p, ex = intersect_treelets(
            scene, ro, rd, t_min, t_seed, active, exact_ties=flag
        )
        assert (np.asarray(slot_p) >= 0).all()
        np.testing.assert_array_equal(np.asarray(t_p), exact5)
        np.testing.assert_array_equal(
            np.asarray(ex["obj"]), np.ones((m,), np.float32),
            err_msg=f"later-visited instance must win ties (exact_ties={flag})",
        )

    ids_s, _ = intersect_scene_ids(scene, ro, rd, t_min, active)
    ids_b, _ = intersect_scene_ids_bvh(scene, ro, rd, t_min, active)
    ids_o, _ = intersect_scene_ids_brute(scene, ro, rd, t_min, active)
    for name, ids in (("packet", ids_s), ("per-ray", ids_b), ("oracle", ids_o)):
        np.testing.assert_array_equal(
            np.asarray(ids.t), exact5, err_msg=f"{name} t"
        )
        np.testing.assert_array_equal(
            np.asarray(ids.obj_id), np.ones((m,), np.int32),
            err_msg=f"{name} must resolve the exact tie to the later object",
        )
