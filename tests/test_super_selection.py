"""Super-pq treelet selection (the K >= _SUPER_SEL_MIN_K sweep mode)
must be bit-identical to both the clear-based and the lexicographic
selection: the global (entry, index) consumption order factors exactly
through (argmin over per-super mins, argmin within the winning super),
so rung scheduling, every winner, and exact-entry ties must agree."""

import numpy as np
import jax.numpy as jnp

import tpupt.accel.packets as packets
from tpupt.core.vec import Vec3
from tpupt.scene.description import SceneDescription
from tests.test_lex_selection import _rays, _scene


def _run(scene, monkeypatch, lex_k, super_k):
    monkeypatch.setattr(packets, "_LEX_SEL_MIN_K", lex_k)
    monkeypatch.setattr(packets, "_SUPER_SEL_MIN_K", super_k)
    ro, rd, t_min, t_seed, active = _rays()
    t, slot, ex = packets.intersect_treelets(scene, ro, rd, t_min, t_seed, active)
    occ = packets.intersect_treelets_anyhit(
        scene, ro, rd, t_min, jnp.full(t_min.shape, 4.0), active
    )
    return t, slot, ex, occ


def test_super_selection_bit_identical(monkeypatch):
    scene = _scene()
    K = scene.tre_min.shape[0]
    assert K >= packets._TWOLEVEL_MIN_K
    kpad = -(-K // packets._SUPER) * packets._SUPER
    assert kpad % packets._SUPER == 0
    big = 1 << 30
    t_c, slot_c, ex_c, occ_c = _run(scene, monkeypatch, big, big)  # clear
    t_x, slot_x, ex_x, occ_x = _run(scene, monkeypatch, 1, big)  # lex
    t_s, slot_s, ex_s, occ_s = _run(scene, monkeypatch, 1, 1)  # super-pq
    assert (np.asarray(slot_c) >= 0).sum() > 150
    for t_o, slot_o, ex_o, occ_o in ((t_x, slot_x, ex_x, occ_x),
                                     (t_s, slot_s, ex_s, occ_s)):
        np.testing.assert_array_equal(np.asarray(t_o), np.asarray(t_c))
        np.testing.assert_array_equal(np.asarray(slot_o), np.asarray(slot_c))
        for k in ("nx", "ny", "nz", "obj"):
            np.testing.assert_array_equal(np.asarray(ex_o[k]), np.asarray(ex_c[k]))
        np.testing.assert_array_equal(np.asarray(occ_o), np.asarray(occ_c))


def test_super_selection_exact_ties(monkeypatch):
    """Shared-edge exact-t ties (duplicate coplanar instances) resolve
    identically under super-pq selection: equal-entry treelets in
    DIFFERENT supers are consumed lowest-index-first because the outer
    argmin keeps the leftmost super, and the later VISIT still wins the
    winner reduce (sequential semantics, observable via obj id)."""
    from tests.test_tie_breaking import _grid_mesh

    # big enough that the two-level cull engages (K >= _TWOLEVEL_MIN_K)
    # and kpad is a _SUPER multiple — the super-pq precondition
    v, f = _grid_mesh(32)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("grid", v, f)
    d.add_mesh_object("grid", np.eye(4), "m")
    d.add_mesh_object("grid", np.eye(4), "m")
    scene = d.build()
    K = scene.tre_min.shape[0]
    assert K >= packets._TWOLEVEL_MIN_K

    pts = np.asarray(
        [(i + 0.5, j + 0.5) for i in range(32) for j in range(32)], np.float32
    )
    n = pts.shape[0]
    ro = Vec3(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.full((n,), 5.0))
    rd = Vec3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.full((n,), -1.0))
    t_min = jnp.full((n,), 1e-4)
    t_seed = jnp.full((n,), 3.0e38)
    active = jnp.ones((n,), bool)

    outs = []
    big = 1 << 30
    for lex_k, super_k in ((big, big), (1, 1)):
        monkeypatch.setattr(packets, "_LEX_SEL_MIN_K", lex_k)
        monkeypatch.setattr(packets, "_SUPER_SEL_MIN_K", super_k)
        outs.append(
            packets.intersect_treelets(scene, ro, rd, t_min, t_seed, active)
        )
    (t_c, slot_c, ex_c), (t_s, slot_s, ex_s) = outs
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_c))
    np.testing.assert_array_equal(np.asarray(slot_s), np.asarray(slot_c))
    np.testing.assert_array_equal(
        np.asarray(ex_s["obj"]), np.asarray(ex_c["obj"])
    )
    # and the sequential invariant itself: the later instance wins
    np.testing.assert_array_equal(
        np.asarray(ex_s["obj"]), np.ones((n,), np.float32)
    )
