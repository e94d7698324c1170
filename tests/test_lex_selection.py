"""Lexicographic treelet selection (big-K sweep mode) must be
bit-identical to the clear-based selection: treelets are consumed in
strictly increasing (entry, index) order either way, and the liveness
(remaining-min) values match exactly, so rung scheduling and every
winner — including exact-t ties — must agree."""

import numpy as np
import jax.numpy as jnp

import tpupt.accel.packets as packets
from tpupt.core.camera import generate_rays, make_camera
from tpupt.core.vec import Vec3
from tpupt.scene.description import SceneDescription
from tpupt.scene.procedural import icosphere
import tpupt.core.math3d as m3


def _scene():
    v, f = icosphere(3)  # 1280 tris x 2 instances: K > _TWOLEVEL_MIN_K
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.eye(4), "m")
    d.add_mesh_object("mesh", np.asarray(m3.mat_translate([1.5, 0.3, -1])), "m")
    return d.build()


def _rays(n=packets.PACKET * 4):
    cam = make_camera(position=(0.13, 0.071, 3.03), vfov=1.35)
    w = h = int(np.sqrt(n))
    idx = jnp.arange(w * h, dtype=jnp.float32)
    ro, rd = generate_rays(cam, w, h, idx % w + 0.5, idx // w + 0.5)
    m = w * h
    return ro, rd, jnp.full((m,), 1e-4), jnp.full((m,), 3.0e38), jnp.ones((m,), bool)


def _run(scene, monkeypatch, min_k):
    monkeypatch.setattr(packets, "_LEX_SEL_MIN_K", min_k)
    ro, rd, t_min, t_seed, active = _rays()
    t, slot, ex = packets.intersect_treelets(scene, ro, rd, t_min, t_seed, active)
    occ = packets.intersect_treelets_anyhit(
        scene, ro, rd, t_min, jnp.full(t_min.shape, 4.0), active
    )
    return t, slot, ex, occ


def test_lex_selection_bit_identical_to_clear(monkeypatch):
    scene = _scene()
    K = scene.tre_min.shape[0]
    assert K >= packets._TWOLEVEL_MIN_K
    t_c, slot_c, ex_c, occ_c = _run(scene, monkeypatch, 1 << 30)  # clear mode
    t_l, slot_l, ex_l, occ_l = _run(scene, monkeypatch, 1)  # lex mode
    assert (np.asarray(slot_c) >= 0).sum() > 150
    np.testing.assert_array_equal(np.asarray(t_l), np.asarray(t_c))
    np.testing.assert_array_equal(np.asarray(slot_l), np.asarray(slot_c))
    for k in ("nx", "ny", "nz", "obj"):
        np.testing.assert_array_equal(np.asarray(ex_l[k]), np.asarray(ex_c[k]))
    np.testing.assert_array_equal(np.asarray(occ_l), np.asarray(occ_c))


def test_lex_selection_exact_ties(monkeypatch):
    """Shared-edge exact-t ties (duplicate coplanar instances) resolve
    identically under lex selection — the sequential later-visit-wins
    invariant does not depend on the selection mechanism."""
    from tests.test_tie_breaking import _grid_mesh

    v, f = _grid_mesh(12)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("grid", v, f)
    d.add_mesh_object("grid", np.eye(4), "m")
    d.add_mesh_object("grid", np.eye(4), "m")
    scene = d.build()

    pts = np.asarray(
        [(i + 0.5, j + 0.5) for i in range(12) for j in range(12)], np.float32
    )
    n = pts.shape[0]
    ro = Vec3(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.full((n,), 5.0))
    rd = Vec3(jnp.zeros((n,)), jnp.zeros((n,)), jnp.full((n,), -1.0))
    t_min = jnp.full((n,), 1e-4)
    t_seed = jnp.full((n,), 3.0e38)
    active = jnp.ones((n,), bool)

    outs = []
    for min_k in (1 << 30, 1):
        monkeypatch.setattr(packets, "_LEX_SEL_MIN_K", min_k)
        outs.append(
            packets.intersect_treelets(scene, ro, rd, t_min, t_seed, active)
        )
    (t_c, slot_c, ex_c), (t_l, slot_l, ex_l) = outs
    np.testing.assert_array_equal(np.asarray(t_l), np.asarray(t_c))
    np.testing.assert_array_equal(np.asarray(slot_l), np.asarray(slot_c))
    np.testing.assert_array_equal(
        np.asarray(ex_l["obj"]), np.asarray(ex_c["obj"])
    )
    # and the sequential invariant itself: the later instance wins
    np.testing.assert_array_equal(
        np.asarray(ex_l["obj"]), np.ones((n,), np.float32)
    )


def test_sweep_ladder_compaction_exact_under_jit(monkeypatch):
    """Round-5 regression companion to
    test_chained.test_chain_ladder_scheduler_exact_under_jit: the SWEEP
    ladder's rung compaction (packets._run_ladder) arbitrated bit-exact
    against a single flat rung UNDER JIT at multi-compaction scale (the
    chain ladder's x.at[:sz].set(x[:sz][order]) self-aliasing gather
    corrupted permutations only under jit, so eager tests missed it)."""
    import jax

    scene = _scene()
    cam = make_camera(position=(0.13, 0.071, 3.03), vfov=1.35)
    w = h = 181  # 32761 rays -> 129 packets: rungs 129/64/32, 2 compactions
    idx = jnp.arange(w * h, dtype=jnp.float32)
    ro, rd = generate_rays(cam, w, h, idx % w + 0.5, idx // w + 0.5)
    m = w * h
    args = (ro, rd, jnp.full((m,), 1e-4), jnp.full((m,), 3.0e38),
            jnp.ones((m,), bool))

    outs = []
    for min_rung in (1 << 30, 32):  # flat single rung vs production ladder
        monkeypatch.setattr(packets, "_LADDER_MIN", min_rung)
        t, slot, ex = jax.jit(
            lambda *a: packets.intersect_treelets(scene, *a)
        )(*args)
        outs.append((np.asarray(t), np.asarray(slot),
                     {k: np.asarray(v) for k, v in ex.items()}))
    (t_f, s_f, e_f), (t_l, s_l, e_l) = outs
    assert (s_f >= 0).sum() > 1000
    np.testing.assert_array_equal(t_l, t_f)
    np.testing.assert_array_equal(s_l, s_f)
    for k in ("nx", "ny", "nz", "obj"):
        np.testing.assert_array_equal(e_l[k], e_f[k])
