"""Two-level (super-box) packet culling must produce the BIT-IDENTICAL
entry array as the dense cull — child boxes are contained in their super,
so an unexpanded super's children provably have no hits."""

import numpy as np
import jax.numpy as jnp

import tpupt.accel.packets as packets
from tpupt.core.camera import generate_rays, make_camera
from tpupt.scene.description import SceneDescription
from tpupt.scene.procedural import icosphere
from tpupt.accel.packets import PACKET, _entry_dense, _entry_twolevel


def _scene_big():
    # icosphere(3): 1280 tris x 2 instances -> K > _TWOLEVEL_MIN_K at L=32
    v, f = icosphere(3)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.eye(4), "m")
    import tpupt.core.math3d as m3

    d.add_mesh_object("mesh", np.asarray(m3.mat_translate([1.5, 0.3, -1])), "m")
    return d.build()


def _rows(scene, n=PACKET * 4):
    # slightly off-axis camera: pixel centers on a symmetric icosphere
    # produce exact-silhouette rays where the object-space per-ray walk
    # and the world-baked packet sweep legitimately differ at 1 ulp
    cam = make_camera(position=(0.13, 0.071, 3.03), vfov=1.35)
    w = h = int(np.sqrt(n))
    idx = jnp.arange(w * h, dtype=jnp.float32)
    ro, rd = generate_rays(cam, w, h, idx % w + 0.5, idx // w + 0.5)
    shp = (w * h // PACKET, PACKET)
    rows = dict(
        rox=ro.x.reshape(shp), roy=ro.y.reshape(shp), roz=ro.z.reshape(shp),
        rdx=rd.x.reshape(shp), rdy=rd.y.reshape(shp), rdz=rd.z.reshape(shp),
        tmin=jnp.full(shp, 1e-4),
    )
    rows["t"] = jnp.full(shp, 3.0e38)
    act = jnp.ones(shp, bool)
    return rows, act, ro, rd


def test_twolevel_entry_bit_identical_to_dense():
    scene = _scene_big()
    K = scene.tre_min.shape[0]
    assert K >= packets._TWOLEVEL_MIN_K, f"test scene too small (K={K})"
    rows, act, _, _ = _rows(scene)
    dense = np.asarray(_entry_dense(scene.tre_min, scene.tre_max, rows, act))
    two = np.asarray(_entry_twolevel(scene, rows, act))
    np.testing.assert_array_equal(two[:, :K], dense)
    assert (two[:, K:] >= 3.0e38).all()  # padded children never hit
    # sanity: a mixed population of hits and misses was exercised
    assert (dense < 3.0e38).any() and (dense >= 3.0e38).any()


def test_twolevel_render_matches_small_k_path():
    """Full intersect through the two-level path agrees with the per-ray
    BVH reference on the same big scene."""
    from tpupt.render.intersect import intersect_scene_ids, intersect_scene_ids_bvh

    scene = _scene_big()
    rows, act, ro, rd = _rows(scene)
    n = ro.x.shape[0]
    t_min = jnp.full((n,), 1e-4)
    active = jnp.ones((n,), bool)
    ids_p, _ = intersect_scene_ids(scene, ro, rd, t_min, active)
    ids_b, _ = intersect_scene_ids_bvh(scene, ro, rd, t_min, active)
    np.testing.assert_array_equal(np.asarray(ids_p.kind), np.asarray(ids_b.kind))
    np.testing.assert_array_equal(np.asarray(ids_p.prim_id), np.asarray(ids_b.prim_id))
    hit = np.asarray(ids_p.kind) >= 0
    assert hit.sum() > 100
    np.testing.assert_allclose(
        np.asarray(ids_p.t)[hit], np.asarray(ids_b.t)[hit], rtol=1e-6
    )
