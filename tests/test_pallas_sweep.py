"""Pallas sweep kernel parity (interpreter mode here on CPU; the same
kernel compiles and runs on real TPU hardware — see DESIGN.md for the
measured comparison vs the XLA ladder sweep)."""

import numpy as np
import jax.numpy as jnp

from tpupt.accel.packets import intersect_treelets
from tpupt.accel.pallas_sweep import intersect_treelets_pallas
from tpupt.core.vec import Vec3
from tpupt.core.camera import generate_rays, make_camera
from tpupt.scene.description import SceneDescription
from tpupt.scene.procedural import icosphere


def test_pallas_sweep_matches_xla_sweep():
    v, f = icosphere(2)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.eye(4), "m")
    import tpupt.core.math3d as m3

    d.add_mesh_object("mesh", np.asarray(m3.mat_translate([1.5, 0, -1])), "m")
    scene = d.build()

    cam = make_camera(position=(0, 0, 3), vfov=np.pi / 2)
    w = h = 32
    n = w * h
    idx = jnp.arange(n, dtype=jnp.float32)
    ro, rd = generate_rays(cam, w, h, idx % w + 0.5, idx // w + 0.5)
    t_min = jnp.full((n,), 1e-4)
    t_seed = jnp.full((n,), 3.0e38)
    active = jnp.ones((n,), bool)

    t_x, slot_x, _ = intersect_treelets(scene, ro, rd, t_min, t_seed, active)
    t_p, slot_p = intersect_treelets_pallas(
        scene, ro, rd, t_min, t_seed, active, interpret=True
    )

    hit_x = np.asarray(slot_x) >= 0
    hit_p = np.asarray(slot_p) >= 0
    np.testing.assert_array_equal(hit_p, hit_x)
    assert hit_x.sum() > 100
    np.testing.assert_allclose(
        np.asarray(t_p)[hit_p], np.asarray(t_x)[hit_x], rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(slot_p)[hit_p], np.asarray(slot_x)[hit_x])
