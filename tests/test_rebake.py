"""Device-side treelet rebaking (scene/bake.py): after an optimizer moves
scene.positions, rebake_treelets must reproduce exactly what a fresh host
build would have baked — including the in-register winner-metadata
channels (cross-normals, object ids) packed into tre_tris."""

import numpy as np
import jax.numpy as jnp

import tpupt.core.math3d as m3
from tpupt.scene.bake import rebake_treelets
from tpupt.scene.description import SceneDescription
from tpupt.scene.procedural import icosphere


def _scene_desc(v, f):
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(0.6, 0.6, 0.6))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.asarray(m3.mat_translate([0.2, -0.1, -2])), "m")
    d.add_mesh_object(
        "mesh", np.asarray(m3.mat_translate([1.1, 0.4, -3])) @ np.asarray(m3.mat_scale(0.7)), "m"
    )
    return d


def test_rebake_identity_matches_build():
    v, f = icosphere(2)
    scene = _scene_desc(v, f).build()
    re = rebake_treelets(scene)
    np.testing.assert_allclose(
        np.asarray(re.tre_tris), np.asarray(scene.tre_tris), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(re.tre_min), np.asarray(scene.tre_min), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(re.tre_max), np.asarray(scene.tre_max), rtol=1e-6, atol=1e-6
    )


def test_rebake_after_move_matches_fresh_build_render():
    """Rebaking keeps the OLD treelet topology (only numbers refresh), so
    the tables differ from a fresh build — but the rendered image must
    agree: both trace the same perturbed geometry."""
    from tpupt.core.camera import make_camera
    from tpupt.render.integrator import render_image

    v, f = icosphere(2)
    scene = _scene_desc(v, f).build()

    rng = np.random.default_rng(0)
    v2 = (v + 0.03 * rng.standard_normal(v.shape)).astype(np.float32)

    moved = rebake_treelets(scene.replace(positions=jnp.asarray(v2)))
    fresh = _scene_desc(v2, f).build()
    cam = make_camera(vfov=np.pi / 2)
    buf_m, rays_m = render_image(moved, cam, 24, 24, 1, max_bounces=4)
    buf_f, rays_f = render_image(fresh, cam, 24, 24, 1, max_bounces=4)
    assert int(rays_m) == int(rays_f)
    np.testing.assert_allclose(
        np.asarray(buf_m.color), np.asarray(buf_f.color), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(buf_m.depth), np.asarray(buf_f.depth), rtol=1e-5, atol=1e-5
    )
