"""Emissive (diffuse_light) material extension: area lights beyond the
reference's background-only illumination, with an additive radiance
estimator that reduces exactly to the reference model when no emitters
exist."""

import numpy as np
import jax.numpy as jnp

import tpupt.core.math3d as m3
from tpupt.core.camera import make_camera
from tpupt.cpu_ref.renderer import render_image_ref
from tpupt.render.integrator import render_image, trace_sample
from tpupt.render.wavefront import trace_sample_wavefront
from tpupt.scene.description import SceneDescription


def _lamp_scene():
    d = SceneDescription(bg_down=(0, 0, 0), bg_up=(0, 0, 0))  # dark world
    d.add_material("floor", "lambertian", albedo=(0.7, 0.7, 0.7))
    d.add_material("lamp", "diffuse_light", emit=(10.0, 8.0, 6.0))
    d.add_sphere(100.0, np.asarray(m3.mat_translate([0, -100.5, -1])), "floor")
    d.add_sphere(0.3, np.asarray(m3.mat_translate([0, 0.7, -1.5])), "lamp")
    return d.build()


def test_lamp_illuminates_dark_scene():
    scene = _lamp_scene()
    cam = make_camera(vfov=np.pi / 2)
    color, _, _, _ = trace_sample(scene, cam, 48, 48, 0, max_bounces=4)
    img = np.asarray(color).reshape(48, 48, 3)
    # direct lamp hit shows the raw emission
    assert abs(img.max() - 10.0) < 1e-5
    # emission color ratio preserved
    peak = img.reshape(-1, 3)[img.sum(-1).argmax()]
    np.testing.assert_allclose(peak / peak[0], [1.0, 0.8, 0.6], atol=1e-5)
    # bounce light reaches the floor; the dark sky stays black
    assert img[40:, :, 0].mean() > 0.05
    assert img[0, :, :].max() == 0.0


def test_emissive_agrees_across_integrators():
    scene = _lamp_scene()
    cam = make_camera(vfov=np.pi / 2)
    c1, _, _, _ = trace_sample(scene, cam, 32, 32, 1, max_bounces=4)
    c2, _, _, _ = trace_sample_wavefront(scene, cam, 32, 32, 1, max_bounces=4)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    buf_ref, _ = render_image_ref(scene, cam, 32, 32, 1, max_bounces=4)
    buf, _ = render_image(scene, cam, 32, 32, 1, max_bounces=4)
    np.testing.assert_allclose(
        np.asarray(buf.color), np.asarray(buf_ref.color), atol=1e-4
    )


def test_nee_unbiased_and_lower_variance():
    """Next-event estimation agrees with brute path tracing in expectation
    and cuts variance dramatically (BASELINE north star: NEE)."""
    scene = _lamp_scene()
    assert scene.s_light_objs  # the lamp was detected as an NEE light
    cam = make_camera(vfov=np.pi / 2)
    W = H = 32
    spp = 48
    buf, _ = render_image(scene, cam, W, H, spp, max_bounces=12)
    img_nee = np.asarray(buf.color).reshape(H, W, 3)
    # disabling the light list turns NEE off -> brute path tracing
    buf2, _ = render_image(scene.replace(s_light_objs=()), cam, W, H, spp, max_bounces=12)
    img_off = np.asarray(buf2.color).reshape(H, W, 3)

    floor_nee = img_nee[26:, :, 0]
    floor_off = img_off[26:, :, 0]
    assert abs(floor_nee.mean() / floor_off.mean() - 1.0) < 0.1
    assert floor_nee.std() < 0.5 * floor_off.std()
    # direct lamp view identical either way
    np.testing.assert_allclose(img_nee.max(), img_off.max(), rtol=1e-6)


def test_emission_gradients():
    """The lamp's emission is a differentiable light parameter."""
    import jax

    scene = _lamp_scene()
    cam = make_camera(vfov=np.pi / 2)

    def loss(emission):
        s = scene.replace(materials=scene.materials.replace(emission=emission))
        buf, _ = render_image(s, cam, 24, 24, 1, max_bounces=3, differentiable=True)
        return jnp.mean(buf.color)

    e0 = scene.materials.emission
    g = jax.grad(loss)(e0)
    assert np.isfinite(np.asarray(g)).all()
    # brightness scales linearly with emission -> positive gradient, and
    # AD matches FD closely (fully linear path)
    eps = 1e-2
    fd = (loss(e0.at[1, 0].add(eps)) - loss(e0.at[1, 0].add(-eps))) / (2 * eps)
    assert float(g[1, 0]) > 0
    np.testing.assert_allclose(float(g[1, 0]), float(fd), rtol=1e-3)
