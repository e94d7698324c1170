"""Gradient correctness (BASELINE: pixel-grad allclose, finite-difference
checks at ~1e-4; grads w.r.t. materials, lights (background), and
geometry).  Discrete visibility is treated as locally constant, so FD
checks use perturbations that do not flip any hit decision."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core.camera import make_camera
from tpupt.denoise.atrous import atrous_denoise
from tpupt.render.integrator import render_image

W = H = 24


def _loss(scene, cam, weights=None, **kw):
    buf, _ = render_image(scene, cam, W, H, 1, max_bounces=4, differentiable=True, **kw)
    if weights is None:
        return jnp.mean(buf.color)
    return jnp.sum(buf.color * weights)


def test_albedo_grad_matches_fd(sphere_scene, camera):
    def loss_albedo(a):
        s = sphere_scene.replace(materials=sphere_scene.materials.replace(albedo=a))
        return _loss(s, camera)

    a0 = sphere_scene.materials.albedo
    g = jax.grad(loss_albedo)(a0)
    eps = 1e-3
    for idx in [(0, 0), (1, 2)]:
        lp = loss_albedo(a0.at[idx].add(eps))
        lm = loss_albedo(a0.at[idx].add(-eps))
        fd = (lp - lm) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 2e-3 * max(1.0, abs(float(fd)))


def test_background_grad_matches_fd(sphere_scene, camera):
    for leaf in ("bg_down", "bg_up"):
        def loss_bg(b):
            return _loss(sphere_scene.replace(**{leaf: b}), camera)

        b0 = getattr(sphere_scene, leaf)
        g = jax.grad(loss_bg)(b0)
        eps = 1e-3
        lp = loss_bg(b0.at[1].add(eps))
        lm = loss_bg(b0.at[1].add(-eps))
        fd = float((lp - lm) / (2 * eps))
        assert abs(float(g[1]) - fd) < 2e-3 * max(1.0, abs(fd))


def test_vertex_position_grad_matches_fd(full_scene, camera):
    """Vertex-position gradients (BASELINE north star: grads w.r.t.
    vertex positions) against central finite differences.

    A color loss over the whole frame is FD-hostile: its true derivative
    is dominated by discrete silhouette flips, which the estimator
    intentionally treats as locally constant (stop_gradient on hit ids).
    The smooth, checkable quantity is an INTERIOR hit's depth — it moves
    continuously with the winning triangle's vertices and no id flips."""
    # center pixel looks straight at the icosphere mesh in full_scene
    center = (H // 2) * W + W // 2

    def depth_at_center(p):
        buf, _ = render_image(
            full_scene.replace(positions=p), camera, W, H, 1,
            max_bounces=2, differentiable=True,
        )
        return buf.depth[center]

    p0 = full_scene.positions
    g = jax.grad(depth_at_center)(p0)
    ga = np.abs(np.asarray(g))
    assert ga.max() > 0  # the center pixel does hit the mesh
    idx = np.unravel_index(np.argmax(ga), ga.shape)  # a hit-tri vertex
    eps = 3e-4
    lp = depth_at_center(p0.at[idx].add(eps))
    lm = depth_at_center(p0.at[idx].add(-eps))
    fd = float((lp - lm) / (2 * eps))
    assert abs(float(g[idx]) - fd) < 5e-2 * max(0.1, abs(fd))


def test_geometry_grads_finite(full_scene, camera):
    g = jax.grad(lambda s: _loss(s, camera), allow_int=True)(full_scene)
    for leaf in (g.sphere_center, g.sphere_radius, g.positions,
                 g.materials.albedo, g.materials.fuzz, g.materials.ior,
                 g.bg_down, g.bg_up):
        assert np.isfinite(np.asarray(leaf)).all()
    # vertex gradients actually flow (mesh is visible in the frame)
    assert np.abs(np.asarray(g.positions)).max() > 0


def test_sphere_radius_grad_through_depth(camera):
    """Continuous geometric gradient: growing the sphere moves its front
    surface toward the camera, so d(center-pixel depth)/d(radius) = -1
    exactly (hit point = center_z + radius toward a z-axis camera).
    Silhouette (visibility) gradients are deliberately not modeled —
    discrete ids are stop-gradient (render/intersect.py docstring)."""
    import tpupt.core.math3d as m3
    from tpupt.scene.description import SceneDescription

    d = SceneDescription()
    d.add_material("dark", "lambertian", albedo=(0.05, 0.05, 0.05))
    d.add_sphere(0.5, np.asarray(m3.mat_translate([0, 0, -2.0])), "dark")
    scene = d.build()
    center_pixel = (H // 2) * W + W // 2

    def center_depth(r):
        buf, _ = render_image(
            scene.replace(sphere_radius=r), camera, W, H, 1,
            max_bounces=2, differentiable=True,
        )
        return buf.depth[center_pixel]

    g = jax.grad(center_depth)(scene.sphere_radius)
    eps = 1e-3
    fd = (
        center_depth(scene.sphere_radius.at[0].add(eps))
        - center_depth(scene.sphere_radius.at[0].add(-eps))
    ) / (2 * eps)
    # ~-1 (the jittered sample ray is slightly off-axis), and AD == FD
    assert -1.5 < float(g[0]) < -0.8
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-2)


def test_grads_through_denoiser(sphere_scene, camera):
    """BASELINE config 4: 1-spp render + differentiable denoise, grads
    w.r.t. materials flow through the filter."""

    def loss(albedo):
        s = sphere_scene.replace(materials=sphere_scene.materials.replace(albedo=albedo))
        buf, _ = render_image(s, camera, W, H, 1, max_bounces=4, differentiable=True)
        img = atrous_denoise(
            buf.color.reshape(H, W, 3),
            buf.normal.reshape(H, W, 3),
            buf.depth.reshape(H, W),
            camera,
            filter_size=4,
        )
        return jnp.mean(img)

    a0 = sphere_scene.materials.albedo
    g = jax.grad(loss)(a0)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    lp = loss(a0.at[1, 0].add(eps))
    lm = loss(a0.at[1, 0].add(-eps))
    fd = float((lp - lm) / (2 * eps))
    assert abs(float(g[1, 0]) - fd) < 2e-3 * max(1.0, abs(fd))


def test_pixel_gradients_allclose_fd(sphere_scene, camera):
    """Per-pixel gradient spot check: d(pixel)/d(albedo) vs central FD."""
    weights = jnp.zeros((W * H, 3)).at[(H // 2) * W + W // 2].set(1.0)

    def loss(a):
        s = sphere_scene.replace(materials=sphere_scene.materials.replace(albedo=a))
        return _loss(s, camera, weights=weights)

    a0 = sphere_scene.materials.albedo
    g = jax.grad(loss)(a0)
    eps = 1e-3
    lp = loss(a0.at[1, 1].add(eps))
    lm = loss(a0.at[1, 1].add(-eps))
    fd = float((lp - lm) / (2 * eps))
    assert abs(float(g[1, 1]) - fd) <= 1e-4 + 1e-2 * abs(fd)
