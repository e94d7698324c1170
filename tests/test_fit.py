"""Inverse-rendering tests (BASELINE config 4 capability): recover scene
parameters from a target image by gradient descent through the renderer
(and optionally the denoiser)."""

import numpy as np
import jax.numpy as jnp

from tpupt.diff.fit import fit_scene
from tpupt.render.integrator import render_image

W = H = 24
SPP = 2
MB = 3


def _target(scene, camera):
    buf, _ = render_image(scene, camera, W, H, SPP, max_bounces=MB, differentiable=True)
    return buf.color


def test_fit_recovers_albedo(sphere_scene, camera):
    target = _target(sphere_scene, camera)
    true_albedo = np.asarray(sphere_scene.materials.albedo)

    # perturb the sphere albedos and fit them back
    wrong = sphere_scene.replace(
        materials=sphere_scene.materials.replace(
            albedo=jnp.asarray([[0.3, 0.3, 0.3], [0.6, 0.6, 0.6]])
        )
    )
    fitted, losses = fit_scene(
        wrong, camera, target, W, H,
        steps=60, learning_rate=0.05, spp=SPP, max_bounces=MB,
    )
    assert losses[-1] < 0.05 * losses[0]
    got = np.asarray(fitted.materials.albedo)
    np.testing.assert_allclose(got, true_albedo, atol=0.08)


def test_fit_background_through_denoiser(sphere_scene, camera):
    """Gradients flow through the a-trous filter (config 4)."""
    buf, _ = render_image(sphere_scene, camera, W, H, 1, max_bounces=MB, differentiable=True)
    target = buf.color

    wrong = sphere_scene.replace(
        bg_down=jnp.array([0.9, 0.2, 0.2]), bg_up=jnp.array([0.2, 0.9, 0.2])
    )
    fitted, losses = fit_scene(
        wrong, camera, target, W, H,
        steps=50, learning_rate=0.05, spp=1, max_bounces=MB, denoise=True,
        param_filter=("bg_down", "bg_up"),
    )
    assert losses[-1] < 0.2 * losses[0]
    # fitted background heads toward the true sky gradient
    assert abs(float(fitted.bg_up[1]) - 1.0) < 0.25
    # frozen groups untouched
    np.testing.assert_array_equal(
        np.asarray(fitted.materials.albedo), np.asarray(sphere_scene.materials.albedo)
    )


def test_fit_material_filter_freezes_physical_leaves(full_scene, camera):
    """material_filter restricts the materials group: fuzz/ior must come
    back untouched and the fit must stay finite on a scene WITH
    dielectric + metal materials (unconstrained Adam steps on ior can
    cross -1 where Schlick divides by zero — the round-5 showcase NaN)."""
    target = _target(full_scene, camera)
    wrong = full_scene.replace(
        materials=full_scene.materials.replace(
            albedo=jnp.full_like(full_scene.materials.albedo, 0.5)
        )
    )
    fitted, losses = fit_scene(
        wrong, camera, target, W, H,
        steps=25, learning_rate=0.05, spp=SPP, max_bounces=MB,
        material_filter=("albedo", "emission"),
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(fitted.materials.fuzz), np.asarray(full_scene.materials.fuzz)
    )
    np.testing.assert_array_equal(
        np.asarray(fitted.materials.ior), np.asarray(full_scene.materials.ior)
    )
