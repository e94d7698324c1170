"""Sharding tests on the 8-device virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from tpupt.diff.params import extract_params, with_params
from tpupt.dist.sharding import (
    make_tile_mesh,
    render_image_sharded,
    render_loss_and_grads_sharded,
)
from tpupt.render.integrator import render_image

W, H = 32, 32


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return make_tile_mesh(8)


def test_sharded_render_bit_identical(full_scene, camera, mesh):
    """Tile-sharded render == single-device render, bit for bit (global
    pixel-index RNG makes this exact, not just statistical).  Pinned to the
    unchained integrator on BOTH sides: bit-equality requires structurally
    identical programs (XLA's FMA-contraction choices differ between
    program shapes and amplify chaotically through bounce recursion —
    tests/test_chained.py docstring)."""
    buf_s, rays_s = render_image_sharded(
        full_scene, camera, W, H, 2, mesh, max_bounces=5, chain_samples=False
    )
    buf_1, rays_1 = render_image(
        full_scene, camera, W, H, 2, max_bounces=5, chain_samples=False
    )
    np.testing.assert_array_equal(np.asarray(buf_s.color), np.asarray(buf_1.color))
    np.testing.assert_array_equal(np.asarray(buf_s.depth), np.asarray(buf_1.depth))
    assert int(rays_s) == int(rays_1)


def test_sharded_render_chained_matches(full_scene, camera, mesh):
    """The chained (production) integrator under sharding: identical ray
    counts (exact integer — proves the per-lane sample/bounce evolution
    matches) and ulp-amplified-tolerance pixel equality."""
    buf_s, rays_s = render_image_sharded(
        full_scene, camera, W, H, 2, mesh, max_bounces=5
    )
    buf_1, rays_1 = render_image(full_scene, camera, W, H, 2, max_bounces=5)
    np.testing.assert_allclose(
        np.asarray(buf_s.color), np.asarray(buf_1.color), rtol=1e-4, atol=1e-5
    )
    assert int(rays_s) == int(rays_1)


def test_sharded_output_actually_sharded(full_scene, camera, mesh):
    buf_s, _ = render_image_sharded(full_scene, camera, W, H, 1, mesh, max_bounces=3)
    shard_rows = {s.index[0] for s in buf_s.color.addressable_shards}
    assert len(shard_rows) == 8


def test_sharded_grads_match_single_device(sphere_scene, camera, mesh):
    target = jnp.zeros((W * H, 3))
    loss_s, grads_s = render_loss_and_grads_sharded(
        sphere_scene, camera, target, W, H, 1, mesh, max_bounces=4
    )

    def loss_fn(params):
        scene = with_params(sphere_scene, params)
        buf, _ = render_image(scene, camera, W, H, 1, max_bounces=4, differentiable=True)
        return jnp.sum((buf.color - target) ** 2)

    loss_1, grads_1 = jax.value_and_grad(loss_fn)(extract_params(sphere_scene))
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-5)
    flat_s = jax.tree_util.tree_leaves(grads_s)
    flat_1 = jax.tree_util.tree_leaves(grads_1)
    assert len(flat_s) == len(flat_1)
    for a, b in zip(flat_s, flat_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sharded_grads_posthoc_mesh_scene(full_scene, camera, mesh):
    """Post-hoc collective placement (overlap_grad_psum=False) on a MESH
    scene: regression for the hoisted-slot-table VMA crash — without the
    overlap pcast the hoisted replicated table's backward cotangent
    accumulator crossed the bounce scan unvarying -> varying and shard_map
    rejected the program (round 3); the fix pcasts the scene ONCE before
    the scan in this mode (the rebaked slot table stays hoisted outside
    the bounce loop — see integrator.trace_sample's VMA docstring).
    Grads must still match single-device."""
    target = jnp.zeros((W * H, 3))
    loss_s, grads_s = render_loss_and_grads_sharded(
        full_scene, camera, target, W, H, 1, mesh, max_bounces=3,
        overlap_grad_psum=False,
    )

    def loss_fn(params):
        scene = with_params(full_scene, params)
        buf, _ = render_image(scene, camera, W, H, 1, max_bounces=3,
                              differentiable=True)
        return jnp.sum((buf.color - target) ** 2)

    loss_1, grads_1 = jax.value_and_grad(loss_fn)(extract_params(full_scene))
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_s), jax.tree_util.tree_leaves(grads_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_uneven_height_raises(sphere_scene, camera, mesh):
    with pytest.raises(ValueError, match="not divisible"):
        render_image_sharded(sphere_scene, camera, W, 30, 1, mesh)


def test_mesh_subset():
    m = make_tile_mesh(4)
    assert m.devices.size == 4
