"""Math/transform unit tests — covers the reference's test surface
(test/transform_test.cpp:8-46, test/aabb_test.cpp:6-59) and more."""

import numpy as np
import jax.numpy as jnp

import tpupt.core.math3d as m3


def test_inverse_transform_ray_translate():
    # reference transform_test.cpp: translate moves origin, keeps direction
    m = m3.mat_translate([1.0, 2.0, 3.0])
    inv = jnp.linalg.inv(m)
    ro = jnp.array([[0.0, 0.0, 0.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    oo, od = m3.inverse_transform_ray(inv[None], ro, rd)
    np.testing.assert_allclose(np.asarray(oo[0]), [-1, -2, -3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(od[0]), [0, 0, -1], atol=1e-6)


def test_inverse_transform_ray_scale_normalizes():
    # the reference normalizes the object-space direction (transform.hpp:57)
    m = m3.mat_scale([2.0, 1.0, 1.0])
    inv = jnp.linalg.inv(m)
    rd = jnp.array([[1.0, 0.0, 0.0]])
    _, od = m3.inverse_transform_ray(inv[None], jnp.zeros((1, 3)), rd)
    np.testing.assert_allclose(float(m3.length(od)[0]), 1.0, atol=1e-6)


def test_inverse_transform_ray_rotate():
    m = m3.mat_rotate(np.pi / 2, [0, 0, 1])  # +90 deg about z
    inv = jnp.linalg.inv(m)
    rd = jnp.array([[0.0, 1.0, 0.0]])
    _, od = m3.inverse_transform_ray(inv[None], jnp.zeros((1, 3)), rd)
    np.testing.assert_allclose(np.asarray(od[0]), [1, 0, 0], atol=1e-6)


def test_transform_normal_nonuniform_scale():
    # normals transform by inverse-transpose: plane y=2x under scale(2,1,1)
    m = m3.mat_scale([2.0, 1.0, 1.0])
    inv = jnp.linalg.inv(m)
    n = m3.normalize(jnp.array([[2.0, -1.0, 0.0]]))
    tn = m3.transform_normal(inv[None], n)
    # surface tangent (1,2,0) maps to (2,2,0); normal must stay orthogonal
    tangent_world = m3.transform_vector(m[None], jnp.array([[1.0, 2.0, 0.0]]))
    assert abs(float(m3.dot(tn, tangent_world)[0])) < 1e-6


def test_transform_aabb_contains_corners():
    m = jnp.asarray(
        np.asarray(m3.mat_rotate(0.7, [1, 1, 0])) @ np.asarray(m3.mat_translate([1, 2, 3])),
        jnp.float32,
    )
    bmin = jnp.array([-1.0, -2.0, -0.5])
    bmax = jnp.array([1.0, 0.5, 2.0])
    nmin, nmax = m3.transform_aabb(m, bmin, bmax)
    rng = np.random.default_rng(0)
    pts = rng.uniform(np.asarray(bmin), np.asarray(bmax), size=(100, 3)).astype(np.float32)
    w = np.asarray(m3.transform_point(m[None], jnp.asarray(pts)))
    assert (w >= np.asarray(nmin) - 1e-4).all()
    assert (w <= np.asarray(nmax) + 1e-4).all()


def test_reflect_refract():
    d = m3.normalize(jnp.array([[1.0, -1.0, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = m3.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r[0]), np.asarray(m3.normalize(jnp.array([[1.0, 1.0, 0.0]]))[0]), atol=1e-6)
    # refraction at normal incidence is pass-through
    d2 = jnp.array([[0.0, -1.0, 0.0]])
    t = m3.refract(d2, n, jnp.array([1.0 / 1.5]))
    np.testing.assert_allclose(np.asarray(t[0]), [0, -1, 0], atol=1e-3)


def test_look_at_matrix():
    m = m3.mat_look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])
    # camera at (0,0,4) looking down -z: forward column is +z (dir = from-at)
    np.testing.assert_allclose(np.asarray(m[:3, 3]), [0, 0, 4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m[:3, 2]), [0, 0, 1], atol=1e-6)
