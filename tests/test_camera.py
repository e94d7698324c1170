import numpy as np
import jax.numpy as jnp

import tpupt.core.math3d as m3
from tpupt.core.camera import generate_rays, make_camera, pixel_centers


def test_center_ray_looks_down_minus_z():
    cam = make_camera(vfov=np.pi / 2)
    w, h = 101, 101
    # the reference viewport is asymmetric: u = x/(W-1), v = (H-y)/(H-1)
    # (ray_gen.cu:49-52), so the exact -z ray is at x=(W-1)/2, y=(H+1)/2
    fx = jnp.array([50.0])
    fy = jnp.array([51.0])
    ro, rd = generate_rays(cam, w, h, fx, fy)
    np.testing.assert_allclose(np.asarray(ro.to_array()[0]), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd.to_array()[0]), [0, 0, -1], atol=1e-5)


def test_viewport_extent_matches_vfov():
    # reference ray_gen.cu:40-47: viewport height = 2 tan(vfov/2), v flipped
    vfov = np.deg2rad(60)
    cam = make_camera(vfov=vfov)
    w = h = 11
    # top edge of the viewport: v = 1 -> y = 0 ... fy such that v=1: fy=0
    _, rd_top = generate_rays(cam, w, h, jnp.array([5.0]), jnp.array([0.0]))
    d = np.asarray(rd_top.to_array()[0])
    # fy=0 -> v = h/(h-1) slightly above 1; fy with v == 1 is fy = 1.
    _, rd1 = generate_rays(cam, w, h, jnp.array([5.0]), jnp.array([1.0]))
    d1 = np.asarray(rd1.to_array()[0])
    np.testing.assert_allclose(d1[1] / -d1[2], np.tan(vfov / 2), rtol=1e-5)
    assert d[1] > d1[1]  # smaller fy is higher on screen (v flip)


def test_camera_transform_moves_rays():
    rot = np.asarray(m3.mat_rotate(np.pi / 2, [0, 1, 0]))[:3, :3]
    cam = make_camera(position=(1, 2, 3), rotation=rot, vfov=np.pi / 2)
    ro, rd = generate_rays(cam, 101, 101, jnp.array([50.0]), jnp.array([51.0]))
    np.testing.assert_allclose(np.asarray(ro.to_array()[0]), [1, 2, 3], atol=1e-6)
    # rotating -z by +90deg about y gives -x
    np.testing.assert_allclose(np.asarray(rd.to_array()[0]), [-1, 0, 0], atol=1e-5)


def test_pixel_centers_row_major():
    fx, fy = pixel_centers(4, 3)
    assert fx.shape == (12,)
    np.testing.assert_allclose(np.asarray(fx[:4]), [0.5, 1.5, 2.5, 3.5])
    np.testing.assert_allclose(np.asarray(fy[:4]), [0.5] * 4)
    np.testing.assert_allclose(np.asarray(fy[4:8]), [1.5] * 4)
