"""Camera & primary-ray generation.

Replicates the reference viewport math bit-for-bit
(generate_ray, src/lib/ray_gen.cu:34-61):

  * viewport height = 2 tan(vfov/2), focal length 1
  * u = x / (W-1),   v = (H - y) / (H-1)       (note the vertical flip)
  * ray.t_min = 1e-4, t_max = +inf
  * camera-space origin (0,0,0), direction through the viewport, both mapped
    to world by camera_matrix = translate(position) · mat4(rotation)
    (src/lib/camera.cpp:5-13)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpupt.core.types import Camera

T_MIN_PRIMARY = 1e-4
T_MAX = jnp.float32(np.finfo(np.float32).max)


def make_camera(position=(0.0, 0.0, 0.0), rotation=None, vfov=np.pi / 2) -> Camera:
    """Build a Camera from position + 3x3 rotation (camera-to-world).

    ``rotation=None`` means identity (looking down -z like the reference
    default Camera, src/lib/camera.hpp:17-23).
    """
    m = np.eye(4, dtype=np.float32)
    if rotation is not None:
        m[:3, :3] = np.asarray(rotation, np.float32)
    m[:3, 3] = np.asarray(position, np.float32)
    # numpy leaves on purpose: cameras are built during scene loading,
    # which must not attach the device backend (jit converts at call time)
    return Camera(camera_matrix=m, vfov=np.float32(vfov))


def camera_from_matrix(camera_to_world, vfov) -> Camera:
    return Camera(
        camera_matrix=np.asarray(camera_to_world, np.float32),
        vfov=np.float32(vfov),
    )


def generate_rays(camera: Camera, width: int, height: int, fx: jnp.ndarray, fy: jnp.ndarray):
    """Primary rays for (possibly jittered) pixel coordinates.

    fx, fy: (N,) float pixel coordinates.  Returns (Vec3 origins, Vec3
    directions) in component-SoA form (core/vec.py); directions are
    normalized (reference ray_gen.cu:58-59).
    """
    from tpupt.core.vec import Vec3, transform_vector

    aspect = jnp.float32(width / height)
    viewport_h = 2.0 * jnp.tan(camera.vfov / 2.0)
    viewport_w = aspect * viewport_h
    focal = jnp.float32(1.0)

    u = fx / jnp.float32(width - 1)
    v = (jnp.float32(height) - fy) / jnp.float32(height - 1)

    # camera-space direction = lower_left + u*horizontal + v*vertical
    d_cam = Vec3(
        (u - 0.5) * viewport_w,
        (v - 0.5) * viewport_h,
        -focal * jnp.ones_like(u),
    )

    m = camera.camera_matrix
    world_dir = transform_vector(m, d_cam).normalize()
    ones = jnp.ones_like(u)
    ro = Vec3(m[0, 3] * ones, m[1, 3] * ones, m[2, 3] * ones)
    return ro, world_dir


def pixel_centers(width: int, height: int):
    """(N,) fx, fy at pixel centers (x+0.5, y+0.5) in row-major y*W+x order —
    used by the denoiser's world-position reconstruction
    (reference edge_avoiding_a_trous_denoiser.cu:44-45)."""
    idx = jnp.arange(width * height, dtype=jnp.int32)
    x = (idx % width).astype(jnp.float32) + 0.5
    y = (idx // width).astype(jnp.float32) + 0.5
    return x, y
