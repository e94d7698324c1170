"""Component-SoA 3-vectors — the TPU hot-path representation.

TPU vector registers are (8 sublanes x 128 lanes); XLA lays the MINOR axis
of an array across lanes.  A `(N, 3)` vector array therefore uses 3 of 128
lanes (and padded fusion buffers blow up by the same factor) — measured on
v5e this costs ~100x on the render loop.  The hot path instead carries a
`Vec3` of three independent `(N,)` arrays: every operation is a full-width
elementwise op, and dot/cross/normalize never generate minor-axis
reductions.

`(N, 3)` arrays remain the *boundary* representation (buffers, images,
host code, the denoiser whose images are wide in both dims) — convert with
``Vec3.from_array`` / ``.to_array``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # --- constructors --------------------------------------------------
    @staticmethod
    def from_array(a: jnp.ndarray) -> "Vec3":
        """(…, 3) -> Vec3 of (…,) components."""
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def full(shape, x, y, z) -> "Vec3":
        return Vec3(
            jnp.full(shape, x, jnp.float32),
            jnp.full(shape, y, jnp.float32),
            jnp.full(shape, z, jnp.float32),
        )

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # --- arithmetic ----------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # --- geometry ------------------------------------------------------
    def dot(self, o: "Vec3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length2(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        # eps floor keeps masked-lane reverse-mode gradients finite
        return jnp.sqrt(jnp.maximum(self.length2(), 1e-30))

    def normalize(self) -> "Vec3":
        inv = lax.rsqrt(jnp.maximum(self.length2(), 1e-12))
        return self * inv

    def min_component(self) -> jnp.ndarray:
        return jnp.minimum(jnp.minimum(self.x, self.y), self.z)

    def max_component(self) -> jnp.ndarray:
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def abs(self) -> "Vec3":
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))


def where(mask: jnp.ndarray, a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def reflect(d: Vec3, n: Vec3) -> Vec3:
    """glm::reflect (reference usage src/lib/path_tracer.cu:166)."""
    return d - n * (2.0 * d.dot(n))


def refract(uv: Vec3, n: Vec3, eta: jnp.ndarray) -> Vec3:
    """glm::refract for unit incident uv (reference path_tracer.cu:196)."""
    cos_theta = jnp.minimum((-uv).dot(n), 1.0)
    perp = (uv + n * cos_theta) * eta
    k = 1.0 - perp.length2()
    par = n * (-jnp.sqrt(jnp.maximum(k, 1e-12)))
    return perp + par


def transform_point(m: jnp.ndarray, v: Vec3) -> Vec3:
    """Apply a (4,4) (or batched (...,4,4) with scalar-broadcastable
    entries) homogeneous matrix to points; affine (no perspective divide —
    scene transforms are affine, reference json_parser.cpp:40-95)."""
    return Vec3(
        m[..., 0, 0] * v.x + m[..., 0, 1] * v.y + m[..., 0, 2] * v.z + m[..., 0, 3],
        m[..., 1, 0] * v.x + m[..., 1, 1] * v.y + m[..., 1, 2] * v.z + m[..., 1, 3],
        m[..., 2, 0] * v.x + m[..., 2, 1] * v.y + m[..., 2, 2] * v.z + m[..., 2, 3],
    )


def transform_vector(m: jnp.ndarray, v: Vec3) -> Vec3:
    return Vec3(
        m[..., 0, 0] * v.x + m[..., 0, 1] * v.y + m[..., 0, 2] * v.z,
        m[..., 1, 0] * v.x + m[..., 1, 1] * v.y + m[..., 1, 2] * v.z,
        m[..., 2, 0] * v.x + m[..., 2, 1] * v.y + m[..., 2, 2] * v.z,
    )


def transform_normal(inv_m: jnp.ndarray, n: Vec3) -> Vec3:
    """Inverse-transpose normal transform (reference transform.hpp:60-66):
    row j of result = column j of inv_m dotted with n."""
    return Vec3(
        inv_m[..., 0, 0] * n.x + inv_m[..., 1, 0] * n.y + inv_m[..., 2, 0] * n.z,
        inv_m[..., 0, 1] * n.x + inv_m[..., 1, 1] * n.y + inv_m[..., 2, 1] * n.z,
        inv_m[..., 0, 2] * n.x + inv_m[..., 1, 2] * n.y + inv_m[..., 2, 2] * n.z,
    )
