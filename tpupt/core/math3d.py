"""Vector / transform math over batched (…, 3) arrays.

Replaces the reference's glm usage and Transform class
(src/lib/transform.hpp:9-88).  Everything here is shape-polymorphic over
leading batch dims and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keepdims dropped: (..., 3) -> (...)."""
    return jnp.sum(a * b, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    # The small positive floor keeps reverse-mode gradients finite on
    # masked/garbage lanes (d/dx sqrt(max(x, eps)) == 0 below the floor,
    # instead of inf at x == 0 which would poison where-masked grads).
    return jnp.sqrt(jnp.maximum(dot(v, v), 1e-30))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize; zero vectors map to zero (masked lanes tolerate it)."""
    return v * jax_rsqrt(jnp.maximum(dot(v, v), EPS))[..., None]


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(x)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """glm::reflect: d - 2*dot(d,n)*n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """glm::refract for unit incident ``uv`` and normal ``n``; eta = n1/n2.

    glm semantics: k = 1 - eta^2 (1 - dot(n, uv)^2); returns 0 on total
    internal reflection (callers guard on that case as the reference does,
    src/lib/path_tracer.cu:187-196)."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = eta[..., None] * (uv + cos_theta[..., None] * n)
    k = 1.0 - dot(r_out_perp, r_out_perp)
    # eps floor: keeps the sqrt gradient finite at the TIR boundary
    r_out_parallel = -jnp.sqrt(jnp.maximum(k, 1e-12))[..., None] * n
    return r_out_perp + r_out_parallel


# --- 4x4 homogeneous transforms -------------------------------------------
# Matrices are stored row-major with column-vector convention: world = M @ v.


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (…,4,4) @ [p,1]; perspective divide like reference
    transform_point (src/lib/transform.hpp:37-42)."""
    r = jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    w = jnp.einsum("...j,...j->...", m[..., 3, :3], p) + m[..., 3, 3]
    return r / w[..., None]


def transform_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply the linear part only (w = 0), reference transform_vector
    (src/lib/transform.hpp:44-49)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def transform_normal(inv_m: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transpose transform of a normal, reference transform_normal
    (src/lib/transform.hpp:60-66).  Takes the cached *inverse* matrix."""
    return jnp.einsum("...ji,...j->...i", inv_m[..., :3, :3], n)


def inverse_transform_ray(
    inv_m: jnp.ndarray, ro: jnp.ndarray, rd: jnp.ndarray, normalize_dir: bool = True
):
    """World ray -> object space (reference inverse_transform_ray,
    src/lib/transform.hpp:51-58 — note the reference *normalizes* the
    object-space direction; pass normalize_dir=False to keep world-t
    parametrization for t-bounded AABB culling)."""
    o = transform_point(inv_m, ro)
    d = transform_vector(inv_m, rd)
    if normalize_dir:
        d = normalize(d)
    return o, d


def transform_aabb(m: jnp.ndarray, bmin: jnp.ndarray, bmax: jnp.ndarray):
    """8-corner transform of an AABB (reference transform_aabb,
    src/lib/transform.hpp:69-88)."""
    import itertools

    corners = []
    for sx, sy, sz in itertools.product([0, 1], repeat=3):
        c = jnp.stack(
            [
                jnp.where(sx, bmax[..., 0], bmin[..., 0]),
                jnp.where(sy, bmax[..., 1], bmin[..., 1]),
                jnp.where(sz, bmax[..., 2], bmin[..., 2]),
            ],
            axis=-1,
        )
        corners.append(transform_point(m, c))
    pts = jnp.stack(corners, axis=0)
    return jnp.min(pts, axis=0), jnp.max(pts, axis=0)


# --- matrix constructors (host-side, PURE NUMPY) ---------------------------
# Scene parsing/building must never touch the device: through a TPU relay
# every eager jnp op costs a ~6 ms dispatch and the FIRST one pays the
# whole backend attach (minutes) — measured as a 124 s "scene load" for a
# 4-sphere JSON before these became numpy.

import numpy as _np


def _np_normalize(v):
    v = _np.asarray(v, _np.float64)
    return v / max(float(_np.linalg.norm(v)), 1e-30)


def mat_translate(t) -> _np.ndarray:
    m = _np.eye(4, dtype=_np.float32)
    m[:3, 3] = _np.asarray(t, _np.float32)
    return m


def mat_scale(s) -> _np.ndarray:
    s = _np.broadcast_to(_np.asarray(s, _np.float32), (3,))
    return _np.diag(_np.concatenate([s, _np.ones((1,), _np.float32)]))


def mat_rotate(angle_rad: float, axis) -> _np.ndarray:
    """Axis-angle rotation (glm::rotate semantics)."""
    x, y, z = _np_normalize(axis)
    c, s = _np.cos(angle_rad), _np.sin(angle_rad)
    C = 1.0 - c
    return _np.array(
        [
            [c + x * x * C, x * y * C - z * s, x * z * C + y * s, 0.0],
            [y * x * C + z * s, c + y * y * C, y * z * C - x * s, 0.0],
            [z * x * C - y * s, z * y * C + x * s, c + z * z * C, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=_np.float32,
    )


def mat_look_at(from_, at, up) -> _np.ndarray:
    """Camera-to-world from from/at/up, matching the reference's JSON
    'from/at/up' transform (src/lib/assets/json_parser.cpp:55-75): columns
    are [left, new_up, dir, from] with dir = normalize(from - at)."""
    from_ = _np.asarray(from_, _np.float64)
    dir_ = _np_normalize(from_ - _np.asarray(at, _np.float64))
    left = _np_normalize(_np.cross(_np.asarray(up, _np.float64), dir_))
    new_up = _np_normalize(_np.cross(dir_, left))
    m = _np.stack([left, new_up, dir_, from_], axis=1)  # columns
    return _np.concatenate(
        [m, _np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0
    ).astype(_np.float32)


def transform_aabb_np(m, bmin, bmax):
    """Numpy twin of transform_aabb for host-side scene building."""
    import itertools

    m = _np.asarray(m, _np.float64)
    bmin = _np.asarray(bmin, _np.float64)
    bmax = _np.asarray(bmax, _np.float64)
    pts = []
    for sx, sy, sz in itertools.product([0, 1], repeat=3):
        c = _np.array(
            [
                bmax[0] if sx else bmin[0],
                bmax[1] if sy else bmin[1],
                bmax[2] if sz else bmin[2],
            ]
        )
        pts.append(m[:3, :3] @ c + m[:3, 3])
    pts = _np.stack(pts, axis=0)
    return pts.min(axis=0), pts.max(axis=0)
