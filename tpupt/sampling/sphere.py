"""Sphere sampling (reference random_in_unit_sphere,
src/lib/distributions.cuh:6-19: uniform on the unit *sphere surface* via
(phi, cos-theta) inversion — despite the name)."""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core.vec import Vec3
from tpupt.sampling.rng import uniform, bounce_counter

TWO_PI = 6.283185307179586


def random_in_unit_sphere(seed: jnp.ndarray, bounce) -> Vec3:
    """Two draws (lanes 0, 1) -> point on the unit sphere, matching the
    reference's (phi, cos_theta) parametrization exactly.  Component-SoA."""
    u0 = uniform(seed, bounce_counter(bounce, 0))
    u1 = uniform(seed, bounce_counter(bounce, 1))
    phi = TWO_PI * u0
    cos_theta = 2.0 * u1 - 1.0
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12))
    return Vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)
