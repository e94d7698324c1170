"""Branch-free vectorized BSDF evaluation.

Replicates the reference's evaluate_material
(src/lib/path_tracer.cu:138-201) — 3 BSDFs dispatched on a material tag —
but computes all three lobes for every lane and selects, which is how a
lockstep vector machine wants it (the reference relies on SIMT divergence
handling instead, SURVEY.md §2.5).

Exact semantics preserved:
  * common origin offset: point - 1e-4 * sign(dot(d, n)) * n  (cu:142-144)
  * diffuse: dir = normalize(n + unit_sphere_sample), degenerate -> n
    (cu:148-162); throughput *= albedo
  * metal: dir = reflect(d, n) + fuzz * unit_sphere_sample, NOT normalized;
    below-horizon scatter kills throughput to 0 (cu:163-174)
  * dielectric: Schlick + stochastic reflect/refract on the *normalized*
    incident dir; fresh ray from the un-offset hit point with t_min = 1e-5
    (cu:175-199) — t_min is carried in the path state thereafter
  * russian roulette (extension, BASELINE config 2; absent in the
    reference per SURVEY.md §2.2 note): survive with p = clamp(max
    throughput channel), dividing by p — enabled via rr_start_bounce
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core import math3d
from tpupt.core.types import MAT_DIELECTRIC, MAT_DIFFUSE, MAT_METAL, SceneArrays, Hit
from tpupt.sampling.rng import bounce_counter, uniform
from tpupt.sampling.sphere import random_in_unit_sphere

T_MAX = jnp.float32(3.4e38)


def _schlick(cosine, ref_idx):
    """Schlick reflectance (reference src/lib/path_tracer.cu:130-136)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    p = 1.0 - cosine  # >= 0 because cosine is clamped to <= 1
    return r0 + (1.0 - r0) * (p * p * p * p * p)


def shade(
    scene: SceneArrays,
    hit: Hit,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_min: jnp.ndarray,
    throughput: jnp.ndarray,
    seed: jnp.ndarray,
    bounce,
):
    """One scatter event for every lane.  Returns
    (new_ro, new_rd, new_t_min, new_throughput).  Callers mask the result
    by hit.mask; lanes that missed get garbage here (cheap, ignored).
    """
    mats = scene.materials
    mtype = mats.mat_type[hit.mat_id]
    albedo = mats.albedo[hit.mat_id]
    fuzz = mats.fuzz[hit.mat_id]
    ior = mats.ior[hit.mat_id]
    n = hit.normal

    sphere_s = random_in_unit_sphere(seed, bounce)
    u_fresnel = uniform(seed, bounce_counter(bounce, 2))

    # shared offset origin (diffuse / metal)
    off = hit.point - 1e-4 * jnp.sign(math3d.dot(rd, n))[..., None] * n

    # --- diffuse -------------------------------------------------------
    d_diff = math3d.normalize(n + sphere_s)
    degenerate = jnp.all(jnp.abs(n + sphere_s) < 1e-8, axis=-1)
    d_diff = jnp.where(degenerate[..., None], n, d_diff)

    # --- metal ---------------------------------------------------------
    d_metal = math3d.reflect(rd, n) + fuzz[..., None] * sphere_s
    metal_ok = math3d.dot(d_metal, n) > 0.0
    metal_mult = jnp.where(metal_ok[..., None], albedo, jnp.zeros_like(albedo))

    # --- dielectric ----------------------------------------------------
    ratio = jnp.where(hit.front, 1.0 / ior, ior)
    unit_d = math3d.normalize(rd)
    cos_theta = jnp.minimum(math3d.dot(-unit_d, n), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12))
    cannot_refract = ratio * sin_theta > 1.0
    choose_reflect = cannot_refract | (_schlick(cos_theta, ratio) > u_fresnel)
    d_diel = jnp.where(
        choose_reflect[..., None],
        math3d.reflect(unit_d, n),
        math3d.refract(unit_d, n, ratio),
    )

    # --- select by material type --------------------------------------
    is_diff = (mtype == MAT_DIFFUSE)[..., None]
    is_metal = (mtype == MAT_METAL)[..., None]
    is_diel = (mtype == MAT_DIELECTRIC)[..., None]

    new_rd = jnp.where(is_diff, d_diff, jnp.where(is_metal, d_metal, d_diel))
    new_ro = jnp.where(is_diel, hit.point, off)
    new_t_min = jnp.where(is_diel[..., 0], jnp.float32(1e-5), t_min)
    mult = jnp.where(
        is_diff, albedo, jnp.where(is_metal, metal_mult, jnp.ones_like(albedo))
    )
    new_throughput = throughput * mult
    return new_ro, new_rd, new_t_min, new_throughput


def russian_roulette(throughput, alive, seed, bounce):
    """Optional RR termination (extension).  Returns (throughput, alive)."""
    u = uniform(seed, bounce_counter(bounce, 3))
    p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
    survive = u < p
    throughput = jnp.where(
        survive[..., None], throughput / p[..., None], throughput
    )
    return throughput, alive & survive
