"""Branch-free vectorized BSDF evaluation (component-SoA).

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

import jax
import jax.numpy as jnp

from tpupt.core import vec
from tpupt.core.vec import Vec3
from tpupt.core.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_EMISSIVE,
    MAT_METAL,
    SceneArrays,
    Hit,
)
from tpupt.sampling.rng import bounce_counter, uniform
from tpupt.sampling.sphere import random_in_unit_sphere

INV_PI = 0.3183098861837907


def _material_rows(scene: SceneArrays, mat_id: jnp.ndarray):
    """All material fields for every lane via ONE one-hot matmul.

    Per-lane gathers serialize on TPU (~7.7 ns/lane each); the 9 separate
    table fetches of the naive SoA formulation cost 9x this single
    (10, M) @ (M, N) MXU contraction.  The one-hot operand is exact 0/1
    and Precision.HIGHEST keeps the f32 data unperturbed; the int type
    tag round-trips exactly through f32 (values < 2^24).

    Returns (mat_type (N,) i32, albedo Vec3, fuzz (N,), ior (N,),
    emission Vec3)."""
    mats = scene.materials
    table = jnp.concatenate(
        [
            mats.mat_type.astype(jnp.float32)[:, None],
            mats.albedo,
            mats.fuzz[:, None],
            mats.ior[:, None],
            mats.emission,
        ],
        axis=1,
    )  # (M, 10)
    m = table.shape[0]
    onehot = (
        jnp.arange(m, dtype=mat_id.dtype)[:, None] == mat_id[None, :]
    ).astype(jnp.float32)  # (M, N)
    rows = jax.lax.dot_general(
        table.T,
        onehot,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (10, N) — lanes on the minor axis
    mtype = rows[0].astype(jnp.int32)
    albedo = Vec3(rows[1], rows[2], rows[3])
    fuzz, ior = rows[4], rows[5]
    emission = Vec3(rows[6], rows[7], rows[8])
    return mtype, albedo, fuzz, ior, emission


def _schlick(cosine, ref_idx):
    """Schlick reflectance (reference src/lib/path_tracer.cu:130-136)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    p = 1.0 - cosine  # >= 0 because cosine is clamped to <= 1
    return r0 + (1.0 - r0) * (p * p * p * p * p)


def shade(
    scene: SceneArrays,
    hit: Hit,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    throughput: Vec3,
    seed: jnp.ndarray,
    bounce,
):
    """One scatter event for every lane.  Returns
    (new_ro, new_rd, new_t_min, new_throughput, emitted, terminate,
    specular, pdf_w): ``emitted`` is the radiance the hit surface emits
    toward the path (zero except for MAT_EMISSIVE), ``terminate`` marks
    lanes whose material absorbs the path (emissive lights don't
    scatter), ``pdf_w`` is the solid-angle pdf of the sampled direction
    for SOLID-ANGLE-SAMPLEABLE lobes (diffuse: cos/pi; specular lobes: 0
    — delta distributions) — the BSDF-side density MIS weighs emissive
    hits with (integrator._bounce_body).  Callers mask by hit.mask;
    lanes that missed get garbage here (cheap, ignored).
    """
    mtype, albedo, fuzz, ior, emitted_all = _material_rows(scene, hit.mat_id)
    n = hit.normal

    sphere_s = random_in_unit_sphere(seed, bounce)
    u_fresnel = uniform(seed, bounce_counter(bounce, 2))

    # shared offset origin (diffuse / metal)
    off = hit.point - n * (1e-4 * jnp.sign(rd.dot(n)))

    # --- diffuse -------------------------------------------------------
    d_sum = n + sphere_s
    d_diff = d_sum.normalize()
    degenerate = (
        (jnp.abs(d_sum.x) < 1e-8) & (jnp.abs(d_sum.y) < 1e-8) & (jnp.abs(d_sum.z) < 1e-8)
    )
    d_diff = vec.where(degenerate, n, d_diff)

    # --- metal ---------------------------------------------------------
    d_metal = vec.reflect(rd, n) + sphere_s * fuzz
    metal_ok = d_metal.dot(n) > 0.0
    zero = Vec3(jnp.zeros_like(fuzz), jnp.zeros_like(fuzz), jnp.zeros_like(fuzz))
    metal_mult = vec.where(metal_ok, albedo, zero)

    # --- dielectric ----------------------------------------------------
    ratio = jnp.where(hit.front, 1.0 / ior, ior)
    unit_d = rd.normalize()
    cos_theta = jnp.minimum((-unit_d).dot(n), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12))
    cannot_refract = ratio * sin_theta > 1.0
    choose_reflect = cannot_refract | (_schlick(cos_theta, ratio) > u_fresnel)
    d_diel = vec.where(
        choose_reflect, vec.reflect(unit_d, n), vec.refract(unit_d, n, ratio)
    )

    # --- select by material type --------------------------------------
    is_diff = mtype == MAT_DIFFUSE
    is_metal = mtype == MAT_METAL
    is_diel = mtype == MAT_DIELECTRIC

    is_emis = mtype == MAT_EMISSIVE

    new_rd = vec.where(is_diff, d_diff, vec.where(is_metal, d_metal, d_diel))
    new_ro = vec.where(is_diel, hit.point, off)
    new_t_min = jnp.where(is_diel, jnp.float32(1e-5), t_min)
    one = Vec3(jnp.ones_like(fuzz), jnp.ones_like(fuzz), jnp.ones_like(fuzz))
    mult = vec.where(is_diff, albedo, vec.where(is_metal, metal_mult, one))
    new_throughput = throughput * mult

    zero3 = Vec3(jnp.zeros_like(fuzz), jnp.zeros_like(fuzz), jnp.zeros_like(fuzz))
    emitted = vec.where(is_emis, emitted_all, zero3)
    # `specular` marks delta lobes: their emissive hits take full weight
    # (NEE cannot sample them); diffuse-sampled emissive hits are
    # MIS-weighted against the light-sampling pdf instead
    specular = is_metal | is_diel
    # cosine-weighted diffuse pdf of the RETURNED direction (d_diff is
    # unit); 0 for delta lobes
    pdf_w = jnp.where(
        is_diff, jnp.maximum(d_diff.dot(n), 0.0) * jnp.float32(INV_PI), 0.0
    )
    return (new_ro, new_rd, new_t_min, new_throughput, emitted, is_emis,
            specular, pdf_w)


def sample_light_sphere(center: Vec3, radius, p: Vec3, u1, u2):
    """Cone sampling of a sphere light as seen from ``p`` (uniform over
    the subtended solid angle).  Returns (direction Vec3, pdf 1/sr,
    valid mask — p outside the sphere)."""
    d = center - p
    dist2 = d.dot(d)
    valid = dist2 > radius * radius
    inv_dist = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
    w = d * inv_dist
    sin2_max = jnp.clip(radius * radius / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))

    cos_t = 1.0 + u1 * (cos_max - 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 6.283185307179586 * u2

    # orthonormal frame around w (branch-free Frisvad-style)
    sign = jnp.where(w.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + w.z)
    b = w.x * w.y * a
    t1 = Vec3(1.0 + sign * w.x * w.x * a, sign * b, -sign * w.x)
    t2 = Vec3(b, sign + w.y * w.y * a, -w.y)

    direction = w * cos_t + t1 * (sin_t * jnp.cos(phi)) + t2 * (sin_t * jnp.sin(phi))
    pdf = 1.0 / jnp.maximum(6.283185307179586 * (1.0 - cos_max), 1e-8)
    return direction, pdf, valid


def russian_roulette(throughput: Vec3, alive, seed, bounce):
    """Optional RR termination (extension).  Returns (throughput, alive)."""
    u = uniform(seed, bounce_counter(bounce, 3))
    p = jnp.clip(throughput.max_component(), 0.05, 0.95)
    survive = u < p
    inv_p = 1.0 / p
    tp = vec.where(survive, throughput * inv_p, throughput)
    return tp, alive & survive
