"""Sample-chaining forward renderer (integrator._render_chained).

The chained loop merges the spp loop into the bounce loop — each lane
starts its next sample the instant its path dies.  It is semantically
identical to the plain per-sample loop: same counter-based RNG per
(pixel, iteration, bounce), same per-lane (n-1)/n progressive average,
and the same integer count of traced segments (asserted EXACTLY — it
proves the per-lane aliveness evolution matches bounce for bounce).
Float outputs are compared at 1-2 ulp: XLA makes different FMA-contraction
choices for the two program structures (measured: even the *primary ray
directions* differ at 1 ulp between a fori_loop body and a hoisted init),
so cross-structure bit-equality is not achievable; the bit-identity
invariants in CLAUDE.md hold between identically-structured programs
(sharded vs single-device, megakernel vs wavefront).
"""

import numpy as np
import jax.numpy as jnp

import tpupt.core.math3d as m3
from tpupt.core.camera import make_camera
from tpupt.render.integrator import render_image
from tpupt.scene.description import SceneDescription

W, H = 24, 16
# 1-ulp primary-ray diffs amplify through grazing sphere hits (dt/ddir is
# unbounded at the silhouette) and bounce recursion; measured max ~7e-6 rel.
ULP = dict(rtol=1e-4, atol=1e-5)


def _compare(scene, camera, **kw):
    buf_c, rays_c = render_image(scene, camera, W, H, chain_samples=True, **kw)
    buf_u, rays_u = render_image(scene, camera, W, H, chain_samples=False, **kw)
    np.testing.assert_allclose(np.asarray(buf_c.color), np.asarray(buf_u.color), **ULP)
    np.testing.assert_allclose(np.asarray(buf_c.normal), np.asarray(buf_u.normal), **ULP)
    np.testing.assert_allclose(np.asarray(buf_c.depth), np.asarray(buf_u.depth), **ULP)
    assert int(buf_c.iteration) == int(buf_u.iteration)
    assert int(rays_c) == int(rays_u)


def test_chained_bit_identical_full_scene(full_scene, camera):
    _compare(full_scene, camera, spp=3, max_bounces=6)


def test_chained_bit_identical_with_rr(full_scene, camera):
    _compare(full_scene, camera, spp=4, max_bounces=12, rr_start=2)


def test_chained_bit_identical_start_iteration(sphere_scene, camera):
    _compare(sphere_scene, camera, spp=2, max_bounces=5, start_iteration=3)


def test_chained_bit_identical_nee_lights(camera):
    d = SceneDescription(bg_down=(0, 0, 0), bg_up=(0, 0, 0))
    d.add_material("floor", "lambertian", albedo=(0.7, 0.7, 0.7))
    d.add_material("lamp", "diffuse_light", emit=(10.0, 8.0, 6.0))
    d.add_sphere(100.0, np.asarray(m3.mat_translate([0, -100.5, -1])), "floor")
    d.add_sphere(0.3, np.asarray(m3.mat_translate([0, 0.7, -1.5])), "lamp")
    _compare(d.build(), camera, spp=2, max_bounces=5)


def test_chained_spp1(sphere_scene, camera):
    _compare(sphere_scene, camera, spp=1, max_bounces=4)


def test_chain_ladder_matches_flat(full_scene, camera):
    """The packet-row ladder (integrator._run_chain_ladder) is pure
    scheduling: EXACT ray counts and per-pixel values matching the flat
    chained loop at cross-program-structure tolerance."""
    import tpupt.render.integrator as integ

    w = h = 64  # 16 packet rows
    buf_flat, rays_flat = render_image(
        full_scene, camera, w, h, 3, max_bounces=6
    )

    orig_min, orig_div = integ._CHAIN_MIN_ROWS, integ._CHAIN_DIV
    integ._CHAIN_MIN_ROWS, integ._CHAIN_DIV = 2, 2
    try:
        buf_lad, rays_lad = render_image(
            full_scene, camera, w, h, 3, max_bounces=6
        )
    finally:
        integ._CHAIN_MIN_ROWS, integ._CHAIN_DIV = orig_min, orig_div

    assert int(rays_flat) == int(rays_lad)  # EXACT segment-count parity
    np.testing.assert_allclose(
        np.asarray(buf_lad.color), np.asarray(buf_flat.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(buf_lad.depth), np.asarray(buf_flat.depth), atol=2e-5
    )


def test_chain_ladder_scheduler_exact_under_jit():
    """Round-5 regression: the compaction ladder's permutation updated
    src/rows through x.at[:sz].set(x[:sz][order]) — a gather whose
    operand is the update target.  Under jit, XLA aliased the buffers
    and corrupted the permutation from the SECOND compaction on (eager
    was exact, so every eager test passed while 1024² jitted renders
    mis-tracked ~25% of pixels).  This drives the scheduler with a
    deterministic toy trip at multi-compaction scale UNDER JIT and
    asserts exact per-lane bookkeeping."""
    import jax

    import tpupt.render.integrator as integ
    from tpupt.accel.packets import PACKET

    np_ = 256
    n = np_ * PACKET
    rng = np.random.default_rng(0)
    demand = (
        rng.integers(1, 9, size=(np_, 1))
        + rng.integers(0, 3, size=(np_, PACKET))
    ).reshape(-1).astype(np.int32)

    def trip(c):
        active = ~c["done"]
        segs = c["segs"] + active.astype(jnp.int32)
        done = c["done"] | (segs >= c["dem"])
        return dict(done=done, segs=segs, pix=c["pix"], dem=c["dem"])

    carry = dict(
        done=jnp.zeros(n, bool),
        segs=jnp.zeros(n, jnp.int32),
        pix=jnp.arange(n, dtype=jnp.int32),
        dem=jnp.asarray(demand),
    )
    out = jax.jit(
        lambda c: integ._run_chain_ladder(c, trip, np_, int(demand.max()))
    )(carry)
    np.testing.assert_array_equal(np.asarray(out["segs"]), demand)
    np.testing.assert_array_equal(np.asarray(out["pix"]), np.arange(n))


def test_chain_ladder_matches_flat_under_jit(full_scene, camera):
    """The real render through the ladder UNDER JIT (the production
    path; the eager variant above compiles per-op and dodged the
    aliasing miscompile)."""
    import functools

    import jax

    import tpupt.render.integrator as integ

    w = h = 64
    fn = jax.jit(functools.partial(
        render_image, width=w, height=h, spp=3, max_bounces=6
    ))
    buf_flat, rays_flat = fn(full_scene, camera)

    orig_min, orig_div = integ._CHAIN_MIN_ROWS, integ._CHAIN_DIV
    integ._CHAIN_MIN_ROWS, integ._CHAIN_DIV = 2, 2
    try:
        fn2 = jax.jit(functools.partial(
            render_image, width=w, height=h, spp=3, max_bounces=6
        ))
        buf_lad, rays_lad = fn2(full_scene, camera)
    finally:
        integ._CHAIN_MIN_ROWS, integ._CHAIN_DIV = orig_min, orig_div

    assert int(rays_flat) == int(rays_lad)
    np.testing.assert_allclose(
        np.asarray(buf_lad.color), np.asarray(buf_flat.color), atol=2e-5
    )
