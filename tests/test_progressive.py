"""PathTracer engine tests (the interactive-app capability surface:
progressive accumulation, restart, resize, display buffers, denoise —
SURVEY.md §2.3 mapped to library API)."""

import numpy as np

from tpupt.render.integrator import render_image
from tpupt.render.progressive import PathTracer


def test_progressive_equals_batch(sphere_scene, camera):
    w = h = 32
    pt = PathTracer(sphere_scene, (w, h), max_bounces=4)
    for _ in range(3):
        pt.path_trace(camera)
    assert pt.iteration == 3
    buf, _ = render_image(sphere_scene, camera, w, h, 3, max_bounces=4)
    np.testing.assert_allclose(
        np.asarray(pt.buffers.color), np.asarray(buf.color), atol=1e-5
    )


def test_chunked_equals_per_sample(sphere_scene, camera):
    """path_trace_many (the CLI's chained fast path) continues the same
    progressive average as per-sample path_trace calls: exact ray counts,
    pixels at amplified-ulp tolerance (tests/test_chained.py docstring),
    across chunk boundaries and mixed with single steps."""
    w = h = 32
    pt_a = PathTracer(sphere_scene, (w, h), max_bounces=4)
    rays_a = sum(pt_a.path_trace(camera) for _ in range(5))

    pt_b = PathTracer(sphere_scene, (w, h), max_bounces=4)
    rays_b = pt_b.path_trace(camera)  # single step first: it0 > 0 merge
    rays_b += pt_b.path_trace_many(camera, 3)
    rays_b += pt_b.path_trace_many(camera, 1)
    assert pt_b.iteration == 5
    assert rays_a == rays_b  # EXACT ray-count parity
    np.testing.assert_allclose(
        np.asarray(pt_a.buffers.color), np.asarray(pt_b.buffers.color),
        atol=2e-4,
    )


def test_restart_and_resize(sphere_scene, camera):
    pt = PathTracer(sphere_scene, (16, 16), max_bounces=2)
    pt.path_trace(camera)
    pt.restart()
    assert pt.iteration == 0
    assert np.asarray(pt.buffers.color).max() == 0
    pt.resize_image((8, 4))
    pt.path_trace(camera)
    assert pt.display("final").shape == (4, 8, 3)


def test_max_iterations_cap(sphere_scene, camera):
    pt = PathTracer(sphere_scene, (8, 8), max_bounces=2)
    pt.max_iterations = 2
    for _ in range(5):
        pt.path_trace(camera)
    assert pt.iteration == 2


def test_display_buffers(sphere_scene, camera):
    pt = PathTracer(sphere_scene, (16, 16), max_bounces=2)
    pt.path_trace(camera)
    for b in ("final", "color", "normal", "depth"):
        img = pt.display(b)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_denoise_switches_final(sphere_scene, camera):
    pt = PathTracer(sphere_scene, (16, 16), max_bounces=3)
    pt.path_trace(camera)
    raw = pt.display("final").copy()
    pt.denoise(camera)
    dn = pt.display("final")
    assert (raw != dn).any()
    # a new sample invalidates the denoised buffer (reference swaps back
    # to the accumulator until denoise runs again)
    pt.path_trace(camera)
    assert (pt.display("final") != dn).any()
