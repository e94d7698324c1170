import numpy as np

from tpupt.render.integrator import trace_sample
from tpupt.render.wavefront import trace_sample_wavefront

W = H = 32


def test_wavefront_matches_megakernel(full_scene, camera):
    """Compaction is a pure permutation + global-pixel RNG keys, so the two
    modes must agree bit for bit (the reference's two modes do NOT — its
    streaming RNG keys off compacted lane indices, path_tracer.cu:298)."""
    c1, n1, d1, r1 = trace_sample(full_scene, camera, W, H, 2, max_bounces=6)
    c2, n2, d2, r2 = trace_sample_wavefront(full_scene, camera, W, H, 2, max_bounces=6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert int(r1) == int(r2)


def test_wavefront_rr(sphere_scene, camera):
    c1, _, _, _ = trace_sample(sphere_scene, camera, W, H, 0, max_bounces=8, rr_start=2)
    c2, _, _, _ = trace_sample_wavefront(
        sphere_scene, camera, W, H, 0, max_bounces=8, rr_start=2
    )
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
