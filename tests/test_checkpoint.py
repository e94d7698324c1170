"""Checkpoint/resume of progressive accumulation (SURVEY.md §5 aux —
the reference keeps state in-memory only)."""

import numpy as np
import pytest

from tpupt.render.progressive import PathTracer


def test_checkpoint_roundtrip(sphere_scene, camera, tmp_path):
    path = str(tmp_path / "ckpt.npz")
    pt = PathTracer(sphere_scene, (16, 16), max_bounces=3)
    for _ in range(3):
        pt.path_trace(camera)
    pt.save_checkpoint(path)
    ref = np.asarray(pt.buffers.color)

    pt2 = PathTracer(sphere_scene, (16, 16), max_bounces=3)
    pt2.load_checkpoint(path)
    assert pt2.iteration == 3
    np.testing.assert_array_equal(np.asarray(pt2.buffers.color), ref)

    # resumed accumulation == uninterrupted accumulation (same RNG streams)
    pt.path_trace(camera)
    pt2.path_trace(camera)
    np.testing.assert_array_equal(
        np.asarray(pt2.buffers.color), np.asarray(pt.buffers.color)
    )


def test_checkpoint_resolution_mismatch(sphere_scene, camera, tmp_path):
    path = str(tmp_path / "ckpt.npz")
    pt = PathTracer(sphere_scene, (16, 16), max_bounces=2)
    pt.path_trace(camera)
    pt.save_checkpoint(path)
    pt_other = PathTracer(sphere_scene, (8, 8), max_bounces=2)
    with pytest.raises(ValueError, match="resolution"):
        pt_other.load_checkpoint(path)
