"""TPUPT_DEBUG=1 sanitizer mode (SURVEY.md §5): targeted NaN guards on
bounce outputs + checkify index checks, discharged by checked_jit."""

import os

import numpy as np
import pytest

import tpupt.core.math3d as m3
from tpupt.core.camera import make_camera
from tpupt.render.progressive import PathTracer
from tpupt.scene.description import SceneDescription


def _scene(albedo=(0.5, 0.5, 0.5)):
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=albedo)
    d.add_sphere(0.5, np.asarray(m3.mat_translate([0, 0, -1])), "m")
    return d.build()


def test_debug_mode_catches_nan_material(monkeypatch):
    monkeypatch.setenv("TPUPT_DEBUG", "1")
    scene = _scene(albedo=(float("nan"), 0.5, 0.5))
    tracer = PathTracer(scene, (16, 16), max_bounces=3)
    with pytest.raises(Exception, match="non-finite"):
        tracer.path_trace(make_camera(vfov=np.pi / 2))


def test_debug_mode_clean_scene_passes(monkeypatch):
    monkeypatch.setenv("TPUPT_DEBUG", "1")
    tracer = PathTracer(_scene(), (16, 16), max_bounces=3)
    rays = tracer.path_trace(make_camera(vfov=np.pi / 2))
    assert rays > 0


def test_debug_mode_off_ignores_nan(monkeypatch):
    """Without the env var the guards must cost nothing and not raise —
    the render silently carries the NaN (reference behavior: no device
    sanitizer at all)."""
    monkeypatch.delenv("TPUPT_DEBUG", raising=False)
    scene = _scene(albedo=(float("nan"), 0.5, 0.5))
    tracer = PathTracer(scene, (16, 16), max_bounces=3)
    rays = tracer.path_trace(make_camera(vfov=np.pi / 2))
    assert rays > 0
