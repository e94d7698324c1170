"""Test configuration: force an 8-device virtual CPU platform *before* jax
initializes (SURVEY.md §4 / task requirement), so sharding tests exercise a
real multi-device mesh without TPU hardware.

NOTE: a site hook may pre-register an accelerator backend and override
JAX_PLATFORMS from the environment, so the platform is forced through
jax.config *after* import — that is authoritative at backend-init time."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from tpupt.utils.cache import setup_compile_cache
setup_compile_cache("tests")

import numpy as np
import pytest

import tpupt.core.math3d as m3
from tpupt.core.camera import make_camera
from tpupt.scene.description import SceneDescription
from tpupt.scene.procedural import icosphere


def T(t):
    return np.asarray(m3.mat_translate(t), np.float64)


def S(s):
    return np.asarray(m3.mat_scale(s), np.float64)


@pytest.fixture(scope="session")
def sphere_scene():
    """BASELINE config 1: single sphere + ground."""
    d = SceneDescription()
    d.add_material("ground", "lambertian", albedo=(0.8, 0.8, 0.0))
    d.add_material("blue", "lambertian", albedo=(0.1, 0.2, 0.5))
    d.add_sphere(100.0, T([0, -100.5, -1.0]), "ground")
    d.add_sphere(0.5, T([0, 0, -1.0]), "blue")
    return d.build()


@pytest.fixture(scope="session")
def full_scene():
    """All three material types + two mesh instances (multi-mesh pool)."""
    d = SceneDescription()
    d.add_material("ground", "lambertian", albedo=(0.8, 0.8, 0.0))
    d.add_material("blue", "lambertian", albedo=(0.1, 0.2, 0.5))
    d.add_material("glass", "dielectric", refraction_index=1.5)
    d.add_material("metal", "metal", albedo=(0.8, 0.6, 0.2), fuzz=0.3)
    d.add_sphere(100.0, T([0, -100.5, -1.0]), "ground")
    d.add_sphere(0.5, T([-1, 0, -1.0]), "glass")
    d.add_sphere(0.5, T([1, 0, -1.0]), "metal")
    v, f = icosphere(2)
    d.add_mesh("ico", v, f)
    d.add_mesh_object("ico", T([0, 0, -1.6]) @ S(0.6), "blue")
    v2, f2 = icosphere(1)
    d.add_mesh("ico1", v2, f2)
    d.add_mesh_object("ico1", T([0.3, 0.8, -2.2]) @ S(0.4), "metal")
    return d.build()


@pytest.fixture(scope="session")
def camera():
    return make_camera(vfov=np.pi / 2)
