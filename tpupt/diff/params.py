"""Differentiable-parameter extraction.

Splits a SceneArrays into the float leaves gradients make sense for
(materials, background "light", sphere geometry, mesh vertex positions) so
optimizers and shard_map'd grad steps work over a clean all-float pytree —
no `allow_int` plumbing, no float0 cotangents crossing collectives.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core.types import SceneArrays

PARAM_LEAVES = (
    "sphere_center",
    "sphere_radius",
    "positions",
    "bg_down",
    "bg_up",
)
# emission included: light radiance is a first-class optimizer parameter
# and (since nee_emission was removed) its gradient covers the NEE term
MATERIAL_LEAVES = ("albedo", "fuzz", "ior", "emission")


def extract_params(scene: SceneArrays) -> dict:
    p = {name: getattr(scene, name) for name in PARAM_LEAVES}
    p["materials"] = {n: getattr(scene.materials, n) for n in MATERIAL_LEAVES}
    return p


def with_params(scene: SceneArrays, params: dict) -> SceneArrays:
    mats = scene.materials.replace(**params["materials"])
    rest = {k: v for k, v in params.items() if k != "materials"}
    return scene.replace(materials=mats, **rest)
