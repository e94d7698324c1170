"""Inverse rendering: fit scene parameters to a target image.

The capability BASELINE config 4 exercises — gradients w.r.t. materials
(and optionally background light / geometry) through the renderer and the
differentiable à-trous denoiser.  The reference has no analogue (CUDA
forward renderer only); this is the "differentiable" in
"TPU-native differentiable path tracer".
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from tpupt.core.types import Camera, SceneArrays
from tpupt.denoise.atrous import atrous_denoise
from tpupt.diff.params import extract_params, with_params
from tpupt.render.integrator import render_image
from tpupt.scene.bake import rebake_treelets


def render_loss(
    params: dict,
    scene: SceneArrays,
    camera: Camera,
    target: jnp.ndarray,  # (H*W, 3)
    width: int,
    height: int,
    spp: int,
    max_bounces: int,
    denoise: bool,
    rebake: bool,
) -> jnp.ndarray:
    scene = with_params(scene, params)
    if rebake:
        # vertex positions / transforms changed -> refresh the world-baked
        # treelet table the packet intersector traces against
        scene = rebake_treelets(scene)
    buf, _ = render_image(
        scene, camera, width, height, spp,
        max_bounces=max_bounces, differentiable=True,
    )
    img = buf.color
    if denoise:
        img = atrous_denoise(
            buf.color.reshape(height, width, 3),
            buf.normal.reshape(height, width, 3),
            buf.depth.reshape(height, width),
            camera,
            filter_size=4,
        ).reshape(-1, 3)
    return jnp.mean((img - target) ** 2)


def fit_scene(
    scene: SceneArrays,
    camera: Camera,
    target: jnp.ndarray,  # (H*W, 3) linear-radiance target image
    width: int,
    height: int,
    steps: int = 100,
    learning_rate: float = 5e-2,
    spp: int = 1,
    max_bounces: int = 4,
    denoise: bool = False,
    fit_geometry: bool = False,
    param_filter: Iterable[str] | None = ("materials", "bg_down", "bg_up"),
    material_filter: Iterable[str] | None = None,
    callback: Callable[[int, float], None] | None = None,
):
    """Adam-optimize scene parameters toward ``target``.

    ``param_filter`` names the top-level parameter groups to optimize
    (others stay frozen); pass None for all.  ``material_filter``
    optionally restricts the "materials" group to named leaves (e.g.
    ("albedo", "emission")) — unconstrained Adam steps on ``ior`` can
    walk a dielectric through ior = -1 where Schlick's (1-ior)/(1+ior)
    divides by zero, NaN-ing the whole fit; freeze physical leaves you
    are not actually recovering.  ``fit_geometry=True`` adds
    sphere/vertex parameters and re-bakes the treelet table every step.

    Returns (fitted SceneArrays, list of losses).
    """
    params = extract_params(scene)
    if param_filter is not None:
        keys = set(param_filter)
        if fit_geometry:
            keys |= {"sphere_center", "sphere_radius", "positions"}
        frozen = {k: v for k, v in params.items() if k not in keys}
        params = {k: v for k, v in params.items() if k in keys}
    else:
        frozen = {}
    frozen_mats = {}
    if material_filter is not None and "materials" in params:
        mkeys = set(material_filter)
        frozen_mats = {
            k: v for k, v in params["materials"].items() if k not in mkeys
        }
        params["materials"] = {
            k: v for k, v in params["materials"].items() if k in mkeys
        }

    loss_fn = partial(
        render_loss,
        scene=scene,
        camera=camera,
        target=target,
        width=width,
        height=height,
        spp=spp,
        max_bounces=max_bounces,
        denoise=denoise,
        rebake=fit_geometry,
    )

    def merge(p):
        full = {**frozen, **p}
        if frozen_mats:
            full["materials"] = {**frozen_mats, **p["materials"]}
        return full

    def full_loss(p):
        return loss_fn(merge(p))

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def update(params, opt_state):
        loss, grads = jax.value_and_grad(full_loss)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = update(params, opt_state)
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1])

    fitted = with_params(scene, merge(params))
    if fit_geometry:
        fitted = rebake_treelets(fitted)
    return fitted, losses
