"""Multi-chip / multi-host tile sharding.

The reference is strictly single-GPU (SURVEY.md §2.5: no NCCL/MPI, no
multi-device anything).  The TPU-native scaling design (BASELINE north
star) shards the *image* across chips and replicates the *scene*:

  * the image is split into horizontal row bands, one per device on a
    1-axis ``tiles`` mesh (`shard_map` over ``jax.sharding.Mesh``);
  * every device traces its band with the same replicated SceneArrays —
    no communication at all during the forward bounce sweep;
  * RNG and camera math key off *global* pixel indices
    (integrator._init_paths ``row0``), so the sharded render is
    bit-identical to the single-device one — the invariant
    tests/test_sharding.py enforces;
  * for training steps, per-tile losses and scene-parameter gradients are
    `psum`'d over the mesh axis (riding ICI within a slice; DCN across
    hosts when the mesh spans `jax.distributed` processes).

Multi-host entry: call `init_distributed()` on every host, then build the
mesh from `jax.devices()` (all chips in the slice) exactly as single-host
code does — shard_map + psum are topology-agnostic.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpupt.core.types import Camera, RenderBuffers, SceneArrays
from tpupt.diff.params import extract_params, with_params
from tpupt.dist.bootstrap import init_distributed  # noqa: F401  (re-export)
from tpupt.render.integrator import MAX_BOUNCES_DEFAULT, render_image


def make_tile_mesh(n_tiles: int | None = None) -> Mesh:
    """1-axis ``tiles`` mesh over the first ``n_tiles`` devices (all by
    default)."""
    devices = jax.devices()
    n = len(devices) if n_tiles is None else int(n_tiles)
    if n > len(devices):
        raise ValueError(f"requested {n} tiles but only {len(devices)} devices")
    return Mesh(np.asarray(devices[:n]), ("tiles",))


def _band_layout(height: int, mesh: Mesh) -> tuple[int, int]:
    n = int(mesh.devices.size)
    if height % n:
        raise ValueError(
            f"image height {height} not divisible by {n} mesh tiles"
        )
    return n, height // n


def render_image_sharded(
    scene: SceneArrays,
    camera: Camera,
    width: int,
    height: int,
    spp: int = 1,
    mesh: Mesh | None = None,
    max_bounces: int = MAX_BOUNCES_DEFAULT,
    rr_start: int | None = None,
    start_iteration: int = 0,
    chain_samples: bool = True,
):
    """Tile-sharded progressive render.

    Returns (RenderBuffers, total_rays) exactly like
    `render_image` — but with color/normal/depth laid out as
    device-sharded arrays over the row-band mesh (concatenating the bands
    reproduces the single-device row-major image bit-for-bit).
    """
    mesh = make_tile_mesh() if mesh is None else mesh
    n, rows_per = _band_layout(height, mesh)
    row0s = jnp.arange(n, dtype=jnp.int32) * rows_per

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("tiles")),
        out_specs=(P("tiles"), P("tiles"), P("tiles"), P()),
    )
    def run(scene, camera, row0):
        buffers, rays = render_image(
            scene,
            camera,
            width,
            height,
            spp,
            max_bounces=max_bounces,
            rr_start=rr_start,
            start_iteration=start_iteration,
            row0=row0[0],
            rows=rows_per,
            chain_samples=chain_samples,
        )
        return buffers.color, buffers.normal, buffers.depth, lax.psum(rays, "tiles")

    color, normal, depth, rays = run(scene, camera, row0s)
    buffers = RenderBuffers(
        color=color,
        normal=normal,
        depth=depth,
        iteration=jnp.asarray(start_iteration + spp, jnp.int32),
    )
    return buffers, rays


def render_loss_and_grads_sharded(
    scene: SceneArrays,
    camera: Camera,
    target,
    width: int,
    height: int,
    spp: int = 1,
    mesh: Mesh | None = None,
    max_bounces: int = MAX_BOUNCES_DEFAULT,
    rr_start: int | None = None,
    overlap_grad_psum: bool = True,
):
    """One sharded fwd+bwd step: every tile renders its band
    (differentiable path), takes the squared-error loss against its slice
    of ``target`` (flat (W*H, 3), row-major), and the scene-parameter
    gradients are all-reduced over the mesh axis.

    ``overlap_grad_psum``: all-reduce each bounce's parameter cotangents
    INSIDE the backward scan (diff/overlap.py) so the collectives overlap
    the backward sweep, instead of one idle-compute psum at the end (the
    BASELINE north-star pattern).  Either way the grads equal the
    single-device render's (tests/test_sharding.py).

    Returns (global loss scalar, grads pytree matching
    `tpupt.diff.params.extract_params(scene)`).
    """
    mesh = make_tile_mesh() if mesh is None else mesh
    n, rows_per = _band_layout(height, mesh)
    row0s = jnp.arange(n, dtype=jnp.int32) * rows_per
    params = extract_params(scene)

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("tiles"), P("tiles")),
        out_specs=(P(), P()),
    )
    def step(scene, params, camera, target_tile, row0):
        def loss_fn(params):
            s = with_params(scene, params)
            buffers, _ = render_image(
                s,
                camera,
                width,
                height,
                spp,
                max_bounces=max_bounces,
                rr_start=rr_start,
                differentiable=True,
                row0=row0[0],
                rows=rows_per,
                # the axis is required either way (the replicated scene's
                # backward cotangent accumulators need the owning pcast —
                # trace_sample docstring); overlap picks the placement
                grad_psum_axis="tiles",
                grad_psum_overlap=overlap_grad_psum,
            )
            return jnp.sum((buffers.color - target_tile) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # per-tile partial sums -> global: loss is tile-varying; the
        # parameter cotangents are either psum'd per bounce inside the
        # backward scan (overlap_grad_psum) or by shard_map's own AD under
        # the VMA rules — so only loss needs an explicit psum here.
        return lax.psum(loss, "tiles"), grads

    return step(scene, params, camera, jnp.asarray(target), row0s)
