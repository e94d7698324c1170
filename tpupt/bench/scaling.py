"""Scaling-efficiency measurement on a virtual CPU device mesh.

Real multi-chip hardware isn't available in this environment (one TPU
chip behind a relay), so the sharded code path is *validated* and its
overheads *bounded* on an N-virtual-device CPU mesh
(`--xla_force_host_platform_device_count`).  Two honesty caveats, printed
with the numbers:

  * the virtual devices share the host's physical cores, so wall-clock
    efficiency is capped at ~n_cores/n_devices — the number measures the
    sharding machinery's overhead (dispatch, layout, collectives), NOT
    real-chip scaling;
  * the meaningful hardware-independent checks are exactness (sharded ==
    single-device renders/grads, tests/test_sharding.py +
    tests/test_multihost.py) and collective placement (per-bounce psum
    inside the backward scan, diff/overlap.py).

Run standalone (it must own the process before jax initializes):
    python -m tpupt.bench.scaling [n_devices]
Prints one JSON line; bench.py --all shells out to it.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("scaling")

    import jax.numpy as jnp

    sys.path.insert(0, os.getcwd())
    import __graft_entry__ as ge
    from tpupt.dist.sharding import (
        make_tile_mesh,
        render_image_sharded,
        render_loss_and_grads_sharded,
    )
    from tpupt.render.integrator import render_image

    scene, camera = ge._flagship_scene(mesh_subdiv=2)
    size, spp, mb = 256, 1, 4

    def timed(fn, iters=3):
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters, out

    import functools

    f1 = jax.jit(functools.partial(render_image, width=size, height=size,
                                   spp=spp, max_bounces=mb))
    t1, (buf1, rays1) = timed(lambda: f1(scene, camera))

    mesh = make_tile_mesh(n)
    tn, (bufn, raysn) = timed(
        lambda: render_image_sharded(scene, camera, size, size, spp, mesh,
                                     max_bounces=mb)
    )

    # fwd+bwd with and without the per-bounce overlapped grad psum
    target = jnp.zeros((size * size, 3))
    t_overlap, _ = timed(
        lambda: render_loss_and_grads_sharded(
            scene, camera, target, size, size, spp, mesh, max_bounces=mb,
            overlap_grad_psum=True,
        ),
        iters=2,
    )
    t_posthoc, _ = timed(
        lambda: render_loss_and_grads_sharded(
            scene, camera, target, size, size, spp, mesh, max_bounces=mb,
            overlap_grad_psum=False,
        ),
        iters=2,
    )

    eff = (int(raysn) / tn) / (int(rays1) / t1) / n
    print(json.dumps({
        "devices": n,
        "physical_cores": os.cpu_count(),
        "single_dev_mrays": round(int(rays1) / t1 / 1e6, 3),
        "sharded_mrays": round(int(raysn) / tn / 1e6, 3),
        "efficiency_virtual": round(eff, 4),
        "efficiency_ceiling_cores": round(os.cpu_count() / n, 4),
        "fwd_bwd_overlap_s": round(t_overlap, 4),
        "fwd_bwd_posthoc_s": round(t_posthoc, 4),
        "note": "virtual CPU mesh: devices share physical cores; "
                "measures sharding overhead, not chip scaling",
    }))


if __name__ == "__main__":
    main()
