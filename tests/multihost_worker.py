"""Worker process for tests/test_multihost.py.

Runs one of N jax.distributed processes (CPU platform, 4 virtual devices
per process), builds a GLOBAL tile mesh spanning every process, and runs
one sharded fwd+bwd step (render_loss_and_grads_sharded).  Prints a JSON
line with the loss and gradient fingerprints for the parent test to
compare against the single-process reference.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import json
import os
import sys

# 4 virtual CPU devices per process (before jax import)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])

    import jax

    # the site hook rewrites JAX_PLATFORMS; the config call is authoritative
    jax.config.update("jax_platforms", "cpu")

    # bootstrap import only — anything touching jax.numpy would initialize
    # the backend before the rendezvous and initialize() would raise
    from tpupt.dist.bootstrap import init_distributed

    init_distributed(f"127.0.0.1:{port}", num_processes, process_id)

    from tpupt.dist.sharding import make_tile_mesh, render_loss_and_grads_sharded
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == 4 * num_processes, (n_global, n_local)

    import numpy as np

    import __graft_entry__ as ge

    scene, camera = ge._flagship_scene(mesh_subdiv=1)
    width, height = 16, 16
    target = np.zeros((width * height, 3), np.float32)

    mesh = make_tile_mesh()  # spans all processes
    loss, grads = render_loss_and_grads_sharded(
        scene, camera, target, width, height, spp=1, mesh=mesh, max_bounces=3
    )
    jax.block_until_ready(loss)

    # grads are out_specs=P() (fully replicated): addressable everywhere
    import jax.numpy as jnp

    gnorm = jnp.sqrt(
        sum(jnp.sum(g.astype(jnp.float64) ** 2) for g in jax.tree_util.tree_leaves(grads))
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "process_id": process_id,
                "devices": n_global,
                "loss": float(loss),
                "gnorm": float(gnorm),
                "bg_up": [float(x) for x in np.asarray(grads["bg_up"])],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
