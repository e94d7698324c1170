"""Multi-host (multi-process) distributed rendering tests.

BASELINE asks for >=90% linear scaling at >=2 hosts; the reference has
nothing distributed at all (SURVEY.md §2.5).  Real pod hardware isn't
available in CI, so this test exercises the REAL multi-host code path —
`jax.distributed.initialize` rendezvous (loopback coordinator), a global
mesh spanning two OS processes, shard_map + psum across the process
boundary — on the CPU backend, and checks the result against the
single-process reference computed by this (pytest) process.

The invariant matches tests/test_sharding.py: the sharded fwd+bwd step
produces the same loss/gradients regardless of how the mesh maps to
processes (RNG keys off global pixel indices only).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_processes: int, timeout: float = 900.0):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(num_processes), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(num_processes)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\nstdout:\n{out}\nstderr:\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["process_id"]] = r
    assert len(results) == num_processes, results
    return results


def _single_process_reference():
    """Same step in THIS process (8 virtual devices, conftest)."""
    import __graft_entry__ as ge
    from tpupt.dist.sharding import make_tile_mesh, render_loss_and_grads_sharded

    scene, camera = ge._flagship_scene(mesh_subdiv=1)
    width, height = 16, 16
    target = np.zeros((width * height, 3), np.float32)
    mesh = make_tile_mesh(8)
    loss, grads = render_loss_and_grads_sharded(
        scene, camera, target, width, height, spp=1, mesh=mesh, max_bounces=3
    )
    gnorm = float(
        np.sqrt(
            sum(
                float(np.sum(np.asarray(g, np.float64) ** 2))
                for g in jax.tree_util.tree_leaves(grads)
            )
        )
    )
    return float(loss), gnorm, np.asarray(grads["bg_up"])


@pytest.mark.slow
def test_two_process_fwd_bwd_matches_single_process():
    """2 OS processes x 4 devices == 1 process x 8 devices, through the
    real jax.distributed rendezvous."""
    results = _run_workers(2)
    ref_loss, ref_gnorm, ref_bg = _single_process_reference()

    for pid, r in results.items():
        assert r["devices"] == 8
        # same 8-device tile decomposition => same per-tile programs; loss
        # and psum'd grads agree to accumulated-rounding tolerance
        assert np.isclose(r["loss"], ref_loss, rtol=1e-5), (r["loss"], ref_loss)
        assert np.isclose(r["gnorm"], ref_gnorm, rtol=1e-4), (r["gnorm"], ref_gnorm)
        np.testing.assert_allclose(r["bg_up"], ref_bg, rtol=1e-4, atol=1e-6)

    # both processes observe identical replicated outputs
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["gnorm"] == results[1]["gnorm"]
