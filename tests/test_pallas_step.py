"""Parity of the hand-tiled Pallas sweep-step kernel (interpret mode on
CPU; the measured TPU comparison vs the XLA fused step is in DESIGN.md
round 4 — a recorded NEGATIVE result, kept as the experimental record
with this test guarding its correctness claims)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpupt.accel.packets import (
    BIG, _comp, _dense_mt, _winner_reduce,
)
from tpupt.accel import pallas_step
import tpupt.core.math3d as m3
from tpupt.scene.description import SceneDescription
from tpupt.scene.procedural import icosphere


def _scene():
    v, f = icosphere(2)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.eye(4), "m")
    d.add_mesh_object("mesh", np.asarray(m3.mat_translate([1.5, 0, -1])), "m")
    return d.build()


def test_pallas_step_matches_xla_winner_reduce():
    scene = _scene()
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]
    sz, P, R = 16, 256, 2
    RL = R * L

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # aim rays at the origin so plenty of pairs hit
    ro3 = jax.random.uniform(k1, (sz, P, 3), minval=-2, maxval=2)
    rd3 = -ro3 / jnp.linalg.norm(ro3, axis=-1, keepdims=True)
    rows = dict(
        rox=ro3[..., 0], roy=ro3[..., 1], roz=ro3[..., 2],
        rdx=rd3[..., 0], rdy=rd3[..., 1], rdz=rd3[..., 2],
        tmin=jnp.full((sz, P), 1e-3),
        t=jnp.full((sz, P), BIG),
    )
    tids = jax.random.randint(k3, (sz,), 0, K)
    iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]
    blocks, slots = [], []
    for ri in range(R):
        tid = (tids + ri * 131) % K
        blocks.append(scene.tre_tris[tid])
        slots.append(tid[:, None] * L + iota_l)
    slot_pairs = jnp.concatenate(slots, axis=1)
    live = jnp.ones((sz, RL), bool)

    ok, t = _dense_mt(scene, blocks, rows, live, L)
    ref = _winner_reduce(jnp.where(ok, t, BIG), blocks, L, slot_pairs)

    comps = jnp.stack([_comp(blocks, c, L)[:, :, 0] for c in range(13)], axis=1)
    out = pallas_step.winner_step_pallas(
        rows, comps, live.astype(jnp.float32), slot_pairs, interpret=True
    )

    got = np.asarray(ref[0]) < BIG
    assert got.sum() > 200, "test inputs must produce plenty of hits"
    # winner identity is exact; t may differ by FMA-contraction ulps
    # between the two programs (the test_chained.py caveat)
    np.testing.assert_array_equal(np.asarray(out[0] < BIG), got)
    np.testing.assert_allclose(
        np.asarray(out[0])[got], np.asarray(ref[0])[got], rtol=1e-6
    )
    for i in (1, 2, 3, 4, 5):  # slot, nx, ny, nz, obj
        np.testing.assert_array_equal(
            np.asarray(out[i])[got], np.asarray(ref[i])[got]
        )
