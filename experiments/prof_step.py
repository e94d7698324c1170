"""Sweep-step microbenchmark: where do the Gpairs/s go?

The production sweep step (gather + dense MT + variadic winner reduce)
runs at ~60 Gpairs/s — ~10% of what the same f32 elementwise chains hit
on the VPU.  This isolates the step at production shapes and times
variants that differ ONLY in the winner-selection structure:

  mt_only   MT chain + plain jnp.min over the pair axis (no winner id,
            no payload) — the ceiling of the fused MT+reduce design
  t_slot    2-channel variadic reduce (t, slot): winner id, no payload
  prod      6-channel production reduce (t, slot, nx, ny, nz, obj)
  prod_comm same, with an explicit lexicographic tie term making the
            combiner COMMUTATIVE — if XLA serializes non-commutative
            tuple reduces into a linear dependency chain, this unlocks
            tree reduction (the advisor's r2 tie-break note, inverted)
  diff      15-channel reduce (the differentiable path's payload)

Usage: python experiments/prof_step.py [--sz 2048] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sz", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    from tpupt.accel.packets import BIG, FETCH_R, MOLLER_EPS, _comp
    import __graft_entry__ as ge

    scene, camera = ge._flagship_scene(mesh_subdiv=4)
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]
    sz, P, R = args.sz, 256, FETCH_R
    RL = R * L

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    rox = jax.random.uniform(k1, (sz, P), minval=-2, maxval=2)
    rd = jax.random.normal(k2, (3, sz, P))
    rows = dict(
        rox=rox, roy=rox * 0.5, roz=rox - 2.0,
        rdx=rd[0], rdy=rd[1], rdz=rd[2],
        tmin=jnp.full((sz, P), 1e-3),
        t=jnp.full((sz, P), BIG),
    )
    tids0 = jax.random.randint(k3, (sz,), 0, K)

    def mt(blocks, r, live_pairs):
        p0x, p0y, p0z = _comp(blocks, 0, L), _comp(blocks, 1, L), _comp(blocks, 2, L)
        e1x, e1y, e1z = _comp(blocks, 3, L), _comp(blocks, 4, L), _comp(blocks, 5, L)
        e2x, e2y, e2z = _comp(blocks, 6, L), _comp(blocks, 7, L), _comp(blocks, 8, L)
        ox, oy, oz = r["rox"][:, None, :], r["roy"][:, None, :], r["roz"][:, None, :]
        dx, dy, dz = r["rdx"][:, None, :], r["rdy"][:, None, :], r["rdz"][:, None, :]
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / jnp.where(jnp.abs(a) < MOLLER_EPS, 1.0, a)
        sx, sy, sz_ = ox - p0x, oy - p0y, oz - p0z
        u = f * (sx * hx + sy * hy + sz_ * hz)
        qx = sy * e1z - sz_ * e1y
        qy = sz_ * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= MOLLER_EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= r["tmin"][:, None, :]) & (t <= r["t"][:, None, :])
            & live_pairs[:, :, None]
        )
        return jnp.where(ok, t, BIG)

    iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]

    def fetch(r, i):
        tids = (tids0 + i * 7919) % K
        blocks, slots = [], []
        for ri in range(R):
            tid = (tids + ri * 131) % K
            blocks.append(scene.tre_tris[tid])
            slots.append(tid[:, None] * L + iota_l)
        return blocks, jnp.concatenate(slots, axis=1)

    def make_loop(reduce_fn):
        def run(r):
            def body(i, t_acc):
                blocks, slot_pairs = fetch(r, i)
                live = jnp.ones((sz, RL), bool)
                t_masked = mt(blocks, r, live)
                out = reduce_fn(t_masked, blocks, slot_pairs)
                acc = jnp.minimum(t_acc, out[0])
                # keep every payload output live against DCE (one cheap
                # elementwise op per channel, negligible next to the MT)
                for o in out[1:]:
                    acc = acc + o.astype(jnp.float32) * 0.0
                return acc
            return lax.fori_loop(0, args.steps, body, jnp.full((sz, P), BIG))
        return jax.jit(run)

    def red_mt_only(t_masked, blocks, slot_pairs):
        return (jnp.min(t_masked, axis=1),)

    def var_reduce(t_masked, blocks, slot_pairs, nchan, commutative):
        shape = t_masked.shape
        jb = jnp.broadcast_to(slot_pairs[:, :, None], shape)
        comps = [9, 10, 11, 12, 0, 1, 2, 3, 4, 5, 6, 7, 8][: max(nchan - 2, 0)]
        ops = (t_masked, jb) + tuple(
            jnp.broadcast_to(_comp(blocks, c, L), shape) for c in comps
        )
        inits = (BIG, jnp.int32(0)) + tuple(jnp.float32(0.0) for _ in comps)

        def comb(a, b):
            if commutative:
                take_b = (b[0] < a[0]) | ((b[0] == a[0]) & (b[1] < a[1]))
            else:
                take_b = b[0] < a[0]
            return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

        return lax.reduce(ops, inits, comb, dimensions=(1,))

    variants = {
        "mt_only  ": make_loop(red_mt_only),
        "t_slot   ": make_loop(lambda t, b, s: var_reduce(t, b, s, 2, False)),
        "prod     ": make_loop(lambda t, b, s: var_reduce(t, b, s, 6, False)),
        "prod_comm": make_loop(lambda t, b, s: var_reduce(t, b, s, 6, True)),
        "diff     ": make_loop(lambda t, b, s: var_reduce(t, b, s, 15, False)),
    }
    pairs = args.sz * P * RL * args.steps
    for name, fn in variants.items():
        out = jax.block_until_ready(fn(rows))
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(rows))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:7.2f} ms  {pairs/best/1e9:7.1f} Gpairs/s")


if __name__ == "__main__":
    main()
