"""Benchmark the hand-tiled Pallas sweep step vs the XLA fused step.

Same harness as prof_step.py: production shapes (sz packets x p=256
lanes, R=FETCH_R fetches of L-leaf blocks), the gather in XLA either way;
only the dense MT + 6-channel winner selection differs:

  xla_prod     packets._winner_reduce (variadic lax.reduce) — production
  pallas TM=t  tpupt/accel/pallas_step.py at packet-block size t

Usage: python experiments/prof_pallas_step.py [--sz 2048] [--steps 32]
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
    ap.add_argument("--tms", type=int, nargs="*", default=[4, 8, 16])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    from tpupt.accel.packets import (
        BIG, FETCH_R, _comp, _dense_mt, _winner_reduce,
    )
    from tpupt.accel import pallas_step
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
    iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]

    def fetch(i):
        tids = (tids0 + i * 7919) % K
        blocks, slots = [], []
        for ri in range(R):
            tid = (tids + ri * 131) % K
            blocks.append(scene.tre_tris[tid])
            slots.append(tid[:, None] * L + iota_l)
        return blocks, jnp.concatenate(slots, axis=1)

    def consume(t_acc, out):
        acc = jnp.minimum(t_acc, out[0])
        for o in out[1:]:
            acc = acc + o.astype(jnp.float32) * 0.0
        return acc

    @jax.jit
    def run_xla(r):
        def body(i, t_acc):
            blocks, slot_pairs = fetch(i)
            live = jnp.ones((sz, RL), bool)
            ok, t = _dense_mt(scene, blocks, r, live, L)
            t_masked = jnp.where(ok, t, BIG)
            out = _winner_reduce(t_masked, blocks, L, slot_pairs)
            return consume(t_acc, out)
        return lax.fori_loop(0, args.steps, body, jnp.full((sz, P), BIG))

    def make_pallas(tm):
        @jax.jit
        def run(r):
            def body(i, t_acc):
                blocks, slot_pairs = fetch(i)
                comps = jnp.stack(
                    [_comp(blocks, c, L)[:, :, 0] for c in range(13)], axis=1
                )
                live = jnp.ones((sz, RL), jnp.float32)
                out = pallas_step.winner_step_pallas(
                    r, comps, live, slot_pairs, tm=tm
                )
                return consume(t_acc, out)
            return lax.fori_loop(0, args.steps, body, jnp.full((sz, P), BIG))
        return run

    variants = {"xla_prod ": run_xla}
    for tm in args.tms:
        variants[f"pallas_{tm:2d}"] = make_pallas(tm)

    pairs = args.sz * P * RL * args.steps
    for name, fn in variants.items():
        try:
            out = jax.block_until_ready(fn(rows))
        except Exception as e:  # record failures instead of dying
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")
            continue
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(rows))
            _ = float(out[0, 0])  # host fetch fences the relay (CLAUDE.md)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:7.2f} ms  {pairs/best/1e9:7.1f} Gpairs/s")


if __name__ == "__main__":
    main()
