"""Residual-save cost probe (VERDICT r3 #4, the 'misc'/saves bucket).

The fwd+bwd profile shows ~26 dynamic_update_slice ops of (8, 1M)
buffers at ~113 us per row write — ~68 MB of traffic for a 4 MB row,
i.e. XLA is NOT updating the stacked-residual buffers in place under
the checkpoint+scan combination (a full copy per step per channel:
~116 ms of the 928 ms step, 13%).

This probe isolates scan-ys stacking cost from everything else:

  plain      scan emitting C (N,) f32 ys per step (stacked (T, N))
  remat      the same with jax.checkpoint(save_only_these_names) on the
             body and the ys tagged as saved residuals, consumed by a
             trivial grad — the production structure
  carry_dus  a scan whose CARRY holds the (T, N) buffers and writes row
             b by dynamic_update_slice — the manual alternative

Usage: python experiments/prof_saves.py [--n 1048576 --t 8 --c 26]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--c", type=int, default=26)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.ad_checkpoint import checkpoint_name
    from functools import partial

    from tpupt.utils.cache import setup_compile_cache
    setup_compile_cache("bench")

    N, T, C = args.n, args.t, args.c

    def step_vals(x, b):
        # C distinct cheap (N,) values derived from the carry
        return [x * (1.0 + 0.01 * i) + b.astype(jnp.float32) for i in range(C)]

    @jax.jit
    def plain(x):
        def body(x, b):
            vals = step_vals(x, b)
            return x * 0.999 + vals[0] * 1e-6, tuple(vals)
        x, ys = lax.scan(body, x, jnp.arange(T, dtype=jnp.int32))
        return x + sum(y[0].sum() * 0.0 for y in ys), ys

    @jax.jit
    def remat(x):
        policy = jax.checkpoint_policies.save_only_these_names("res")

        def loss(x):
            @partial(jax.checkpoint, policy=policy)
            def body(c, b):
                vals = [checkpoint_name(v, "res") for v in step_vals(c, b)]
                # consume the residuals nontrivially so the backward needs them
                out = c * 0.999
                for v in vals:
                    out = out + jnp.tanh(v) * 1e-6
                return out, None
            c, _ = lax.scan(body, x, jnp.arange(T, dtype=jnp.int32))
            return c.sum()

        return jax.grad(loss)(x)

    @jax.jit
    def carry_dus(x):
        bufs = tuple(jnp.zeros((T, N)) for _ in range(C))

        def body(carry, b):
            x, bufs = carry
            vals = step_vals(x, b)
            bufs = tuple(
                lax.dynamic_update_slice(buf, v[None], (b, 0))
                for buf, v in zip(bufs, vals)
            )
            return (x * 0.999, bufs), None

        (x, bufs), _ = lax.scan(body, (x, bufs), jnp.arange(T, dtype=jnp.int32))
        return x + sum(b[0, 0] * 0.0 for b in bufs), bufs

    @jax.jit
    def plain2d(x):
        # ys emitted as (N/128, 128) 2D slabs: the stacked (T, N/128, 128)
        # buffer tiles over the LAST TWO dims, so a step's row write is
        # whole tiles (no sublane RMW) — probing whether the 1D (T, N)
        # layout is what makes stacking cost ~25x the 4 MB write
        def body(x, b):
            vals = step_vals(x, b)
            return (
                x * 0.999 + vals[0] * 1e-6,
                tuple(v.reshape(N // 128, 128) for v in vals),
            )
        x, ys = lax.scan(body, x, jnp.arange(T, dtype=jnp.int32))
        return x + sum(y[0, 0, 0] * 0.0 for y in ys), ys

    @jax.jit
    def remat2d(x):
        policy = jax.checkpoint_policies.save_only_these_names("res")

        def loss(x):
            @partial(jax.checkpoint, policy=policy)
            def body(c, b):
                vals = [
                    checkpoint_name(v.reshape(N // 128, 128), "res").reshape(N)
                    for v in step_vals(c, b)
                ]
                out = c * 0.999
                for v in vals:
                    out = out + jnp.tanh(v) * 1e-6
                return out, None
            c, _ = lax.scan(body, x, jnp.arange(T, dtype=jnp.int32))
            return c.sum()

        return jax.grad(loss)(x)

    @jax.jit
    def packed2d(x):
        # ONE (C, N/128, 128) ys per step instead of C separate buffers
        def body(x, b):
            vals = step_vals(x, b)
            return (
                x * 0.999 + vals[0] * 1e-6,
                jnp.stack([v.reshape(N // 128, 128) for v in vals]),
            )
        x, ys = lax.scan(body, x, jnp.arange(T, dtype=jnp.int32))
        return x + ys[0, 0, 0, 0] * 0.0, ys

    x0 = jnp.linspace(0, 1, N, dtype=jnp.float32)
    for name, fn in (("plain    ", plain), ("remat    ", remat),
                     ("carry_dus", carry_dus), ("plain2d  ", plain2d),
                     ("remat2d  ", remat2d), ("packed2d ", packed2d)):
        out = jax.block_until_ready(fn(x0))
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(x0))
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(leaf.reshape(-1)[0])  # host fetch fences the relay
            best = min(best, time.perf_counter() - t0)
        bw = C * T * N * 4 / best / 1e9
        print(f"{name}: {best*1e3:8.2f} ms  ({bw:6.0f} GB/s of pure-row-write bound)")


if __name__ == "__main__":
    main()
