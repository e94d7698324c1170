"""Microbenchmark: packet-sweep pair-test formulations on real TPU.

Measures the inner-loop cost of one treelet-visit step at production
shapes ((sz, L, p) pairs, gather included) for:

  mt          — current production Möller–Trumbore, component-SoA VPU math
  woop_elem   — Woop unit-triangle transform, elementwise (VPU)
  woop_mm2_*  — Woop via two batched dot_generals (K=4 origin, K=3 dir)
                at DEFAULT / HIGH / HIGHEST precision (MXU)
  woop_mm1_*  — Woop via one batched dot_general (K=8, 48L-wide table)
  fma_cal     — pure fma chain at the same element count (VPU roofline)

Each variant runs `STEPS` chained steps inside one jit (the axon relay
costs ~6 ms per dispatch, so per-step timing must amortize).  Results
print ns/pair and the projected full-sweep cost.

Run:  python experiments/prof_pair_test.py  (TPU; ~minutes of compiles,
persistent compile cache enabled)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tpupt.utils.cache import setup_compile_cache
setup_compile_cache("prof")

BIG = jnp.float32(3.0e38)
MOLLER_EPS = 1e-7
STEPS = 32
K = 464  # bunny treelet count at L=32


def make_tables(K, L, rng):
    """Random-but-sane treelet triangle blocks + Woop tables (f64 bake)."""
    p0 = rng.uniform(-2, 2, (K * L, 3))
    e1 = rng.uniform(-0.5, 0.5, (K * L, 3))
    e2 = rng.uniform(-0.5, 0.5, (K * L, 3))
    # MT table (K, 9L) component-major
    blk = np.stack([p0, e1, e2], axis=1).reshape(K, L, 9)
    tre_tris = blk.transpose(0, 2, 1).reshape(K, 9 * L).astype(np.float32)

    # Woop: W = inv([e1 e2 n]) rows, trans = -W @ p0
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)  # (KL, 3, 3) columns
    det = np.linalg.det(A)
    ok = np.abs(det) > 1e-30
    A_safe = np.where(ok[:, None, None], A, np.eye(3)[None])
    W = np.linalg.inv(A_safe)
    tr = -np.einsum("kij,kj->ki", W, p0)
    W = np.where(ok[:, None, None], W, 0.0)
    tr = np.where(ok[:, None], tr, np.array([0.0, 0.0, 1.0]))
    # woop12: (K, 3, L, 4) -> (K, 12L); row c,l = [W[c,:], tr[c]]
    w12 = np.concatenate([W, tr[:, :, None]], axis=2)  # (KL, 3, 4)
    w12 = w12.reshape(K, L, 3, 4).transpose(0, 2, 1, 3).reshape(K, 12 * L)
    # woop48: (K, 6, L, 8): o rows [W_c, tr_c, 0,0,0,0]; d rows [0,0,0,0, W_c, 0]
    w48 = np.zeros((K * L, 6, 8))
    w48[:, 0:3, 0:3] = W
    w48[:, 0:3, 3] = tr
    w48[:, 3:6, 4:7] = W
    w48 = w48.reshape(K, L, 6, 8).transpose(0, 2, 1, 3).reshape(K, 48 * L)
    return tre_tris, w12.astype(np.float32), w48.astype(np.float32)


def make_rays(sz, p, rng):
    ro = rng.uniform(-3, 3, (3, sz, p)).astype(np.float32)
    rd = rng.normal(size=(3, sz, p)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=0, keepdims=True)
    return dict(
        rox=jnp.asarray(ro[0]), roy=jnp.asarray(ro[1]), roz=jnp.asarray(ro[2]),
        rdx=jnp.asarray(rd[0]), rdy=jnp.asarray(rd[1]), rdz=jnp.asarray(rd[2]),
        tmin=jnp.zeros((sz, p), jnp.float32),
    )


def mt_body(block, r, t_cur, L):
    def comp(c):
        return block[:, c * L : (c + 1) * L][:, :, None]

    p0x, p0y, p0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3), comp(4), comp(5)
    e2x, e2y, e2z = comp(6), comp(7), comp(8)
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
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= r["tmin"][:, None, :]) & (t <= t_cur[:, None, :])
    )
    t_masked = jnp.where(ok, t, BIG)
    j = jnp.argmin(t_masked, axis=1)
    t_new = jnp.min(t_masked, axis=1)
    return t_new, j


def woop_post(opx, opy, opz, dpx, dpy, dpz, r, t_cur):
    t = -opz / dpz
    u = opx + t * dpx
    v = opy + t * dpy
    ok = (
        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= r["tmin"][:, None, :]) & (t <= t_cur[:, None, :])
    )
    t_masked = jnp.where(ok, t, BIG)
    j = jnp.argmin(t_masked, axis=1)
    t_new = jnp.min(t_masked, axis=1)
    return t_new, j


def woop_elem_body(block12, r, t_cur, L):
    def row(c, k):  # coefficient k of the c-component rows -> (sz, L, 1)
        base = c * 4 * L + k * L
        return block12[:, base : base + L][:, :, None]

    # NOTE: packing for elementwise is (K, 3, 4, L) k-major; see pack below
    ox, oy, oz = r["rox"][:, None, :], r["roy"][:, None, :], r["roz"][:, None, :]
    dx, dy, dz = r["rdx"][:, None, :], r["rdy"][:, None, :], r["rdz"][:, None, :]
    outs = []
    for c in range(3):
        w0, w1, w2, tr = row(c, 0), row(c, 1), row(c, 2), row(c, 3)
        outs.append(w0 * ox + w1 * oy + w2 * oz + tr)
        outs.append(w0 * dx + w1 * dy + w2 * dz)
    opx, dpx, opy, dpy, opz, dpz = outs
    return woop_post(opx, opy, opz, dpx, dpy, dpz, r, t_cur)


def woop_mm2_body(block12, r, t_cur, L, precision):
    sz = r["rox"].shape[0]
    p = r["rox"].shape[1]
    w = block12.reshape(sz, 3 * L, 4)
    ones = jnp.ones_like(r["rox"])
    zeros = jnp.zeros_like(r["rox"])
    Ro = jnp.stack([r["rox"], r["roy"], r["roz"], ones], axis=1)  # (sz, 4, p)
    Rd = jnp.stack([r["rdx"], r["rdy"], r["rdz"]], axis=1)  # (sz, 3, p)
    O = lax.dot_general(
        w, Ro, (((2,), (1,)), ((0,), (0,))), precision=precision,
        preferred_element_type=jnp.float32,
    )  # (sz, 3L, p)
    D = lax.dot_general(
        w[:, :, :3], Rd, (((2,), (1,)), ((0,), (0,))), precision=precision,
        preferred_element_type=jnp.float32,
    )
    opx, opy, opz = O[:, :L], O[:, L : 2 * L], O[:, 2 * L :]
    dpx, dpy, dpz = D[:, :L], D[:, L : 2 * L], D[:, 2 * L :]
    return woop_post(opx, opy, opz, dpx, dpy, dpz, r, t_cur)


def woop_mm1_body(block48, r, t_cur, L, precision):
    sz = r["rox"].shape[0]
    w = block48.reshape(sz, 6 * L, 8)
    ones = jnp.ones_like(r["rox"])
    zeros = jnp.zeros_like(r["rox"])
    R8 = jnp.stack(
        [r["rox"], r["roy"], r["roz"], ones, r["rdx"], r["rdy"], r["rdz"], zeros],
        axis=1,
    )  # (sz, 8, p)
    OD = lax.dot_general(
        w, R8, (((2,), (1,)), ((0,), (0,))), precision=precision,
        preferred_element_type=jnp.float32,
    )  # (sz, 6L, p)
    opx, opy, opz = OD[:, :L], OD[:, L : 2 * L], OD[:, 2 * L : 3 * L]
    dpx, dpy, dpz = OD[:, 3 * L : 4 * L], OD[:, 4 * L : 5 * L], OD[:, 5 * L :]
    return woop_post(opx, opy, opz, dpx, dpy, dpz, r, t_cur)


def run_variant(name, table, body, rows, sz, L, p):
    packet_idx = jnp.arange(sz, dtype=jnp.int32)

    @jax.jit
    def run(table, rows, t0):
        def step(i, t_cur):
            tid = (i * 7919 + packet_idx * 31) % table.shape[0]
            block = table[tid]
            t_new, j = body(block, rows, t_cur, L)
            # keep both outputs live (argmin must not be DCE'd)
            return jnp.minimum(t_cur, t_new) - j.astype(jnp.float32) * 1e-30

        return lax.fori_loop(0, STEPS, step, t0)

    t0 = jnp.full((sz, p), BIG)
    out = run(table, rows, t0)
    out.block_until_ready()
    reps = 5
    tbest = 1e9
    for _ in range(reps):
        tic = time.perf_counter()
        out = run(table, rows, t0)
        out.block_until_ready()
        tbest = min(tbest, time.perf_counter() - tic)
    pairs = sz * L * p * STEPS
    ns_per_pair = tbest / pairs * 1e9
    print(
        f"{name:24s} L={L:3d} sz={sz}: {tbest*1e3:8.2f} ms / {STEPS} steps "
        f"-> {ns_per_pair*1e3:7.2f} ps/pair  ({pairs/tbest/1e9:6.1f} Gpairs/s)",
        flush=True,
    )
    return tbest


def fma_calibration(sz, L, p):
    n = sz * L * p

    @jax.jit
    def run(x):
        def step(i, x):
            return x * 1.000001 + 0.5
        return lax.fori_loop(0, STEPS * 10, step, x)

    x = jnp.ones((sz, L, p), jnp.float32)
    out = run(x)
    out.block_until_ready()
    tic = time.perf_counter()
    out = run(x)
    out.block_until_ready()
    dt = time.perf_counter() - tic
    flops = n * STEPS * 10 * 2
    print(f"fma_cal: {flops/dt/1e12:.2f} TFLOP/s VPU (fma chain, {dt*1e3:.1f} ms)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    sz, p = 4096, 256

    fma_calibration(1024, 32, 256)

    for L in (32, 64):
        Keff = max(1, (K * 32) // L)
        tre_tris, w12, w48 = make_tables(Keff, L, rng)
        # elementwise packing variant: (K, 3, 4, L) k-major
        w12e = (
            w12.reshape(Keff, 3, L, 4).transpose(0, 1, 3, 2).reshape(Keff, 12 * L)
        )
        rows = make_rays(sz, p, rng)
        tt = jnp.asarray(tre_tris)
        j12 = jnp.asarray(w12)
        j12e = jnp.asarray(w12e)
        j48 = jnp.asarray(w48)

        run_variant("mt", tt, mt_body, rows, sz, L, p)
        run_variant("woop_elem", j12e, woop_elem_body, rows, sz, L, p)
        for prec, pname in (
            (lax.Precision.DEFAULT, "DEFAULT"),
            (lax.Precision.HIGH, "HIGH"),
            (lax.Precision.HIGHEST, "HIGHEST"),
        ):
            run_variant(
                f"woop_mm2_{pname}", j12,
                lambda b, r, t, L, prec=prec: woop_mm2_body(b, r, t, L, prec),
                rows, sz, L, p,
            )
        run_variant(
            "woop_mm1_HIGH", j48,
            lambda b, r, t, L: woop_mm1_body(b, r, t, L, lax.Precision.HIGH),
            rows, sz, L, p,
        )


if __name__ == "__main__":
    main()
