"""Pallas packet-sweep kernel — per-packet trip counts on the TensorCore.

The XLA sweep (accel/packets.py) is lockstep: every while-loop step costs
the full batch even though most packets finish after a few treelets; the
compaction ladder claws back most of that, amortized.  This kernel is the
exact per-packet formulation: grid = one program per ray packet, each
walking ONLY its own front-to-back hit list, with treelet blocks fetched
by per-program dynamic slices — total work is the sum of per-packet
visits (the true average) and the Moller intermediates never touch HBM.

Status: validated against the XLA sweep in Pallas *interpreter* mode
(tests/test_pallas_sweep.py).  In this development environment the Mosaic
TPU compile path hangs (see DESIGN.md "Pallas" row), so the production
intersector keeps the XLA ladder; flip `intersect_treelets_pallas` in once
kernels compile — the call signature matches `intersect_treelets` minus
the normal output (one extra slot gather recovers it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpupt.accel.packets import BIG, MOLLER_EPS, PACKET, _CULL_CHUNK
from tpupt.core.vec import Vec3

# python float (not a traced jnp constant — pallas kernels cannot close
# over tracers/arrays)
_BIG = 3.0e38


def _sweep_kernel(
    entry_ref,  # (1, K) f32 — this packet's treelet entry distances
    rox_ref, roy_ref, roz_ref,  # (1, P) ray origins
    rdx_ref, rdy_ref, rdz_ref,  # (1, P) ray directions
    tmin_ref,  # (1, P)
    tseed_ref,  # (1, P) seeded best-t (dead lanes carry -BIG)
    tre_ref,  # (K, 9L) packed treelet triangle blocks (component-major)
    t_out,  # (1, P)
    slot_out,  # (1, P) i32
    *,
    leaf: int,
):
    k = entry_ref.shape[1]
    L = leaf

    ox, oy, oz = rox_ref[0, :], roy_ref[0, :], roz_ref[0, :]
    dx, dy, dz = rdx_ref[0, :], rdy_ref[0, :], rdz_ref[0, :]
    tmin = tmin_ref[0, :]

    def cond(state):
        i, entry, t_best, _ = state
        ent = jnp.min(entry)
        return (i < k) & (ent < _BIG) & (ent <= jnp.max(t_best))

    def body(state):
        i, entry, t_best, slot_best = state
        tid = jnp.argmin(entry).astype(jnp.int32)
        entry = entry.at[tid].set(_BIG)

        block = tre_ref[pl.ds(tid, 1), :]  # (1, 9L) dynamic row fetch

        def comp(c):  # component c as (L, 1) — tris on sublanes, rays on lanes
            return block[0, c * L : (c + 1) * L][:, None]

        p0x, p0y, p0z = comp(0), comp(1), comp(2)
        e1x, e1y, e1z = comp(3), comp(4), comp(5)
        e2x, e2y, e2z = comp(6), comp(7), comp(8)

        # Moller-Trumbore over (L, P): same formulas as accel/packets.py
        hx = dy[None, :] * e2z - dz[None, :] * e2y
        hy = dz[None, :] * e2x - dx[None, :] * e2z
        hz = dx[None, :] * e2y - dy[None, :] * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / jnp.where(jnp.abs(a) < MOLLER_EPS, 1.0, a)
        sx = ox[None, :] - p0x
        sy = oy[None, :] - p0y
        sz = oz[None, :] - p0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= MOLLER_EPS)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin[None, :])
            & (t <= t_best[None, :])
        )
        t_masked = jnp.where(ok, t, _BIG)
        j = jnp.argmin(t_masked, axis=0)  # (P,)
        t_new = jnp.min(t_masked, axis=0)
        got = t_new < _BIG
        t_best = jnp.where(got, t_new, t_best)
        slot_best = jnp.where(got, tid * L + j.astype(jnp.int32), slot_best)
        return i + 1, entry, t_best, slot_best

    t0 = tseed_ref[0, :]
    slot0 = jnp.full((t0.shape[0],), -1, jnp.int32)
    _, _, t_best, slot_best = jax.lax.while_loop(
        cond, body, (jnp.int32(0), entry_ref[0, :], t0, slot0)
    )
    t_out[0, :] = t_best
    slot_out[0, :] = slot_best


def intersect_treelets_pallas(
    scene,
    ro: Vec3,
    rd: Vec3,
    t_min: jnp.ndarray,
    t_seed: jnp.ndarray,
    active: jnp.ndarray,
    interpret: bool = False,
):
    """Pallas twin of accel/packets.intersect_treelets (t + slot only)."""
    n = ro.x.shape[0]
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]

    pad = (-n) % PACKET

    def padded(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad else a

    comps = [padded(c, f) for c, f in
             [(ro.x, 0.0), (ro.y, 0.0), (ro.z, 0.0),
              (rd.x, 1.0), (rd.y, 1.0), (rd.z, 1.0),
              (t_min, 0.0)]]
    t_seed = padded(jnp.where(active, t_seed, -BIG), -BIG)
    act = padded(active, False)
    np_, p = (n + pad) // PACKET, PACKET
    rows = [c.reshape(np_, p) for c in comps]
    tseed_p = t_seed.reshape(np_, p)
    act_p = act.reshape(np_, p)

    # dense culling phase identical to the XLA path
    rox_p, roy_p, roz_p, rdx_p, rdy_p, rdz_p, tmin_p = rows
    ivx, ivy, ivz = 1.0 / rdx_p, 1.0 / rdy_p, 1.0 / rdz_p
    chunks = []
    for c0 in range(0, K, _CULL_CHUNK):
        c1 = min(c0 + _CULL_CHUNK, K)

        def nf(axis, o, iv):
            t0 = (scene.tre_min[c0:c1, axis][None, None] - o[:, :, None]) * iv[:, :, None]
            t1 = (scene.tre_max[c0:c1, axis][None, None] - o[:, :, None]) * iv[:, :, None]
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        nx0, fx0 = nf(0, rox_p, ivx)
        ny0, fy0 = nf(1, roy_p, ivy)
        nz0, fz0 = nf(2, roz_p, ivz)
        near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
        far = jnp.minimum(jnp.minimum(fx0, fy0), fz0)
        hit = (far >= near) & (far >= tmin_p[..., None]) & act_p[..., None]
        chunks.append(jnp.min(jnp.where(hit, jnp.maximum(near, 0.0), BIG), axis=1))
    entry = jnp.concatenate(chunks, axis=-1)  # (np, K)

    kernel = functools.partial(_sweep_kernel, leaf=L)
    row_spec = pl.BlockSpec((1, p), lambda i: (i, 0))
    t_best, slot = pl.pallas_call(
        kernel,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (i, 0)),  # entry
            row_spec, row_spec, row_spec,  # ro
            row_spec, row_spec, row_spec,  # rd
            row_spec,  # tmin
            row_spec,  # tseed
            pl.BlockSpec((K, 9 * L), lambda i: (0, 0)),  # treelet table
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((np_, p), jnp.float32),
            jax.ShapeDtypeStruct((np_, p), jnp.int32),
        ],
        interpret=interpret,
    )(entry, rox_p, roy_p, roz_p, rdx_p, rdy_p, rdz_p, tmin_p, tseed_p,
      scene.tre_tris)

    return t_best.reshape(-1)[:n], slot.reshape(-1)[:n]
