"""Packet-treelet mesh intersection — the TPU production path.

Replaces the per-ray BVH walk for the ids pass (see accel/treelets.py for
why).  Pipeline per bounce, for the whole flat ray batch:

  phase 1  dense culling: every ray tests every treelet AABB (chunked
           (Np, P, Kc) slab tests, pure VPU, no gathers) -> per-packet
           hit mask + front-to-back entry distance per treelet
  phase 2  per-packet argsort of hit treelets by entry distance
  phase 3  sweep: a `lax.while_loop` where each iteration advances every
           unfinished packet to its next-nearest hit treelet, fetches that
           treelet's packed triangle block with ONE row-gather per packet,
           and runs dense (P, L) Moller-Trumbore.  A packet finishes when
           its list is exhausted or every live lane's current closest hit
           is nearer than the next treelet's entry (front-to-back early
           termination — the analogue of the reference's per-ray t_max
           shrinking, src/lib/path_tracer.cu:62-64).

Gather traffic: N/P row-gathers per sweep step (vs 5N per step for the
per-ray walk).  Every array in the hot math is component-SoA with a
large minor axis (P, L or Kc) — see core/vec.py for why (N, 3) arrays are
poison on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpupt.core.vec import Vec3

PACKET = 256  # rays per packet (sublane-major dim of the dense math)
_CULL_CHUNK = 128  # treelets per dense-culling chunk (lane dim)
BIG = jnp.float32(3.0e38)
MOLLER_EPS = 1e-7  # reference EPSILON, src/lib/intersections.cuh:54


def intersect_treelets(
    scene,
    ro: Vec3,  # components (N,)
    rd: Vec3,
    t_min: jnp.ndarray,  # (N,)
    t_seed: jnp.ndarray,  # (N,) current best t (e.g. from the sphere pass)
    active: jnp.ndarray,  # (N,)
):
    """Closest mesh hit for every ray.

    Returns (t (N,), slot (N,) global treelet-slot id or -1, outward normal
    Vec3) — the normal is selected in-register from the winning treelet
    block each sweep step, so the forward render needs NO per-lane geometry
    gathers afterwards (per-lane gathers cost ~2.3 ms per million lanes on
    v5e — they are reserved for the once-per-bounce differentiable refine).
    Map the slot to (triangle, object, material) with scene.slot_src /
    slot_obj / slot_mat.
    """
    n = ro.x.shape[0]
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]

    # pad the batch to a packet multiple with dead lanes
    pad = (-n) % PACKET
    def padded(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad else a

    rox, roy, roz = padded(ro.x, 0.0), padded(ro.y, 0.0), padded(ro.z, 0.0)
    rdx, rdy, rdz = padded(rd.x, 1.0), padded(rd.y, 1.0), padded(rd.z, 1.0)
    t_min = padded(t_min, 0.0)
    t_seed = padded(t_seed, -BIG)
    active = padded(active, False)
    np_, p = (n + pad) // PACKET, PACKET

    shp = (np_, p)
    rox, roy, roz = rox.reshape(shp), roy.reshape(shp), roz.reshape(shp)
    rdx, rdy, rdz = rdx.reshape(shp), rdy.reshape(shp), rdz.reshape(shp)
    ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    tmin_p = t_min.reshape(shp)
    act_p = active.reshape(shp)
    # dead lanes: -BIG best-t so they never keep a packet alive
    t_best0 = jnp.where(active, t_seed, -BIG)

    # --- phase 1: dense treelet culling (chunked over K) ---------------
    def axis_near_far(bmin_c, bmax_c, o, iv):
        t0 = (bmin_c[None, None, :] - o[:, :, None]) * iv[:, :, None]
        t1 = (bmax_c[None, None, :] - o[:, :, None]) * iv[:, :, None]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    entry_chunks = []
    for c0 in range(0, K, _CULL_CHUNK):
        c1 = min(c0 + _CULL_CHUNK, K)
        nx0, fx0 = axis_near_far(scene.tre_min[c0:c1, 0], scene.tre_max[c0:c1, 0], rox, ivx)
        ny0, fy0 = axis_near_far(scene.tre_min[c0:c1, 1], scene.tre_max[c0:c1, 1], roy, ivy)
        nz0, fz0 = axis_near_far(scene.tre_min[c0:c1, 2], scene.tre_max[c0:c1, 2], roz, ivz)
        near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)  # (np, p, Kc)
        far = jnp.minimum(jnp.minimum(fx0, fy0), fz0)
        hit = (far >= near) & (far >= tmin_p[..., None]) & act_p[..., None]
        # packet entry distance; +BIG when no lane hits
        entry = jnp.min(jnp.where(hit, jnp.maximum(near, 0.0), BIG), axis=1)
        entry_chunks.append(entry)
    entry = jnp.concatenate(entry_chunks, axis=-1)  # (np, K)

    # --- phase 2+3: packet sweep with on-the-fly front-to-back selection.
    # Rather than argsort (XLA sort on TPU costs more than the whole
    # sweep), each step argmins the remaining entry distances — an (np, K)
    # reduce per step, steps ~= treelets actually visited.
    def comp(block, c):  # (np, 9L) -> (np, 1, L) component c
        return block[:, c * L : (c + 1) * L][:, None, :]

    packet_idx = jnp.arange(np_, dtype=jnp.int32)
    lane_l = jnp.arange(L, dtype=jnp.int32)[None, None, :]  # (1, 1, L)

    def step(state):
        i, entry_left, t_best, slot_best, n_best = state
        t_best_p = t_best.reshape(np_, p)

        tid = jnp.argmin(entry_left, axis=-1).astype(jnp.int32)  # (np,)
        ent = jnp.min(entry_left, axis=-1)
        # packet still working: unvisited hit treelets remain AND some lane
        # could still improve (front-to-back => later treelets are farther)
        live = (ent < BIG) & (ent <= jnp.max(t_best_p, axis=1))
        safe_tid = jnp.where(live, tid, 0)
        entry_left = entry_left.at[packet_idx, tid].set(BIG)

        block = scene.tre_tris[safe_tid]  # one row-gather per packet
        p0x, p0y, p0z = comp(block, 0), comp(block, 1), comp(block, 2)
        e1x, e1y, e1z = comp(block, 3), comp(block, 4), comp(block, 5)
        e2x, e2y, e2z = comp(block, 6), comp(block, 7), comp(block, 8)

        ox, oy, oz = rox[:, :, None], roy[:, :, None], roz[:, :, None]
        dx, dy, dz = rdx[:, :, None], rdy[:, :, None], rdz[:, :, None]

        # Moller-Trumbore, fully component-wise -> (np, p, L) scalars
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / jnp.where(jnp.abs(a) < MOLLER_EPS, 1.0, a)
        sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= MOLLER_EPS)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin_p[..., None])
            & (t <= t_best_p[..., None])
            & live[:, None, None]
        )
        t_masked = jnp.where(ok, t, BIG)
        j = jnp.argmin(t_masked, axis=-1)  # (np, p) best slot in treelet
        t_new = jnp.min(t_masked, axis=-1)
        got = t_new < BIG
        t_best = jnp.where(got, t_new, t_best_p).reshape(-1)
        new_slot = safe_tid[:, None] * L + j
        slot_best = jnp.where(
            got, new_slot, slot_best.reshape(np_, p)
        ).reshape(-1)

        # outward normal = cross(e1, e2) of the winning slot, selected
        # in-register via a one-hot reduce (no gathers)
        sel = lane_l == j[..., None]  # (np, p, L)
        cnx = e1y * e2z - e1z * e2y  # (np, 1, L)
        cny = e1z * e2x - e1x * e2z
        cnz = e1x * e2y - e1y * e2x
        nwx = jnp.sum(jnp.where(sel, cnx, 0.0), -1)
        nwy = jnp.sum(jnp.where(sel, cny, 0.0), -1)
        nwz = jnp.sum(jnp.where(sel, cnz, 0.0), -1)
        n_best = Vec3(
            jnp.where(got, nwx, n_best.x.reshape(np_, p)).reshape(-1),
            jnp.where(got, nwy, n_best.y.reshape(np_, p)).reshape(-1),
            jnp.where(got, nwz, n_best.z.reshape(np_, p)).reshape(-1),
        )
        return i + 1, entry_left, t_best, slot_best, n_best

    def cond(state):
        i, entry_left, t_best, _, _ = state
        t_best_p = t_best.reshape(np_, p)
        ent = jnp.min(entry_left, axis=-1)
        remaining = (ent < BIG) & (ent <= jnp.max(t_best_p, axis=1))
        return (i < K) & jnp.any(remaining)

    # initial carries derive from varying inputs so the loop is well-typed
    # under shard_map's varying-manual-axes checking
    zero = t_best0 * 0.0
    slot0 = zero.astype(jnp.int32) - 1
    n0 = Vec3(zero, zero, zero)
    _, _, t_best, slot_best, n_best = lax.while_loop(
        cond, step, (jnp.int32(0), entry, t_best0, slot0, n0)
    )

    normal = Vec3(n_best.x[:n], n_best.y[:n], n_best.z[:n])
    return t_best[:n], slot_best[:n], normal
