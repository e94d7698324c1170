"""Secondary-bounce sweep accounting (VERDICT r3 #2).

Round 3 adjudicated sub-treelet culling and octant binning against
PRIMARY-derived numbers (4.3 visits / 137 pairs per ray) while
attributing the real cost to incoherent secondaries — without ever
measuring them.  This script generates REAL bounce-1/2 ray sets from the
production integrator (diffuse-bounced, pixel order — exactly what the
chained loop feeds the sweep) and replays the exact sweep semantics
(front-to-back per-packet selection, per-lane t-caps, packet early exit,
ground-sphere t seed) host-side, reporting per ray set:

  * visits/ray and dense pairs/ray (the lockstep cost actually paid),
  * per-packet hit-list width (the treelet union the packet must sweep),
  * per-packet visit distribution (mean vs p90/max — lockstep waste).

It then re-cuts the same BVHs with the SAH-cost-driven DP cut
(treelets._cut_bvh_sah: minimize summed treelet surface area, <= L tris)
and replays again — the adopt/reject number for the r3 #2 lever.

Usage: python experiments/sec_stats.py [--size 512] [--leaf 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _make_tables(cut_fn, leaf):
    """World-baked treelet boxes + triangle blocks for the flagship
    geometry under a given cut function."""
    import tpupt.core.math3d as m3
    from tpupt.accel.bvh import build_bvh
    from tpupt.scene.procedural import bunny_substitute

    v, f = bunny_substitute()
    instances = [
        np.asarray(m3.mat_translate([1.0, -0.2, -2.0]), np.float64),
        np.asarray(m3.mat_scale(0.5), np.float64)
        @ np.asarray(m3.mat_translate([-2.0, -0.5, -4.0]), np.float64),
    ]
    boxes, tris_w = [], []
    occ = []
    for m in instances:
        wpos = (np.asarray(v, np.float64) @ m[:3, :3].T + m[:3, 3]).astype(
            np.float32
        )
        bvh = build_bvh(wpos, np.asarray(f, np.int32))
        for tri_ids in cut_fn(bvh, leaf):
            tv = wpos[np.asarray(f)[tri_ids]]
            boxes.append((tv.reshape(-1, 3).min(0), tv.reshape(-1, 3).max(0)))
            tris_w.append(tv)
            occ.append(len(tri_ids))
    bmin = np.stack([b[0] for b in boxes])
    bmax = np.stack([b[1] for b in boxes])
    occ = np.asarray(occ)
    return bmin, bmax, tris_w, occ


def _ray_sets(size):
    """Primary + bounce-1 + bounce-2 ray sets from the REAL integrator
    (CPU jax; pixel order; ground-sphere-seeded t caps are re-derived in
    the replay)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpupt.core import camera as cam
    from tpupt.core.vec import Vec3
    from tpupt.render.intersect import intersect_scene_ids
    from tpupt.render.materials import shade
    from tpupt.sampling.rng import pixel_seed
    import __graft_entry__ as ge

    scene, camera = ge._flagship_scene(mesh_subdiv=4)
    W = H = size
    n = W * H
    pix = jnp.arange(n, dtype=jnp.uint32)
    fx = (pix % W).astype(jnp.float32) + 0.5
    fy = (pix // W).astype(jnp.float32) + 0.5
    ro, rd = cam.generate_rays(camera, W, H, fx, fy)
    t_min = jnp.full((n,), jnp.float32(cam.T_MIN_PRIMARY))
    act = jnp.ones((n,), bool)

    sets = {"primary": (ro, rd, act)}
    thr = Vec3(jnp.ones(n), jnp.ones(n), jnp.ones(n))
    seed = pixel_seed(pix, 0)
    cur_ro, cur_rd, cur_tmin, cur_act = ro, rd, t_min, act
    for b in (1, 2):
        ids, fwd = intersect_scene_ids(scene, cur_ro, cur_rd, cur_tmin, cur_act)
        out = shade(scene, fwd, cur_ro, cur_rd, cur_tmin, thr, seed, b)
        nro, nrd, nt = out[0], out[1], out[2]
        alive = cur_act & fwd.mask
        sets[f"bounce{b}"] = (nro, nrd, alive)
        cur_ro, cur_rd, cur_tmin, cur_act = nro, nrd, nt, alive

    def to_np(s):
        ro, rd, a = s
        return (
            np.stack([np.asarray(ro.x), np.asarray(ro.y), np.asarray(ro.z)], 1),
            np.stack([np.asarray(rd.x), np.asarray(rd.y), np.asarray(rd.z)], 1),
            np.asarray(a),
        )

    return {k: to_np(v) for k, v in sets.items()}


def _replay(bmin, bmax, tris_w, ro, rd, act, L, P, sample_packets, seed=0):
    """Host-side replay of the production sweep semantics; returns stats."""
    n = ro.shape[0]
    npk = n // P
    rng = np.random.default_rng(seed)
    sample = rng.permutation(npk)[: min(npk, sample_packets)]

    visits = 0
    pairs = 0
    widths = []
    per_packet_visits = []
    live_packets = 0
    ground_c = np.array([0, -100.5, -1.0], np.float32)

    for pk in sample:
        o = ro[pk * P : (pk + 1) * P]
        d = rd[pk * P : (pk + 1) * P]
        a = act[pk * P : (pk + 1) * P]
        if not a.any():
            continue
        live_packets += 1
        with np.errstate(divide="ignore", invalid="ignore"):
            iv = 1.0 / d
            t = np.where(a, np.float32(3.0e38), np.float32(-3.0e38))
            # ground-sphere seed (the sphere pass seeds the sweep's t caps)
            oc = o - ground_c
            b2 = np.sum(d * oc, axis=1)
            aa = np.sum(d * d, axis=1)
            c = np.sum(oc * oc, axis=1) - 100.0**2
            disc = b2 * b2 - aa * c
            hit = disc >= 0
            tq = (-b2 - np.sqrt(np.maximum(disc, 0))) / np.maximum(aa, 1e-30)
            t = np.where(a & hit & (tq > 1e-3), tq.astype(np.float32), t)

            t0s = (bmin[None] - o[:, None]) * iv[:, None]
            t1s = (bmax[None] - o[:, None]) * iv[:, None]
            near = np.maximum(np.minimum(t0s, t1s).max(2), 0.0)  # (P, K)
            far = np.maximum(t0s, t1s).min(2)
        ok = (far >= near) & (near <= t[:, None]) & a[:, None]
        entry = np.where(ok, near, 3.0e38).min(0)  # (K,)
        widths.append(int((entry < 3.0e38).sum()))

        pv = 0
        order = np.argsort(entry)
        for tid in order:
            e = entry[tid]
            if e >= 3.0e38 or e > t.max():
                break
            lane_ok = ok[:, tid] & (near[:, tid] <= t)
            if not lane_ok.any():
                continue
            visits += 1
            pv += 1
            pairs += P * L
            tv = tris_w[tid]
            p0 = tv[:, 0][None]
            e1 = (tv[:, 1] - tv[:, 0])[None]
            e2 = (tv[:, 2] - tv[:, 0])[None]
            dl = d[:, None]
            h = np.cross(dl, e2)
            det = np.sum(e1 * h, axis=2)
            fv = 1.0 / np.where(np.abs(det) < 1e-7, 1.0, det)
            s = o[:, None] - p0
            u = fv * np.sum(s * h, axis=2)
            q = np.cross(s, e1)
            vv = fv * np.sum(dl * q, axis=2)
            tt = fv * np.sum(e2 * q, axis=2)
            okm = (
                (np.abs(det) >= 1e-7)
                & (u >= 0) & (vv >= 0) & (u + vv <= 1)
                & (tt >= 1e-3) & (tt <= t[:, None]) & lane_ok[:, None]
            )
            tt = np.where(okm, tt, 3.0e38).min(1)
            t = np.minimum(t, tt.astype(np.float32))
        per_packet_visits.append(pv)

    nrays = live_packets * P
    w = np.asarray(widths) if widths else np.zeros(1)
    pv = np.asarray(per_packet_visits) if per_packet_visits else np.zeros(1)
    return dict(
        nrays=nrays,
        visits_per_ray=visits * P / max(nrays, 1),
        pairs_per_ray=pairs / max(nrays, 1),
        width_mean=w.mean(), width_p90=float(np.percentile(w, 90)),
        width_max=int(w.max()),
        visits_mean=pv.mean(), visits_p90=float(np.percentile(pv, 90)),
        visits_max=int(pv.max()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--leaf", type=int, default=32)
    ap.add_argument("--packet", type=int, default=256)
    ap.add_argument("--sample", type=int, default=512)
    args = ap.parse_args()

    from tpupt.accel.treelets import _cut_bvh, _cut_bvh_sah

    print("generating real ray sets (CPU jax)...")
    t0 = time.time()
    sets = _ray_sets(args.size)
    print(f"  done in {time.time()-t0:.1f}s; "
          + ", ".join(f"{k}: {v[2].sum()} live" for k, v in sets.items()))

    for cut_name, cut_fn in (("prod <=L cut", _cut_bvh), ("SAH DP cut", _cut_bvh_sah)):
        bmin, bmax, tris_w, occ = _make_tables(cut_fn, args.leaf)
        sa = (
            2.0 * (
                (bmax - bmin)[:, 0] * (bmax - bmin)[:, 1]
                + (bmax - bmin)[:, 1] * (bmax - bmin)[:, 2]
                + (bmax - bmin)[:, 0] * (bmax - bmin)[:, 2]
            )
        ).sum()
        print(
            f"\n[{cut_name}] K={len(occ)} treelets, occupancy mean "
            f"{occ.mean():.1f}/{args.leaf}, sum SA {sa:.3f}"
        )
        for name, (ro, rd, act) in sets.items():
            st = _replay(
                bmin, bmax, tris_w, ro, rd, act, args.leaf, args.packet,
                args.sample,
            )
            print(
                f"  {name:8s}: visits/ray {st['visits_per_ray']:6.1f}  "
                f"pairs/ray {st['pairs_per_ray']:6.0f}  "
                f"width mean/p90/max {st['width_mean']:5.1f}/"
                f"{st['width_p90']:5.1f}/{st['width_max']:4d}  "
                f"packet visits mean/p90/max {st['visits_mean']:5.1f}/"
                f"{st['visits_p90']:5.1f}/{st['visits_max']:4d}"
            )


if __name__ == "__main__":
    main()
