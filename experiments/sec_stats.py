"""Secondary-bounce sweep accounting (VERDICT r3 #2 and #5).

Round 3 adjudicated sub-treelet culling and octant binning against
PRIMARY-derived numbers (4.3 visits / 137 pairs per ray) while
attributing the real cost to incoherent secondaries — without ever
measuring them.  This script generates REAL bounce-k ray sets from the
production integrator (pixel order — exactly what the chained loop feeds
the sweep) and replays the exact sweep semantics (front-to-back
per-packet selection, per-lane t-caps, packet early exit, sphere-pass t
seeds) host-side, reporting per ray set:

  * visits/ray and dense pairs/ray (the lockstep cost actually paid),
  * per-packet hit-list width (the treelet union the packet must sweep),
  * per-packet visit distribution (mean vs p90/max — lockstep waste).

--scene flagship additionally re-cuts the BVHs with the SAH-cost-driven
DP cut (treelets._cut_bvh_sah) — the r3 #2 lever's adopt/reject number.
--scene multimesh measures BASELINE config 5 (r3 #5: 10.5 vs 36.5
Mrays/s with zero analysis).

Measured 2026-08-20 (512², flagship): primaries 4.0 visits / 128
pairs/ray (union width mean 6.3); bounce1 29.6 / 948 (width 57.7);
bounce2 20.8 / 666 — secondaries pay 7.4x primaries, from union width,
not visit inefficiency.  SAH DP cut: NEGATIVE (+12% pairs, K 460→920 —
a packet visit costs P*L regardless of occupancy, so more, smaller
treelets lose even at lower summed SA).

Usage: python experiments/sec_stats.py [--size 512] [--scene flagship]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _make_tables_flagship(cut_fn, leaf):
    """World-baked treelet boxes + triangle verts for the flagship
    geometry under a given cut function (the dual-cut comparison path)."""
    import tpupt.core.math3d as m3
    from tpupt.accel.bvh import build_bvh
    from tpupt.scene.procedural import bunny_substitute

    v, f = bunny_substitute()
    instances = [
        np.asarray(m3.mat_translate([1.0, -0.2, -2.0]), np.float64),
        np.asarray(m3.mat_scale(0.5), np.float64)
        @ np.asarray(m3.mat_translate([-2.0, -0.5, -4.0]), np.float64),
    ]
    boxes, tris_w, occ = [], [], []
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
    return bmin, bmax, tris_w, np.asarray(occ)


def _tables_from_scene(scene):
    """Extract the production treelet tables from built scene arrays
    (packed block comps 0..8 are world p0/e1/e2; pad slots have obj=-1)."""
    L = scene.s_leaf_size
    blocks = np.asarray(scene.tre_tris)  # (K, 13L)
    K = blocks.shape[0]
    tris_w, occ = [], []
    for k in range(K):
        b = blocks[k].reshape(13, L)
        real = b[12] >= 0.0  # obj channel: -1 on pads
        p0 = b[0:3, real].T
        e1 = b[3:6, real].T
        e2 = b[6:9, real].T
        tris_w.append(np.stack([p0, p0 + e1, p0 + e2], axis=1))
        occ.append(int(real.sum()))
    return (
        np.asarray(scene.tre_min), np.asarray(scene.tre_max),
        tris_w, np.asarray(occ),
    )


def _scene_spheres(scene):
    """(centers (S,3), radii (S,)) in world space for the t-seed replay
    (translate-only transforms in the shipped scenes)."""
    from tpupt.core.types import OBJ_SPHERE

    cs, rs = [], []
    sc = np.asarray(scene.sphere_center)
    sr = np.asarray(scene.sphere_radius)
    om = np.asarray(scene.obj_m)
    for o, (kind, prim) in enumerate(zip(scene.s_obj_kind, scene.s_obj_prim)):
        if kind == OBJ_SPHERE:
            c = om[o][:3, :3] @ sc[prim] + om[o][:3, 3]
            cs.append(c)
            rs.append(sr[prim])
    return (np.asarray(cs, np.float32).reshape(-1, 3),
            np.asarray(rs, np.float32))


def _ray_sets(scene, camera, size, bounces):
    """Primary + bounce-k ray sets from the REAL integrator (CPU jax;
    pixel order)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpupt.core import camera as cam
    from tpupt.core.vec import Vec3
    from tpupt.render.intersect import intersect_scene_ids
    from tpupt.render.materials import shade
    from tpupt.sampling.rng import pixel_seed

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
    for b in range(1, bounces + 1):
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


def _replay(bmin, bmax, tris_w, spheres, ro, rd, act, L, P, sample_packets,
            seed=0):
    """Host-side replay of the production sweep semantics; returns stats."""
    n = ro.shape[0]
    npk = n // P
    rng = np.random.default_rng(seed)
    sample = rng.permutation(npk)[: min(npk, sample_packets)]
    scs, srs = spheres

    visits = 0
    pairs = 0
    widths = []
    per_packet_visits = []
    live_packets = 0

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
            for c, r in zip(scs, srs):  # sphere-pass t seeds
                oc = o - c
                b2 = np.sum(d * oc, axis=1)
                aa = np.sum(d * d, axis=1)
                cc = np.sum(oc * oc, axis=1) - r * r
                disc = b2 * b2 - aa * cc
                hit = disc >= 0
                tq = (-b2 - np.sqrt(np.maximum(disc, 0))) / np.maximum(aa, 1e-30)
                t = np.where(a & hit & (tq > 1e-3) & (tq < t),
                             tq.astype(np.float32), t)

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
            if len(tv) == 0:
                continue
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


def _report(tag, bmin, bmax, tris_w, occ, spheres, sets, L, P, sample):
    ext = bmax - bmin
    sa = 2.0 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
                + ext[:, 0] * ext[:, 2])
    print(
        f"\n[{tag}] K={len(occ)} treelets, occupancy mean "
        f"{occ.mean():.1f}/{L}, sum SA {sa.sum():.3f}"
    )
    for name, (ro, rd, act) in sets.items():
        st = _replay(bmin, bmax, tris_w, spheres, ro, rd, act, L, P, sample)
        print(
            f"  {name:8s}: visits/ray {st['visits_per_ray']:6.1f}  "
            f"pairs/ray {st['pairs_per_ray']:6.0f}  "
            f"width mean/p90/max {st['width_mean']:5.1f}/"
            f"{st['width_p90']:5.1f}/{st['width_max']:4d}  "
            f"packet visits mean/p90/max {st['visits_mean']:5.1f}/"
            f"{st['visits_p90']:5.1f}/{st['visits_max']:4d}"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--leaf", type=int, default=32)
    ap.add_argument("--packet", type=int, default=256)
    ap.add_argument("--sample", type=int, default=384)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--scene", default="flagship",
                    choices=("flagship", "bunny", "multimesh"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.scene == "flagship":
        import __graft_entry__ as ge

        scene, camera = ge._flagship_scene(mesh_subdiv=4)
    else:
        from tpupt.bench.harness import _scene_bunny, _scene_multimesh

        scene, camera = (
            _scene_bunny() if args.scene == "bunny" else _scene_multimesh()
        )

    print(f"generating real ray sets (CPU jax, {args.scene})...")
    t0 = time.time()
    sets = _ray_sets(scene, camera, args.size, args.bounces)
    print(f"  done in {time.time()-t0:.1f}s; "
          + ", ".join(f"{k}: {v[2].sum()} live" for k, v in sets.items()))
    spheres = _scene_spheres(scene)

    if args.scene == "flagship":
        from tpupt.accel.treelets import _cut_bvh, _cut_bvh_sah

        for cut_name, cut_fn in (("prod <=L cut", _cut_bvh),
                                 ("SAH DP cut", _cut_bvh_sah)):
            bmin, bmax, tris_w, occ = _make_tables_flagship(cut_fn, args.leaf)
            _report(cut_name, bmin, bmax, tris_w, occ, spheres, sets,
                    args.leaf, args.packet, args.sample)
    else:
        bmin, bmax, tris_w, occ = _tables_from_scene(scene)
        _report(args.scene, bmin, bmax, tris_w, occ, spheres, sets,
                scene.s_leaf_size, args.packet, args.sample)


if __name__ == "__main__":
    main()
