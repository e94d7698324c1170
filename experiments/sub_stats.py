"""Host-side sweep simulation: sub-treelet culling go/no-go numbers.

The round-2 verdict proposes within-visit sub-treelet culling to cut the
~800 ray-triangle pair tests per ray the dense packet sweep pays (25
visits x L=32) toward ~300.  Whether that works hinges on one number the
repo has never measured: of the S sub-blocks of a visited treelet, how
many does the packet actually have to test once per-lane entry + t-cap
culling is applied?

This script replays the EXACT production sweep semantics (front-to-back
per-packet treelet selection, per-lane t-caps, packet early exit) in
numpy on real primary rays of the flagship bunny scene, with treelets cut
the same way the build cuts them (accel/treelets._cut_bvh), and
sub-blocks cut from each treelet by the same recursion at L/S triangles.
It reports, per packet-visit:

  * visits/ray and pairs/ray for the production L=32 sweep (ground truth
    for DESIGN.md's ~800 estimate),
  * the survival histogram of S=4 sub-blocks per visit (a sub-block
    survives if ANY live lane enters its AABB nearer than that lane's
    current best t),
  * the same at sub-block granularity (what a leaf-8-with-multifetch
    sweep would pay).

Usage: python experiments/sub_stats.py [--size 512] [--leaf 32] [--sub 8]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _primary_rays(camera_matrix, vfov, width, height):
    """Pinhole primaries (center-of-pixel, no jitter) in numpy."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64) + 0.5
    aspect = width / height
    half_h = np.tan(vfov / 2)
    half_w = aspect * half_h
    cx = (2 * xs / width - 1) * half_w
    cy = (1 - 2 * ys / height) * half_h
    d = np.stack([cx, cy, -np.ones_like(cx)], axis=-1).reshape(-1, 3)
    m = np.asarray(camera_matrix, np.float64)
    rd = d @ m[:3, :3].T
    ro = np.broadcast_to(m[:3, 3], rd.shape).copy()
    return ro.astype(np.float32), rd.astype(np.float32)


def _cut_tree(bvh, max_tris):
    from tpupt.accel.treelets import _cut_bvh

    return _cut_bvh(bvh, max_tris)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--leaf", type=int, default=32)
    ap.add_argument("--sub", type=int, default=8)
    ap.add_argument("--packet", type=int, default=256)
    args = ap.parse_args()
    L, Ls, P = args.leaf, args.sub, args.packet
    S = L // Ls

    from tpupt.accel.bvh import build_bvh
    from tpupt.scene.procedural import bunny_substitute

    # flagship geometry: two bunny instances, world-baked (same transforms
    # as __graft_entry__._flagship_scene)
    import tpupt.core.math3d as m3

    v, f = bunny_substitute()
    instances = [
        np.asarray(m3.mat_translate([1.0, -0.2, -2.0]), np.float64),
        np.asarray(m3.mat_scale(0.5), np.float64)
        @ np.asarray(m3.mat_translate([-2.0, -0.5, -4.0]), np.float64),
    ]

    tre_boxes, tre_tris, sub_boxes = [], [], []
    for m in instances:
        wpos = (np.asarray(v, np.float64) @ m[:3, :3].T + m[:3, 3]).astype(
            np.float32
        )
        bvh = build_bvh(wpos, np.asarray(f, np.int32))
        for tri_ids in _cut_tree(bvh, L):
            tv = wpos[np.asarray(f)[tri_ids]]  # (n, 3, 3)
            tre_boxes.append(
                (tv.reshape(-1, 3).min(0), tv.reshape(-1, 3).max(0))
            )
            tre_tris.append(tv)
            # topological sub-cut of this treelet: re-run the cut on the
            # subtree's own BVH (equivalent to cutting the subtree)
            sb = build_bvh(wpos, np.asarray(f, np.int32)[tri_ids])
            subs = []
            for sub_ids in _cut_tree(sb, Ls):
                sv = wpos[np.asarray(f)[tri_ids][sub_ids]]
                subs.append(
                    (sv.reshape(-1, 3).min(0), sv.reshape(-1, 3).max(0),
                     len(sub_ids))
                )
            sub_boxes.append(subs)

    K = len(tre_boxes)
    bmin = np.stack([b[0] for b in tre_boxes])  # (K, 3)
    bmax = np.stack([b[1] for b in tre_boxes])
    nsubs = np.array([len(s) for s in sub_boxes])
    print(
        f"K={K} treelets (L={L}), sub-blocks/treelet: "
        f"mean {nsubs.mean():.2f} max {nsubs.max()} (Ls={Ls})"
    )

    from tpupt.core.camera import make_camera

    cam = make_camera(vfov=np.deg2rad(60))
    W = H = args.size
    ro, rd = _primary_rays(np.asarray(cam.camera_matrix), float(cam.vfov), W, H)
    n = ro.shape[0]
    npk = n // P

    visits = 0
    pairs = 0
    sub_hist = collections.Counter()  # surviving sub-blocks per visit
    sub_pairs = 0  # pairs if MT ran only on surviving sub-blocks
    subvisits = 0  # visits at sub-block granularity (leaf-8 sweep)
    t0 = time.time()
    rng = np.random.default_rng(0)
    sample = rng.permutation(npk)[: min(npk, 1024)]
    for pk in sample:
        o = ro[pk * P : (pk + 1) * P]
        d = rd[pk * P : (pk + 1) * P]
        iv = 1.0 / d
        t = np.full(P, 3.0e38, np.float32)
        # ground sphere seed (the sphere pass seeds t for the sweep)
        oc = o - np.array([0, -100.5, -1.0], np.float32)
        b2 = np.sum(d * oc, axis=1)  # half-b quadratic form
        a = np.sum(d * d, axis=1)
        c = np.sum(oc * oc, axis=1) - 100.0**2
        disc = b2 * b2 - a * c
        hit = disc >= 0
        tq = (-b2 - np.sqrt(np.maximum(disc, 0))) / a
        t = np.where(hit & (tq > 1e-3), tq.astype(np.float32), t)

        # dense treelet entries
        t0s = (bmin[None] - o[:, None]) * iv[:, None]
        t1s = (bmax[None] - o[:, None]) * iv[:, None]
        near = np.maximum(np.minimum(t0s, t1s).max(2), 0.0)  # (P, K)
        far = np.maximum(t0s, t1s).min(2)
        ok = (far >= near) & (near <= t[:, None])
        entry = np.where(ok, near, 3.0e38).min(0)  # (K,)

        order = np.argsort(entry)
        for tid in order:
            e = entry[tid]
            if e >= 3.0e38 or e > t.max():
                break
            # refresh per-lane cull at visit time (production culls with
            # the CURRENT t-cap per step via the per-lane ok mask)
            lane_ok = ok[:, tid] & (near[:, tid] <= t)
            if not lane_ok.any():
                continue
            visits += 1
            tv = tre_tris[tid]
            pairs += P * L  # dense MT cost (padded to L)

            # sub-block survival under the same rule
            alive_subs = 0
            for smin, smax, cnt in sub_boxes[tid]:
                ts0 = (smin[None] - o) * iv
                ts1 = (smax[None] - o) * iv
                sn = np.maximum(np.minimum(ts0, ts1).max(1), 0.0)
                sf = np.maximum(ts0, ts1).min(1)
                sok = (sf >= sn) & (sn <= t) & lane_ok
                if sok.any():
                    alive_subs += 1
                    sub_pairs += P * Ls
                    subvisits += 1
            sub_hist[alive_subs] += 1

            # exact Moller-Trumbore t update (lockstep semantics)
            p0 = tv[:, 0][None]  # (1, n, 3)
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

    nrays = len(sample) * P
    tot = sum(sub_hist.values())
    print(f"simulated {nrays} primary rays in {time.time()-t0:.1f}s")
    print(f"visits/ray:        {visits * P / nrays:.1f}")
    print(f"pairs/ray (L={L}):  {pairs / nrays:.0f}")
    print("sub-block survival per visit (count:share): "
          + ", ".join(f"{k}:{v / max(tot, 1):.0%}" for k, v in sorted(sub_hist.items())))
    print(f"pairs/ray if only surviving sub-blocks tested: {sub_pairs / nrays:.0f}")
    print(f"sub-granularity visits/ray (leaf-{Ls} sweep):   {subvisits * P / nrays:.1f}")


if __name__ == "__main__":
    main()
