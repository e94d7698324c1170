"""Treelet cut functions: structural contracts.

_cut_bvh is the production cut; _cut_bvh_sah is the SAH-cost DP cut —
kept as a measured NEGATIVE result (sec_stats.py: +12% pairs/ray, K
doubles; DESIGN.md round 4) but maintained correct: both must partition
the triangle set, respect the leaf bound, and the DP cut must achieve
summed treelet surface area <= the production cut's (the production cut
is a feasible point of the DP's objective)."""

import numpy as np

from tpupt.accel.bvh import build_bvh
from tpupt.accel.treelets import _cut_bvh, _cut_bvh_sah
from tpupt.scene.procedural import icosphere, torus_knot


def _check_partition(cut, n_tris, L):
    seen = np.concatenate(cut) if cut else np.zeros(0, np.int64)
    assert sorted(seen.tolist()) == list(range(n_tris))
    assert all(len(t) <= L for t in cut)


def _sum_sa(cut, v, f):
    tot = 0.0
    for tri_ids in cut:
        verts = v[f[tri_ids]].reshape(-1, 3)
        ext = verts.max(0) - verts.min(0)
        tot += 2.0 * (ext[0] * ext[1] + ext[1] * ext[2] + ext[0] * ext[2])
    return tot


def test_cuts_partition_and_leaf_bound():
    for v, f in (icosphere(3), torus_knot(segments=40, sides=6)):
        f = np.asarray(f, np.int32)
        bvh = build_bvh(v, f)
        for L in (8, 32):
            _check_partition(_cut_bvh(bvh, L), f.shape[0], L)
            _check_partition(_cut_bvh_sah(bvh, L), f.shape[0], L)


def test_sah_dp_cut_minimizes_summed_sa():
    for v, f in (icosphere(3), torus_knot(segments=40, sides=6)):
        f = np.asarray(f, np.int32)
        bvh = build_bvh(v, f)
        for L in (16, 32):
            prod = _sum_sa(_cut_bvh(bvh, L), v, f)
            dp = _sum_sa(_cut_bvh_sah(bvh, L), v, f)
            assert dp <= prod * (1 + 1e-6), (dp, prod)
