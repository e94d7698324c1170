"""Regression test for the two-level cull's documented NaN edge case
(packets.py _entry_twolevel caveat; VERDICT r3 #8).

The feared input: an exactly-axis-aligned ray (zero direction component)
whose origin coordinate equals an AGGREGATED super-box bound.  The super
slab test then computes (bound - o) * inf = NaN, the super registers as a
miss, and its children are never expanded — while the dense cull tests
each child directly.

Containment makes this consistent, not divergent: the super bound on any
axis is the min/max envelope of its children's bounds, so if the ray
coordinate sits exactly ON the envelope, no child's interval strictly
straddles it on that axis — every child is either (a) also exactly on its
own bound there (its dense slab produces the same NaN -> miss), or
(b) strictly beyond (its dense slab yields an inf near/far ordering that
fails far >= tmin or far >= near -> miss).  A child the dense cull KEEPS
under a zero direction component needs min_c < o < max_c strictly, which
forces the super's envelope to strictly straddle o too — no NaN.  This
test constructs the exact documented scenario (plus a fuzz over every
box-bound coordinate) and asserts the two culls produce bit-identical
entries, turning the caveat from "possible divergence" into a verified
invariant.
"""

import types

import numpy as np
import jax.numpy as jnp

import tpupt.accel.packets as packets
from tpupt.accel.packets import PACKET, _entry_dense, _entry_twolevel


def _boxes_scene(k=128, seed=0):
    """k synthetic treelet AABBs with axis-aligned, integer-ish bounds so
    super aggregation produces planes rays can sit on exactly."""
    rng = np.random.default_rng(seed)
    lo = rng.integers(-4, 4, (k, 3)).astype(np.float32) * 0.5
    ext = (rng.integers(1, 5, (k, 3)).astype(np.float32)) * 0.5
    return types.SimpleNamespace(
        tre_min=jnp.asarray(lo), tre_max=jnp.asarray(lo + ext)
    )


def _rows_from(ro, rd):
    n = ro.shape[0]
    pad = (-n) % PACKET

    def p(a, fill):
        return np.concatenate([a, np.full((pad,), fill, a.dtype)]) if pad else a

    shp = ((n + pad) // PACKET, PACKET)
    rows = dict(
        rox=jnp.asarray(p(ro[:, 0], 0.0).reshape(shp)),
        roy=jnp.asarray(p(ro[:, 1], 0.0).reshape(shp)),
        roz=jnp.asarray(p(ro[:, 2], 0.0).reshape(shp)),
        rdx=jnp.asarray(p(rd[:, 0], 1.0).reshape(shp)),
        rdy=jnp.asarray(p(rd[:, 1], 1.0).reshape(shp)),
        rdz=jnp.asarray(p(rd[:, 2], 1.0).reshape(shp)),
        tmin=jnp.full(shp, 1e-4),
    )
    rows["t"] = jnp.full(shp, 3.0e38)
    act = jnp.asarray(p(np.ones((n,), bool), False).reshape(shp))
    return rows, act


def _assert_culls_match(scene, ro, rd):
    K = scene.tre_min.shape[0]
    rows, act = _rows_from(ro.astype(np.float32), rd.astype(np.float32))
    dense = np.asarray(_entry_dense(scene.tre_min, scene.tre_max, rows, act))
    two = np.asarray(_entry_twolevel(scene, rows, act))
    np.testing.assert_array_equal(two[:, :K], dense)


def test_axis_aligned_origin_on_super_bound():
    """The documented case, constructed deliberately: rays with one zero
    direction component whose origin coordinate equals each super-box
    bound on that axis (supers = _SUPER-row groups of the treelet table,
    exactly as _entry_twolevel aggregates them)."""
    scene = _boxes_scene()
    K = scene.tre_min.shape[0]
    S = packets._SUPER
    ks = K // S
    sup_min = np.asarray(scene.tre_min).reshape(ks, S, 3).min(axis=1)
    sup_max = np.asarray(scene.tre_max).reshape(ks, S, 3).max(axis=1)

    ro, rd = [], []
    for s in range(ks):
        for axis in range(3):
            for bound in (sup_min[s, axis], sup_max[s, axis]):
                for sign in (1.0, -1.0):
                    o = np.array([0.1, 0.2, 0.3])
                    o[axis] = bound  # origin exactly ON the aggregated plane
                    d = np.zeros(3)
                    d[axis] = 0.0  # zero component -> NaN slab math
                    d[(axis + 1) % 3] = sign  # travel within the plane
                    ro.append(o)
                    rd.append(d)
    _assert_culls_match(scene, np.asarray(ro), np.asarray(rd))


def test_axis_aligned_fuzz_all_child_bounds():
    """Fuzz: axis-aligned rays through EVERY child-box bound coordinate
    (covers origin-on-child-plane and diagonal-in-plane directions)."""
    scene = _boxes_scene(k=96, seed=3)
    lo = np.asarray(scene.tre_min)
    hi = np.asarray(scene.tre_max)
    rng = np.random.default_rng(7)
    ro, rd = [], []
    for axis in range(3):
        coords = np.unique(np.concatenate([lo[:, axis], hi[:, axis]]))
        for c in coords:
            o = rng.uniform(-3, 3, 3)
            o[axis] = c
            d = rng.normal(0, 1, 3)
            d[axis] = 0.0
            n = np.linalg.norm(d)
            ro.append(o)
            rd.append(d / (n if n > 0 else 1.0))
    _assert_culls_match(scene, np.asarray(ro), np.asarray(rd))
