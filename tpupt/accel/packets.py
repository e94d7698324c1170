"""Packet-treelet mesh intersection — the TPU production path.

Replaces the per-ray BVH walk for the ids pass (see accel/treelets.py for
why).  Pipeline per bounce, for the whole flat ray batch:

  phase 1  dense culling: every ray tests every treelet AABB (chunked
           (Np, P, Kc) slab tests, pure VPU, no gathers) -> per-packet
           hit mask + front-to-back entry distance per treelet
  phase 2  packet sweep over a COMPACTION LADDER: each rung runs a
           `lax.while_loop` where every step advances each unfinished
           packet to its next-nearest hit treelet (per-step argmin —
           argsort measured slower than the whole sweep), fetches that
           treelet's packed triangle block with ONE row-gather per packet,
           and runs dense (P, L) Moller-Trumbore with in-register winner
           normals.  A packet finishes when its hit list is exhausted or
           every live lane's closest hit is nearer than the next treelet's
           entry (front-to-back early termination — the analogue of the
           reference's per-ray t_max shrinking, src/lib/path_tracer.cu:62-64).

           A lockstep loop pays the MAX packet-visit count across the
           whole batch; the ladder exits each rung once <= 1/LADDER_DIV of
           its packets remain live, compacts those to the front with cheap
           contiguous ROW gathers (packet rows are ~1 KB — unlike per-lane
           gathers these run at full HBM bandwidth), and continues on a
           LADDER_DIV-times-smaller static slice.  Packets are mutually
           independent, so this is pure scheduling: results are
           bit-identical to the single-loop sweep.

Gather traffic: N/P row-gathers per sweep step (vs 5N per step for the
per-ray walk).  Every array in the hot math is component-SoA with a large
minor axis (P, L or Kc) — see core/vec.py for why (N, 3) arrays are
poison on TPU.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from tpupt.core.vec import Vec3

# rays per packet (sublane-major dim of the dense math).  128/256/512
# measured 7.65/7.95/6.23 Mrays/s at 1024² spp=4 (r2 regime); 256 stands.
# TPUPT_PACKET overrides for re-sweeps under new regimes (secondary
# treelet unions grow with P, so the chain ladder may shift the optimum).
PACKET = int(os.environ.get("TPUPT_PACKET", "256"))
_CULL_CHUNK = 128  # treelets per dense-culling chunk (lane dim)
# Shrink factor per ladder rung.  Each rung duplicates the sweep body in
# the program (compile cost ~1s/rung here), and a rung keeps ALL its rows
# stepping until <= sz/DIV packets remain live — so lockstep waste is
# bounded by DIV x optimal.  Measured on v5e, bunny 1024^2 spp=4:
# DIV=8 4.09 Mrays/s, DIV=4 5.03, DIV=2 5.86 (MIN 8 vs 32: no change).
# May be fractional (>1); TPUPT_LADDER_DIV overrides for sweeps
# (experiments/sweep_ladder.py).
_LADDER_DIV = float(os.environ.get("TPUPT_LADDER_DIV", "2"))
_LADDER_MIN = 32  # smallest rung (packets)
# fail fast on unusable knob values: DIV <= 1 makes the rung-size loops
# never shrink (a trace-time hang with unbounded list growth), and a
# non-multiple-of-128 packet breaks the lane-tiling assumptions the whole
# dense-math layout is built on (DESIGN.md)
if not _LADDER_DIV > 1.0:
    raise ValueError(f"TPUPT_LADDER_DIV must be > 1, got {_LADDER_DIV}")
if PACKET <= 0 or PACKET % 128 != 0:
    raise ValueError(f"TPUPT_PACKET must be a positive multiple of 128, got {PACKET}")
BIG = jnp.float32(3.0e38)
MOLLER_EPS = 1e-7  # reference EPSILON, src/lib/intersections.cuh:54


_SUPER = 16  # treelets per super-box (two-level cull; 8 vs 16 vs 32 measured 7.75/8.08/8.09 Mrays/s at 1024^2 spp=4)
_TWOLEVEL_MIN_K = 96  # engage the two-level cull above this treelet count

# Treelets fetched + MT-tested per sweep step (and supers expanded per
# expansion step): halves/quarters the lockstep trip count at unchanged
# total pair work, amortizing per-step selection + carry overhead.
# Measured on v5e (bunny 1024^2; fwd = spp16 headline, bwd = fwd+bwd
# spp4): R=1 26.9 fwd; R=2 28.1 fwd / 6.2 bwd; R=4 26.2 fwd / 6.6 bwd —
# step overhead is a real but minor term (+4%), and R=4's extra
# beyond-termination pair waste eats the forward gain.  R=2 stands.
# Winner semantics: the variadic reduce spans all R*L pairs with the
# fetched treelets concatenated in REVERSE visit order, which makes the
# keep-left-on-tie combiner reproduce sequential visits exactly — see
# _next_treelets_r (exact-t ties across treelets are real: shared-edge
# hits of unjittered rays).
FETCH_R = int(os.environ.get("TPUPT_FETCH_R", "2"))
# The DIFFERENTIABLE ids pass: r3 measured R=4 best (6.17/6.59/6.45 for
# 2/4/8) when residual-save stacking dominated; after the r4 2D-view
# saves fix the balance flipped — R=2 7.36, R=4 7.29, R=8 6.80 Mrays/s
# fwd+bwd (beyond-termination payload waste now outweighs the step
# amortization).  R=2 stands.
FETCH_R_DIFF = int(os.environ.get("TPUPT_FETCH_R_DIFF", "2"))

# Winner-selection lowering: "variadic" = one lax.reduce with a 6..15-
# channel tuple combiner; "minsum" = native min/compare/sum reduces only
# (see _winner_minsum).  Same winner on any UNIQUE-t minimum; on an
# exact-t tie between triangles in two treelets fetched in the same
# R-step they differ — minsum picks the lowest GLOBAL slot id, variadic
# keeps the LEFTMOST pair in reverse-fetch order (= the later-visited
# treelet, the repo's sequential-visit invariant).  minsum is dead code
# either way: measured (bunny 1024^2 spp16 fwd, v5e) variadic 28.1
# Mrays/s, minsum 18.2 — the separate native reduces force XLA to
# rematerialize or recompute the (sz, R*L, p) MT producer per consumer;
# the tuple combiner, though serial over the pair axis, reads it ONCE.
# Kept as a measured negative result (DESIGN.md round 3).
_WINNER_IMPL = "variadic"

# Above this padded treelet count, the sweep switches to LEXICOGRAPHIC
# selection: instead of clearing the fetched column of the (sz, kpad)
# entry array (a full-array read+write per fetch), each packet row
# carries the last fetched (entry, index) pair and the argmin pass masks
# everything lex-<= it — entries are consumed in strictly increasing
# (entry, index) order, so the carried pair IS the consumed set.  Entry
# becomes READ-ONLY: 3 O(K) traversals per step instead of ~7, exact
# same fetch order including ties.  Only pays off when the O(K) passes
# matter: at bunny scale (kpad=480) selection is ~2.5% of a sweep step;
# at ajax scale (kpad=3744) it is ~25% (DESIGN.md round-4 ajax profile).
_LEX_SEL_MIN_K = int(os.environ.get("TPUPT_LEX_SEL_MIN_K", "2048"))

# Above this padded treelet count, selection switches again: from lex
# (whose argmin still runs 3 O(K) traversals of the (sz, kpad) entry
# array per step — 25% of an ajax sweep step at K=3.7k, and linearly
# worse) to a PRIORITY QUEUE over the existing _SUPER-treelet groups
# with NO stored per-child entries at all: the cull phase produces only
# per-super child-min entries (np, ks), each sweep step argmins over
# supers (O(ks)), RECOMPUTES the winning super's _SUPER child entries
# from the packed child-box table against the frozen seed t-cap
# (bit-equal to the expansion's values — _child_entries), lex-masks/
# argmins within them (O(_SUPER)), and compare-select-writes the one
# changed super min back (O(ks)).  Per-step selection cost drops from
# O(kpad) to O(kpad/16) + one 16-box slab test (~14% of the step's MT
# flops), and the O(np * kpad) entry array disappears from memory and
# from every rung compaction — which is what survives the reference's
# real ajax scale (K ~ 10^4-10^5, several hundred thousand triangles).
# Storing the entries and gathering 16-wide rows measured WORSE than
# lex at K=14.8k: TPU tiled layouts turn both the (sz*ks, 16) gather
# view and a per-row scatter-min into whole-array copies per step (r5,
# two failed formulations before this one).  Fetch order is IDENTICAL
# to clear/lex selection including exact-entry ties: the global (entry,
# index) argmin factors exactly through (per-super min, leftmost super
# on ties) because a tied lower index lives in a lower-id super.
_SUPER_SEL_MIN_K = int(os.environ.get("TPUPT_SUPER_SEL_MIN_K", "8192"))


def _ladder_sizes(np_: int) -> list[int]:
    sizes = []
    sz = np_
    while True:
        sizes.append(sz)
        if sz <= _LADDER_MIN:
            break
        sz = max(_LADDER_MIN, int(sz / _LADDER_DIV))
    return sizes


def _run_ladder(full, make_step, live_of, max_steps):
    """Compaction-ladder driver shared by the sweep, the two-level cull
    expansion and the any-hit shadow sweep.

    ``full`` is a dict of (np, ...) per-packet row arrays that MUST
    include an i32 "src" row (original packet index).  Each rung runs
    ``make_step(sz)`` on the leading ``sz`` rows until at most
    sz/_LADDER_DIV of them are live per ``live_of`` (or ``max_steps``),
    then stable-compacts live rows to the front (packet-level argsort is
    tiny; the row moves are contiguous gathers at full HBM bandwidth) and
    continues on the next static slice.  Rows are mutually independent,
    so this is pure scheduling: results are bit-identical to a flat loop.

    Returns the dict in PERMUTED order — un-permute outputs through
    ``full["src"]``.
    """
    np_ = full["src"].shape[0]
    sizes = _ladder_sizes(np_)
    for li, sz in enumerate(sizes):
        sub = {k: v[:sz] for k, v in full.items()}
        is_last = li == len(sizes) - 1
        threshold = 0 if is_last else int(sz / _LADDER_DIV)
        step = make_step(sz)

        def cond(carry, threshold=threshold):
            i, r = carry
            count = jnp.sum(live_of(r), dtype=jnp.int32)
            return (i < max_steps) & (count > threshold)

        def body(carry):
            i, r = carry
            return i + 1, step(r)

        _, sub = lax.while_loop(cond, body, (jnp.int32(0), sub))

        full = {k: v.at[:sz].set(sub[k]) for k, v in full.items()}
        if not is_last:
            order = jnp.argsort(~live_of(sub), stable=True).astype(jnp.int32)
            perm = {k: v[order] for k, v in sub.items()}
            full = {k: v.at[:sz].set(perm[k]) for k, v in full.items()}
    return full


def _entry_dense(bmin, bmax, rows, act_p):
    """Dense packet-vs-box cull: conservative per-packet entry distance
    for EVERY box (chunked over the box axis).  (np, Kb) with +BIG where
    no live lane hits."""
    ivx, ivy, ivz = 1.0 / rows["rdx"], 1.0 / rows["rdy"], 1.0 / rows["rdz"]
    kb = bmin.shape[0]

    def axis_near_far(bmin_c, bmax_c, o, iv):
        t0 = (bmin_c[None, None, :] - o[:, :, None]) * iv[:, :, None]
        t1 = (bmax_c[None, None, :] - o[:, :, None]) * iv[:, :, None]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    chunks = []
    for c0 in range(0, kb, _CULL_CHUNK):
        c1 = min(c0 + _CULL_CHUNK, kb)
        nx0, fx0 = axis_near_far(bmin[c0:c1, 0], bmax[c0:c1, 0], rows["rox"], ivx)
        ny0, fy0 = axis_near_far(bmin[c0:c1, 1], bmax[c0:c1, 1], rows["roy"], ivy)
        nz0, fz0 = axis_near_far(bmin[c0:c1, 2], bmax[c0:c1, 2], rows["roz"], ivz)
        near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)  # (np, p, Kc)
        far = jnp.minimum(jnp.minimum(fx0, fy0), fz0)
        # per-lane t-cap: a box whose entry lies beyond the lane's current
        # best t (rows["t"], e.g. the sphere-pass seed — or the light
        # distance for shadow rays) cannot improve that lane; if no live
        # lane can improve, the box is skipped.  Result-identical: any hit
        # inside has t >= near > t_lane, which the sweep would reject.
        hit = (
            (far >= near)
            & (far >= rows["tmin"][..., None])
            & (near <= rows["t"][..., None])
            & act_p[..., None]
        )
        chunks.append(jnp.min(jnp.where(hit, jnp.maximum(near, 0.0), BIG), axis=1))
    return jnp.concatenate(chunks, axis=-1)


def _padded_boxes(scene):
    """Treelet AABBs padded to a _SUPER multiple (empty min>max pads)."""
    K = scene.tre_min.shape[0]
    kpad = -(-K // _SUPER) * _SUPER
    bmin, bmax = scene.tre_min, scene.tre_max
    if kpad != K:
        # empty-box padding (min > max): never hit, +BIG entries
        bmin = jnp.concatenate([bmin, jnp.full((kpad - K, 3), BIG)], axis=0)
        bmax = jnp.concatenate([bmax, jnp.full((kpad - K, 3), -BIG)], axis=0)
    return bmin, bmax, K, kpad, kpad // _SUPER


def _childtab(scene):
    """Packed per-super child AABBs, component-major per super row:
    [minx*_SUPER, miny*_SUPER, minz*_SUPER, maxx*_SUPER, ...] —
    (ks, 6*_SUPER).  Pure reshape of the scene tables (CSE'd by XLA)."""
    bmin, bmax, _, _, ks = _padded_boxes(scene)
    return jnp.concatenate(
        [
            bmin.reshape(ks, _SUPER, 3).transpose(0, 2, 1).reshape(ks, 3 * _SUPER),
            bmax.reshape(ks, _SUPER, 3).transpose(0, 2, 1).reshape(ks, 3 * _SUPER),
        ],
        axis=1,
    )


def _child_entries(cb, ox, oy, oz, ivx, ivy, ivz, tmin, tcap, act):
    """Exact child entry distances for gathered child-box rows ``cb``
    ((sz, C*_SUPER) with C groups as in _childtab; C*_SUPER box columns).
    MUST stay op-for-op identical to the expansion step's slab math in
    _entry_twolevel: the super-pq sweep recomputes the winning super's
    entries with this function and relies on bit-equality with the
    values the expansion minimized over (same single-rounded ops; the
    lane min is an exact reduction; no add-of-mul patterns for FMA
    contraction to perturb)."""
    ns = cb.shape[1] // 6

    def comp(a):
        return cb[:, a * ns : (a + 1) * ns][:, :, None]

    def nf(axis, o, iv):
        t0 = (comp(axis) - o[:, None, :]) * iv[:, None, :]
        t1 = (comp(3 + axis) - o[:, None, :]) * iv[:, None, :]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    nx0, fx0 = nf(0, ox, ivx)
    ny0, fy0 = nf(1, oy, ivy)
    nz0, fz0 = nf(2, oz, ivz)
    near = jnp.maximum(jnp.maximum(nx0, ny0), nz0)  # (sz, ns, p)
    far = jnp.minimum(jnp.minimum(fx0, fy0), fz0)
    hit = (
        (far >= near)
        & (far >= tmin[:, None, :])
        & (near <= tcap[:, None, :])
        & act[:, None, :]
    )
    return jnp.min(jnp.where(hit, jnp.maximum(near, 0.0), BIG), axis=2)


def _entry_twolevel(scene, rows, act_p, supmin_only=False):
    """Two-level cull: dense over _SUPER-treelet super-boxes, then a
    cheap expansion loop computing exact child entries for HIT supers
    only.

    ``supmin_only=False`` (clear/lex scale): returns the (np, kpad)
    per-child entry array, BIT-IDENTICAL to the dense one: child boxes
    are contained in their super (a missed super's children are all
    misses = +BIG), and the expansion slab math runs the same
    single-rounded ops per (ray, box) pair.

    ``supmin_only=True`` (super-pq scale, kpad >= _SUPER_SEL_MIN_K):
    returns only the (np, ks) PER-SUPER child-min array — the sweep
    recomputes the winning super's 16 child entries on demand
    (_child_entries, bit-equal by construction).  The (np, kpad) entry
    array is never materialized: at K ~ 1.5e4 its expansion writes,
    rung-compaction row moves and O(K) scans were ~35% of the render
    (r5 ajax_hi profile), and at the reference's 500k-tri scale it
    simply doesn't fit comfortably (4096 rows x 23k treelets = 380 MB).

    Caveat (measure-zero with jittered primaries, possible for exactly
    axis-aligned secondary rays in axis-aligned scenes): a ray with an
    exactly-zero direction component whose origin coordinate equals an
    aggregated super-box bound produces (bound-o)*inf = NaN in the
    super slab test, culling children the dense cull would keep.  The
    aggregated super plane need not coincide with any child plane, so
    this is the one input class where the two culls can differ.
    """
    bmin, bmax, K, kpad, ks = _padded_boxes(scene)
    sup_min = bmin.reshape(ks, _SUPER, 3).min(axis=1)
    sup_max = bmax.reshape(ks, _SUPER, 3).max(axis=1)
    sup_entry = _entry_dense(sup_min, sup_max, rows, act_p)  # (np, ks)

    childtab = _childtab(scene)

    np_ = rows["rox"].shape[0]
    iota_s = jnp.arange(ks, dtype=jnp.int32)[None, :]
    col_super = (jnp.arange(kpad, dtype=jnp.int32) // _SUPER)[None, :]
    # pad columns stay +BIG: the (min>max) empty pad boxes don't survive
    # the per-axis min/max normalization of the slab test, so their
    # entries must never be written
    col_valid = (jnp.arange(kpad, dtype=jnp.int32) < K)[None, :]
    # derive from a varying input for shard_map VMA typing
    zrow = rows["t"][:, :1] * 0.0

    # The expansion runs on the shared compaction ladder: a flat loop
    # would pay max-supers-hit lockstep across the whole batch (measured
    # 17.3 lockstep expansions/bounce at 1M bunny rays where the mean is
    # far lower — the r1 "known gap").  Rows carry everything the body
    # reads so rung compaction is a generic dict permute.
    er = dict(
        ox=rows["rox"], oy=rows["roy"], oz=rows["roz"],
        ivx=1.0 / rows["rdx"], ivy=1.0 / rows["rdy"], ivz=1.0 / rows["rdz"],
        tmin=rows["tmin"], tcap=rows["t"], act=act_p,
        sup=sup_entry,
        src=zrow[:, 0].astype(jnp.int32) + jnp.arange(np_, dtype=jnp.int32),
    )
    if supmin_only:
        er["supmin"] = jnp.full((np_, ks), BIG) + zrow
    else:
        er["entry"] = jnp.full((np_, kpad), BIG) + zrow

    def live_of(r):
        return jnp.min(r["sup"], axis=1) < BIG

    def make_step(sz):
        def step(r):
            # Advance to the FETCH_R nearest remaining hit supers per trip
            # (the expansion ladder is step-overhead-bound like the sweep;
            # amortizing carry/selection over R supers at unchanged total
            # slab work halves its lockstep trip count).
            sup = r["sup"]
            out = dict(r)
            for _ in range(FETCH_R):
                sid = jnp.argmin(sup, axis=1).astype(jnp.int32)  # (sz,)
                live = jnp.min(sup, axis=1) < BIG
                safe = jnp.where(live, sid, 0)
                sup = jnp.where(
                    (iota_s == sid[:, None]) & live[:, None], BIG, sup
                )
                cb = childtab[safe]  # (sz, 6*_SUPER) row gather
                ech = _child_entries(
                    cb, r["ox"], r["oy"], r["oz"],
                    r["ivx"], r["ivy"], r["ivz"],
                    r["tmin"], r["tcap"], r["act"],
                )  # (sz, _SUPER)
                ech = jnp.where(live[:, None], ech, BIG)
                if supmin_only:
                    # per-super child-min only: one (sz, ks) one-hot write
                    # — O(ks) instead of the O(kpad) entry-array write
                    out["supmin"] = jnp.where(
                        (iota_s == sid[:, None]) & live[:, None],
                        jnp.min(ech, axis=1)[:, None], out["supmin"],
                    )
                else:
                    # scatter-free write: tile matches col k with child
                    # k % _SUPER (the .at[rows, col].set form compiled to
                    # a per-step scatter at ~20x the HBM cost — r2)
                    efull = jnp.tile(ech, (1, ks))
                    mask = (
                        (col_super == sid[:, None]) & live[:, None] & col_valid
                    )
                    out["entry"] = jnp.where(
                        mask, jnp.minimum(out["entry"], efull), out["entry"]
                    )
            out["sup"] = sup
            return out

        return step

    full = _run_ladder(er, make_step, live_of, max_steps=ks)
    src = full["src"]
    if supmin_only:
        return (jnp.full((np_, ks), BIG) + zrow).at[src].set(full["supmin"])
    return (jnp.full((np_, kpad), BIG) + zrow).at[src].set(full["entry"])


def _pack_rows(ro: Vec3, rd: Vec3, t_min, t_cap, active):
    """Pad the flat ray batch to a packet multiple and fold to (np, p)
    per-packet rows.  ``t_cap`` is the per-lane residual search bound
    (closest-hit: the seed best-t; any-hit: the occlusion window end);
    dead lanes get -BIG so they never keep a packet alive."""
    n = ro.x.shape[0]
    pad = (-n) % PACKET

    def padded(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad else a

    rox, roy, roz = padded(ro.x, 0.0), padded(ro.y, 0.0), padded(ro.z, 0.0)
    rdx, rdy, rdz = padded(rd.x, 1.0), padded(rd.y, 1.0), padded(rd.z, 1.0)
    t_min = padded(t_min, 0.0)
    t_cap = padded(t_cap, -BIG)
    active = padded(active, False)
    np_, p = (n + pad) // PACKET, PACKET

    shp = (np_, p)
    rows = dict(
        rox=rox.reshape(shp), roy=roy.reshape(shp), roz=roz.reshape(shp),
        rdx=rdx.reshape(shp), rdy=rdy.reshape(shp), rdz=rdz.reshape(shp),
        tmin=t_min.reshape(shp),
    )
    act_p = active.reshape(shp)
    rows["t"] = jnp.where(act_p, t_cap.reshape(shp), -BIG)
    return rows, act_p, np_, p


def _cull_entries(scene, rows, act_p):
    """Phase 1: packet-vs-treelet culling.  Dense for small K; above
    _TWOLEVEL_MIN_K treelets the two-level scheme (_SUPER-treelet
    super-boxes + exact child expansion for hit supers only) computes the
    IDENTICAL entry array at ~1/8 the dense flops for typical hit rates
    (child ⊆ super, so an unexpanded super's children provably have no
    hits)."""
    if scene.tre_min.shape[0] >= _TWOLEVEL_MIN_K:
        return _entry_twolevel(scene, rows, act_p)
    return _entry_dense(scene.tre_min, scene.tre_max, rows, act_p)


def _remaining_min(r):
    """Per-row minimum entry among NOT-YET-FETCHED treelets.  With
    super-pq selection the carried per-super mins already exclude the
    consumed set (O(ks)); with lex selection the consumed set is
    everything lex-<= the carried (sel_val, sel_idx) pair; otherwise
    fetched columns hold BIG."""
    if "supmin" in r:
        return jnp.min(r["supmin"], axis=-1)
    entry = r["entry"]
    if "sel_val" in r:
        iota_k = jnp.arange(entry.shape[1], dtype=jnp.int32)[None, :]
        v, i = r["sel_val"][:, None], r["sel_idx"][:, None]
        remaining = (entry > v) | ((entry == v) & (iota_k > i))
        return jnp.min(jnp.where(remaining, entry, BIG), axis=-1)
    return jnp.min(entry, axis=-1)


def _packet_live(r):
    ent = _remaining_min(r)
    return (ent < BIG) & (ent <= jnp.max(r["t"], axis=1))


# Layout note: the dense MT runs on (sz, R*L, p) arrays — rays on the
# MINOR axis (p=256 = 2 full 128-lane vectors), triangles on sublanes.
# The transposed (sz, p, L) layout fills only 32 of 128 lanes with
# L=32 leaves (measured 4.3x slower at 1M rays).
def _comp(blocks, c, L):
    """[(sz, C*L)] blocks -> (sz, R*L, 1) component c, concatenated over
    the fetched treelets (component-major packing per block)."""
    cols = [b[:, c * L : (c + 1) * L] for b in blocks]
    cat = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    return cat[:, :, None]


def _next_treelets_r(scene, r, R, L):
    """Advance each packet to its R nearest remaining hit treelets.

    Returns (sel_updates dict — the state keys the step must write back
    into its carry — blocks [R x (sz, C*L)], live_pairs (sz, R*L) bool,
    slot_pairs (sz, R*L) i32 global slot ids).  Exhausted packets (fewer
    than R candidates left, or nearest entry beyond every live lane's
    best t) get masked fetches of row 0 — their pairs are killed by
    live_pairs, and their consumed set does NOT advance, exactly like
    the single-fetch step.

    Treelets are consumed in strictly increasing (entry, index) order.
    Two equivalent mechanisms, switched on the carried keys:
      * clear mode (small K): the fetched column of the entry array is
        overwritten with BIG by a compare-select (NOT a scatter: the
        .at[rows, tid].set(BIG) form compiled to a per-step scatter,
        ~0.05 ms/step at sz=512 — 20x the array's HBM cost);
      * lex mode ("sel_val"/"sel_idx" in the carry, big K — see
        _LEX_SEL_MIN_K): entry stays read-only and the argmin pass masks
        everything lex-<= the carried last-fetched (value, index) pair.
        Identical fetch order: the argmin keeps the lowest index among
        exact-entry ties, which is exactly lex order.

    The returned lists are in REVERSE fetch order (farthest first): the
    winner reduce keeps the LEFT operand on exact-t ties, so putting the
    later-visited (farther) treelet's pairs first reproduces sequential
    visit semantics bit-for-bit — a later visit's equal-t hit replaces an
    earlier one (`t <= r["t"]`).  Exact-t ties across treelets are NOT
    measure-zero in practice: an unjittered ray through a shared triangle
    edge hits both adjacent triangles at the same t (caught by
    tests/test_pallas_sweep.py's regular ray grid).
    """
    if "supmin" in r:
        return _next_treelets_super(scene, r, R, L)
    entry = r["entry"]
    lex = "sel_val" in r
    tmax = jnp.max(r["t"], axis=1)
    iota_k = jnp.arange(entry.shape[1], dtype=jnp.int32)[None, :]
    iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]
    sel_val = r.get("sel_val")
    sel_idx = r.get("sel_idx")
    blocks, lives, slots = [], [], []
    for _ in range(R):
        if lex:
            remaining = (entry > sel_val[:, None]) | (
                (entry == sel_val[:, None]) & (iota_k > sel_idx[:, None])
            )
            masked = jnp.where(remaining, entry, BIG)
        else:
            masked = entry
        ent = jnp.min(masked, axis=-1)
        tid = jnp.argmin(masked, axis=-1).astype(jnp.int32)
        valid = (ent < BIG) & (ent <= tmax)
        safe_tid = jnp.where(valid, tid, 0)
        if lex:
            sel_val = jnp.where(valid, ent, sel_val)
            sel_idx = jnp.where(valid, tid, sel_idx)
        else:
            entry = jnp.where(
                (iota_k == tid[:, None]) & valid[:, None], BIG, entry
            )
        blocks.insert(0, scene.tre_tris[safe_tid])
        lives.insert(
            0, jnp.broadcast_to(valid[:, None], (valid.shape[0], L))
        )
        slots.insert(0, safe_tid[:, None] * L + iota_l)
    cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1))
    sel_updates = (
        {"sel_val": sel_val, "sel_idx": sel_idx} if lex else {"entry": entry}
    )
    return sel_updates, blocks, cat(lives), cat(slots)


def _next_treelets_super(scene, r, R, L):
    """Super-pq variant of _next_treelets_r (see _SUPER_SEL_MIN_K): same
    return contract, same strictly-increasing (entry, index) consumption
    order — arbitrated bit-identical to clear/lex selection by
    tests/test_super_selection.py incl. exact-entry shared-edge ties.

    NO per-child entry array exists in this mode.  The carry holds the
    lex pair (sel_val, sel_idx), ``supmin`` (sz, ks) — the minimum entry
    among NOT-YET-CONSUMED treelets of each _SUPER-group — and the
    FROZEN cull inputs (t0 = the seed t-cap, act0): each step recomputes
    the winning super's 16 child entries from the packed child-box table
    (_child_entries), bit-equal to what the expansion minimized over
    (same single-rounded slab ops against the same frozen t0 — the
    entries are a pure function of (box row, ray, tmin, t0, act0)).
    Storing them was the O(K) scaling wall: at K=14.8k the (sz, kpad)
    array's expansion writes + rung-compaction moves + any per-row
    16-wide gather (which TPU tiled layouts turn into whole-array
    copies) were ~35% of the render (r5 ajax_hi profiles, two failed
    gather/scatter formulations included); recomputing costs ~14% of a
    sweep step's MT flops and touches O(ks + _SUPER*p) memory.

    Selecting the global lex-min via (argmin over supers, then argmin
    within the winning super's recomputed 16 entries) is exact: on an
    equal-value tie the leftmost super wins the outer argmin and the
    lowest index wins the inner one, which IS global (entry, index)
    order.  Consuming an entry only changes its own super's min — every
    other super's remaining set is untouched, and no remaining entry
    anywhere can be lex-below the new (sel_val, sel_idx) (it would have
    been selected instead), so the single-column compare-select update
    keeps supmin exact."""
    supmin = r["supmin"]
    sz, ks = supmin.shape
    childtab = _childtab(scene)
    ivx, ivy, ivz = 1.0 / r["rdx"], 1.0 / r["rdy"], 1.0 / r["rdz"]
    tmax = jnp.max(r["t"], axis=1)
    iota_ks = jnp.arange(ks, dtype=jnp.int32)[None, :]
    iota_s = jnp.arange(_SUPER, dtype=jnp.int32)[None, :]
    iota_l = jnp.arange(L, dtype=jnp.int32)[None, :]
    sel_val, sel_idx = r["sel_val"], r["sel_idx"]
    blocks, lives, slots = [], [], []
    for _ in range(R):
        val = jnp.min(supmin, axis=1)
        ssid = jnp.argmin(supmin, axis=1).astype(jnp.int32)
        valid = (val < BIG) & (val <= tmax)
        safe_ssid = jnp.where(valid, ssid, 0)
        cb = childtab[safe_ssid]  # (sz, 6*_SUPER) row gather
        es = _child_entries(
            cb, r["rox"], r["roy"], r["roz"], ivx, ivy, ivz,
            r["tmin"], r["t0"], r["act0"],
        )  # (sz, _SUPER) — bit-equal to the expansion's values
        gidx = safe_ssid[:, None] * _SUPER + iota_s
        rem = (es > sel_val[:, None]) | (
            (es == sel_val[:, None]) & (gidx > sel_idx[:, None])
        )
        masked = jnp.where(rem, es, BIG)
        li = jnp.argmin(masked, axis=1).astype(jnp.int32)
        tid = safe_ssid * _SUPER + li
        sel_val = jnp.where(valid, jnp.min(masked, axis=1), sel_val)
        sel_idx = jnp.where(valid, tid, sel_idx)
        # the winning super's new remaining-min, under the ADVANCED pair
        rem2 = (es > sel_val[:, None]) | (
            (es == sel_val[:, None]) & (gidx > sel_idx[:, None])
        )
        mnew = jnp.min(jnp.where(rem2, es, BIG), axis=1)
        supmin = jnp.where(
            (iota_ks == ssid[:, None]) & valid[:, None],
            mnew[:, None], supmin,
        )
        safe_tid = jnp.where(valid, tid, 0)
        blocks.insert(0, scene.tre_tris[safe_tid])
        lives.insert(
            0, jnp.broadcast_to(valid[:, None], (valid.shape[0], L))
        )
        slots.insert(0, safe_tid[:, None] * L + iota_l)
    cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1))
    sel_updates = {"sel_val": sel_val, "sel_idx": sel_idx, "supmin": supmin}
    return sel_updates, blocks, cat(lives), cat(slots)


def _super_mode(scene) -> bool:
    """Super-pq selection engages when the padded treelet count reaches
    _SUPER_SEL_MIN_K (two-level culling is always on well below that)."""
    K = scene.tre_min.shape[0]
    kpad = -(-K // _SUPER) * _SUPER
    return K >= _TWOLEVEL_MIN_K and kpad >= _SUPER_SEL_MIN_K


def _init_selection(scene, rows, act_p, np_):
    """Run the cull phase and attach the selection-mode carry keys:
    super-pq above _SUPER_SEL_MIN_K (per-super mins only, no entry
    array), lex above _LEX_SEL_MIN_K (read-only entry), clear-mode
    otherwise (entry, no extra keys)."""
    zf = rows["t"][:, 0] * 0.0
    if _super_mode(scene):
        rows["supmin"] = _entry_twolevel(scene, rows, act_p, supmin_only=True)
        rows["sel_val"] = zf - BIG
        rows["sel_idx"] = zf.astype(jnp.int32) - 1
        # frozen cull inputs for the in-step entry recompute
        rows["t0"] = rows["t"] + 0.0
        rows["act0"] = act_p
        return rows
    rows["entry"] = _cull_entries(scene, rows, act_p)
    if rows["entry"].shape[1] >= _LEX_SEL_MIN_K:
        # nothing is lex-<= the (-BIG, -1) init: the consumed set starts
        # empty
        rows["sel_val"] = zf - BIG
        rows["sel_idx"] = zf.astype(jnp.int32) - 1
    return rows


def _dense_mt(scene, blocks, r, live_pairs, L):
    """Dense Möller–Trumbore over gathered treelet blocks: (sz, R*L, p)
    pair masks + ts.  ``live_pairs`` is a (sz, R*L) per-pair-row validity
    mask (a broadcast (sz,) packet mask in the single-fetch callers).
    Returns (ok, t) — the winner reduction differs between closest-hit
    and any-hit callers."""
    p0x, p0y, p0z = _comp(blocks, 0, L), _comp(blocks, 1, L), _comp(blocks, 2, L)
    e1x, e1y, e1z = _comp(blocks, 3, L), _comp(blocks, 4, L), _comp(blocks, 5, L)
    e2x, e2y, e2z = _comp(blocks, 6, L), _comp(blocks, 7, L), _comp(blocks, 8, L)

    ox, oy, oz = r["rox"][:, None, :], r["roy"][:, None, :], r["roz"][:, None, :]
    dx, dy, dz = r["rdx"][:, None, :], r["rdy"][:, None, :], r["rdz"][:, None, :]

    # Moller-Trumbore, fully component-wise -> (sz, L, p) scalars
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
    # NOTE no explicit u <= 1 test: v >= 0 and u + v <= 1 imply it
    # (saves 2 VPU ops per pair on the hottest chain)
    ok = (
        (jnp.abs(a) >= MOLLER_EPS)
        & (u >= 0.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= r["tmin"][:, None, :])
        & (t <= r["t"][:, None, :])
        & live_pairs[:, :, None]
    )
    return ok, t


def _winner_reduce(t_masked, blocks, L, slot_pairs, extra_comps=(),
                   exact_ties: bool | None = None):
    """Single-pass winner selection over the R*L pair axis of a pair-test
    tensor.

    Variadic `lax.reduce` with a lexicographic min-by-(t, slot) combiner,
    carrying the GLOBAL slot id (``slot_pairs``) plus (nx, ny, nz, obj)
    from the packed blocks as payload — the fused equivalent of `argmin`
    + a one-hot metadata re-reduce, without the (sz, R*L, p) intermediate
    ever reaching HBM.  t_masked holds BIG on misses (never NaN: the MT
    `ok` mask rejects non-finite t).

    The strict `<` combiner keeps the LEFT element on ties, which is
    associative but NOT commutative; the init (BIG, 0, ..., -1) is not a
    strict identity (benign: callers mask with `got = t < BIG`).  XLA's
    reduce evaluation order is implementation-defined for non-commutative
    computations, so first-index tie-breaking on an EXACT-t tie relies on
    XLA keeping lower-index partials as the left operand (true for every
    backend/version tested; measured ~4% of the sweep's VPU ops to make
    explicit).  ``exact_ties`` (default: TPUPT_DEBUG) adds the explicit
    positional tie term — a pair-POSITION payload channel plus
    `(t_b == t_a) & (pos_b < pos_a)` in the combiner — making the
    combiner commutative and the keep-left fold correct BY CONSTRUCTION
    under any evaluation order.  The tie key is the pair-axis position
    (reverse-fetch order), NOT the global slot id: on a cross-treelet
    same-step exact-t tie those differ, and position is what reproduces
    sequential later-visit-wins semantics (_next_treelets_r).
    tests/test_tie_breaking.py arbitrates ON == OFF on an adversarial
    shared-edge ray grid; if OFF ever diverges on a new backend, flip
    the default and eat the 4%.

    ``extra_comps`` appends further block component payloads (the
    differentiable path rides the winner's p0/e1/e2 out of the sweep this
    way — one select per pair per channel, vs a per-lane row gather + the
    (N, 9)-minor layout poison it spreads, measured 45% of fwd+bwd).

    Returns (t, slot, nx, ny, nz, obj, *extras), each (sz, p).
    """
    if _WINNER_IMPL == "minsum":
        return _winner_minsum(t_masked, blocks, L, slot_pairs, extra_comps)
    if exact_ties is None:
        from tpupt.utils import debug

        exact_ties = debug.enabled()
    shape = t_masked.shape
    jb = jnp.broadcast_to(slot_pairs[:, :, None], shape)

    def bc(c):
        return jnp.broadcast_to(_comp(blocks, c, L), shape)

    operands = (t_masked, jb, bc(9), bc(10), bc(11), bc(12)) + tuple(
        bc(c) for c in extra_comps
    )
    inits = (
        BIG,
        jnp.int32(0),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.float32(-1.0),
    ) + tuple(jnp.float32(0.0) for _ in extra_comps)

    if exact_ties:
        pos = jnp.broadcast_to(
            jnp.arange(shape[1], dtype=jnp.int32)[None, :, None], shape
        )
        operands = (operands[0], pos) + operands[1:]
        inits = (inits[0], jnp.int32(2**31 - 1)) + inits[1:]

        def comb(a, b):
            take_b = (b[0] < a[0]) | ((b[0] == a[0]) & (b[1] < a[1]))
            return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

        out = lax.reduce(operands, inits, comb, dimensions=(1,))
        return out[:1] + out[2:]  # drop the position channel

    def comb(a, b):
        # Strict `<` keeps the LEFT element on ties at every tree level
        # (see the docstring's tie-breaking caveat); no explicit
        # (t ==) & (j <) term (measured ~10% of the combiner's VPU ops).
        take_b = b[0] < a[0]
        return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

    return lax.reduce(operands, inits, comb, dimensions=(1,))


def _winner_minsum(t_masked, blocks, L, slot_pairs, extra_comps=()):
    """Winner selection via NATIVE single-channel reduces only.

    A variadic tuple reduce lowers to a sequential combiner over the pair
    axis; native min/sum reduces vectorize.  Same winner on any unique-t
    minimum:

      1. t   = min over pairs of t_masked                (native min)
      2. slot = min over pairs of slot where t == t-min  (native min)
         -> the LOWEST GLOBAL slot id among exact-t ties.  NOTE this tie
         rule differs from the production variadic path, which keeps the
         leftmost pair in REVERSE-FETCH order (= the later-visited
         treelet): on an exact-t tie between triangles in two treelets
         fetched in the same R-step the two can disagree — and exact-t
         cross-treelet ties are real (shared-edge hits), so flipping
         _WINNER_IMPL to "minsum" would silently break the sequential
         later-visit-wins invariant.  (Within ONE treelet the rules
         coincide: reverse-fetch position and slot id are co-ordered.)
         Dead code today; a positional tie key (reverse-fetch slot rank)
         would be needed to make it exact.
      3. each metadata channel = sum over pairs of (slot_pair == slot) *
         value — exactly one pair matches, so the sum IS the selection
         (native add reduces; all share the MT producer in one fusion)
    """
    shape = t_masked.shape
    t_new = jnp.min(t_masked, axis=1)  # (sz, p)
    is_min = t_masked == t_new[:, None, :]
    slotb = jnp.broadcast_to(slot_pairs[:, :, None], shape)
    slot_new = jnp.min(
        jnp.where(is_min, slotb, jnp.int32(2**31 - 1)), axis=1
    )
    w = is_min & (slotb == slot_new[:, None, :])

    def sel(c):
        comp = jnp.broadcast_to(_comp(blocks, c, L), shape)
        return jnp.sum(jnp.where(w, comp, 0.0), axis=1)

    metas = tuple(sel(c) for c in (9, 10, 11, 12) + tuple(extra_comps))
    # no-hit lanes: every pair is BIG -> w is all-True garbage; callers
    # mask with got = t < BIG exactly as for the variadic path, but the
    # summed metadata must not overflow/NaN — BIG pads carry finite
    # block values (3e37 coords, 0 normals), and the obj channel must
    # come out negative on pads like the variadic init; both hold
    # because got masks every consumer.
    return (t_new, slot_new) + metas


# diff-payload block components (p0, e1, e2) and their extras keys
_DIFF_COMPS = (0, 1, 2, 3, 4, 5, 6, 7, 8)
_DIFF_KEYS = ("p0x", "p0y", "p0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z")


def sweep_step(scene, r, fetch_r, L, extra_keys, extra_comps, exact_ties):
    """ONE production closest-hit sweep step (the body every ladder rung
    while-loops): advance to the R nearest remaining treelets, dense MT,
    variadic winner reduce, carry update.  Module-level so
    experiments/flops_audit.py can compile and cost-analyze exactly the
    program the render runs (the round-4 structural-limit claim divided a
    measured pair rate by a HAND-ESTIMATED ~70 ops/pair; this makes the
    divisor measurable).

    Winner selection + metadata in ONE variadic reduce over the R*L pair
    axis: min-by-(t, slot) carrying the packed cross-normal and object id
    as payload.  The previous two-pass form (argmin, then a one-hot
    re-reduce over the same (sz, L, p) data for the metadata) forced XLA
    to MATERIALIZE the pair tensor between the passes — measured 35% of
    the forward render at 1M lanes (0.29 ms/step at sz=2048, HBM-bound on
    the 67 MB intermediate).  A single reduce keeps the whole MT chain as
    the reduce's fused producer; only (sz, p) outputs touch HBM.
    """
    sel_updates, blocks, live_pairs, slot_pairs = _next_treelets_r(
        scene, r, fetch_r, L
    )
    ok, t = _dense_mt(scene, blocks, r, live_pairs, L)
    t_masked = jnp.where(ok, t, BIG)
    t_new, new_slot, wnx, wny, wnz, wobj, *wextra = _winner_reduce(
        t_masked, blocks, L, slot_pairs, extra_comps,
        exact_ties=exact_ties,
    )
    got = t_new < BIG

    out = dict(r)
    out.update(sel_updates)
    out["t"] = jnp.where(got, t_new, r["t"])
    out["slot"] = jnp.where(got, new_slot, r["slot"])
    out["nx"] = jnp.where(got, wnx, r["nx"])
    out["ny"] = jnp.where(got, wny, r["ny"])
    out["nz"] = jnp.where(got, wnz, r["nz"])
    out["obj"] = jnp.where(got, wobj, r["obj"])
    for k, w in zip(extra_keys, wextra):
        out[k] = jnp.where(got, w, r[k])
    return out


def intersect_treelets(
    scene,
    ro: Vec3,  # components (N,)
    rd: Vec3,
    t_min: jnp.ndarray,  # (N,)
    t_seed: jnp.ndarray,  # (N,) current best t (e.g. from the sphere pass)
    active: jnp.ndarray,  # (N,)
    diff_payload: bool = False,
    exact_ties: bool | None = None,  # None -> TPUPT_DEBUG (see _winner_reduce)
):
    """Closest mesh hit for every ray.

    Returns (t (N,), slot (N,) global treelet-slot id or -1, extras).
    ``extras`` carries the winner's metadata selected IN-REGISTER during
    the sweep (keys nx/ny/nz = unnormalized cross(e1,e2) normal, obj =
    owning object id as f32, -1 for no hit): the packed block holds these
    as extra component runs (accel/treelets.BLOCK_COMPONENTS) and each
    step one-hot-reduces the argmin winner over L — a few VPU ops per
    pair.  The alternative (a per-lane row gather of a (K*L, 8) metadata
    table once per bounce) measured 33% of a 1M-lane render on v5e: the
    gather serializes per lane AND its (N, 8)-minor result poisons every
    consumer's layout (DESIGN.md round-2 profile).  Triangle ids (needed
    only by the differentiable refine pass) stay a per-bounce
    scene.slot_src gather so the forward path dead-code-eliminates it.
    """
    n = ro.x.shape[0]
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]

    rows, act_p, np_, p = _pack_rows(ro, rd, t_min, t_seed, active)

    # sweep outputs (derive from varying inputs for shard_map VMA typing)
    zero_p = rows["t"] * 0.0
    rows = _init_selection(scene, rows, act_p, np_)
    rows["slot"] = zero_p.astype(jnp.int32) - 1
    rows["nx"] = zero_p
    rows["ny"] = zero_p
    rows["nz"] = zero_p
    rows["obj"] = zero_p - 1.0
    extra_keys = _DIFF_KEYS if diff_payload else ()
    extra_comps = _DIFF_COMPS if diff_payload else ()
    for k in extra_keys:
        # non-degenerate defaults for never-updated lanes: a unit triangle
        # (e1=x̂, e2=ŷ) keeps refine's cross/normalize NaN-free on lanes
        # whose value is discarded but whose AD cotangent path still runs
        rows[k] = zero_p + (1.0 if k in ("e1x", "e2y") else 0.0)
    # original packet index, for the final un-permutation
    rows["src"] = (
        zero_p[:, 0].astype(jnp.int32) + jnp.arange(np_, dtype=jnp.int32)
    )

    fetch_r = FETCH_R_DIFF if diff_payload else FETCH_R

    def make_step(sz):
        def step(r):
            return sweep_step(
                scene, r, fetch_r, L, extra_keys, extra_comps, exact_ties
            )

        return step

    full = _run_ladder(rows, make_step, _packet_live, max_steps=K)

    # --- un-permute to original packet order ---------------------------
    src = full["src"]  # (np,) original packet id of each row
    t_best = jnp.zeros((np_, p)).at[src].set(full["t"]).reshape(-1)
    slot_best = jnp.zeros((np_, p), jnp.int32).at[src].set(full["slot"]).reshape(-1)
    extras = {
        k: jnp.zeros((np_, p)).at[src].set(full[k]).reshape(-1)[:n]
        for k in ("nx", "ny", "nz", "obj") + extra_keys
    }
    return t_best[:n], slot_best[:n], extras


def intersect_treelets_anyhit(
    scene,
    ro: Vec3,  # components (N,)
    rd: Vec3,
    t_min: jnp.ndarray,  # (N,)
    t_limit: jnp.ndarray,  # (N,) occlusion window end (e.g. light distance)
    active: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Any-hit occlusion sweep: True where ANY triangle hits in
    [t_min, t_limit].

    The shadow-ray variant of the packet sweep (VERDICT r1 #2): no winner
    bookkeeping, no argmin-over-L front-to-back selection — each step
    or-reduces the pair mask, sets occluded lanes' residual bound t to
    -BIG (which retires them from packet liveness and from the per-lane
    t-cap of every later pair test), and a packet exits the ladder as
    soon as every live lane is occluded or its hit list is exhausted.
    Per-lane t-caps also shrink the cull: treelets entirely beyond the
    light distance are never visited.
    """
    L = scene.s_leaf_size
    K = scene.tre_min.shape[0]
    n = ro.x.shape[0]

    rows, act_p, np_, p = _pack_rows(ro, rd, t_min, t_limit, active)
    rows = _init_selection(scene, rows, act_p, np_)
    rows["src"] = (rows["t"][:, 0] * 0.0).astype(jnp.int32) + jnp.arange(
        np_, dtype=jnp.int32
    )

    def make_step(sz):
        def step(r):
            sel_updates, blocks, live_pairs, _slots = _next_treelets_r(
                scene, r, FETCH_R, L
            )
            ok, _t = _dense_mt(scene, blocks, r, live_pairs, L)
            occ_new = jnp.any(ok, axis=1)  # (sz, p)
            out = dict(r)
            out.update(sel_updates)
            # occluded lanes stop mattering: -BIG removes them from the
            # packet's residual search bound (and equals "occluded" below)
            out["t"] = jnp.where(occ_new, -BIG, r["t"])
            return out

        return step

    full = _run_ladder(rows, make_step, _packet_live, max_steps=K)
    src = full["src"]
    t_out = jnp.zeros((np_, p)).at[src].set(full["t"]).reshape(-1)[:n]
    return active & (t_out == -BIG)
