"""Hand-tiled Pallas kernel for the dense lockstep sweep STEP.

The production sweep (accel/packets.py) drives a compaction ladder of
`lax.while_loop` steps; each step is a fused XLA computation —
(sz, R*L, p) dense Möller–Trumbore producing into a 6-channel variadic
winner reduce — measured at ~25-60 Gpairs/s ≈ 4-10% of the VPU's
fused-chain f32 peak on v5e (DESIGN.md round-3 profile,
experiments/prof_step.py).  prof_step.py showed the reduce structure is
NOT the bottleneck (stripping the whole winner payload buys 7%): the
inefficiency is in how XLA schedules the fused gather+MT+reduce loop
nest itself.

This kernel is the below-XLA lever (VERDICT r3 #1): the SAME step —
pre-gathered treelet blocks in, 6 winner channels out — as ONE Pallas
kernel, structured as a REGISTER-RESIDENT FOLD over the pair axis:
for each pair j (static unroll over R*L), Möller–Trumbore runs on
(TM, 256) values (2 vregs each — every intermediate lives in vector
registers) and a strict-`<` running winner keeps 6 (TM, 256) state
channels.  Nothing but the inputs and the 6 winner outputs ever touches
VMEM.  [A first cut that mirrored XLA's (TM, R*L, 256) slab layout with
a tree reduce measured 14 Gpairs/s vs XLA's 25 at sz=2048 — each Mosaic
op materialized 16-vreg intermediates through VMEM; the fold formulation
exists precisely to avoid that.]

Exactness contract (arbitrated by tests/test_pallas_step.py):
  * identical MT formulas, f32, in the same written order as
    packets._dense_mt — but Mosaic's FMA-contraction choices may differ
    from XLA's fusion, so cross-impl t values are amplified-ulp close,
    not guaranteed bit-equal (the same caveat as tests/test_chained.py);
  * the fold's strict `<` keeps the EARLIEST pair j on exact-t ties,
    reproducing the XLA combiner's keep-left fold over the same
    reverse-fetch pair order — sequential later-visit-wins-ties
    semantics (packets._next_treelets_r), correct by construction
    (the fold order is literal, not implementation-defined).

It is NOT the rejected per-packet work-efficient kernel
(accel/pallas_sweep.py — sequential grids made per-packet while loops
latency-bound): the XLA ladder stays the driver and every grid step here
is dense lockstep work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_BIG = 3.0e38  # python float: pallas kernels cannot close over tracers
_MOLLER_EPS = 1e-7

# Packet rows per grid step.  The fold state is 6 (TM, 256) channels
# (~12 vregs at TM=8) + ~15 (TM, 256) MT intermediates per unrolled pair.
_TM = 8


def _step_kernel(
    rox_ref, roy_ref, roz_ref,  # (TM, p) ray origins
    rdx_ref, rdy_ref, rdz_ref,  # (TM, p) ray directions
    tmin_ref, tcap_ref,  # (TM, p)
    comps_ref,  # (TM, 13, RL) gathered blocks, component-major
    live_ref,  # (TM, RL) f32 1/0 per-pair-row validity
    slots_ref,  # (TM, RL) i32 global slot ids
    t_out, slot_out, nx_out, ny_out, nz_out, obj_out,  # (TM, p)
):
    rl = comps_ref.shape[2]

    ox, oy, oz = rox_ref[...], roy_ref[...], roz_ref[...]  # (TM, p)
    dx, dy, dz = rdx_ref[...], rdy_ref[...], rdz_ref[...]
    tmin, tcap = tmin_ref[...], tcap_ref[...]
    comps = comps_ref[...]  # (TM, 13, RL)
    live = live_ref[...]
    slots = slots_ref[...]

    t_b = jnp.full(ox.shape, _BIG, jnp.float32)
    s_b = jnp.zeros(ox.shape, jnp.int32)
    nx_b = jnp.zeros(ox.shape, jnp.float32)
    ny_b = jnp.zeros(ox.shape, jnp.float32)
    nz_b = jnp.zeros(ox.shape, jnp.float32)
    ob_b = jnp.full(ox.shape, -1.0, jnp.float32)

    for j in range(rl):  # static unroll: every intermediate stays in vregs
        def tri(c):  # (TM, 1) triangle component j, broadcasts over lanes
            return comps[:, c, j][:, None]

        p0x, p0y, p0z = tri(0), tri(1), tri(2)
        e1x, e1y, e1z = tri(3), tri(4), tri(5)
        e2x, e2y, e2z = tri(6), tri(7), tri(8)

        # Möller–Trumbore, same formulas/order as packets._dense_mt
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        f = 1.0 / jnp.where(jnp.abs(a) < _MOLLER_EPS, 1.0, a)
        sx, sy, sz_ = ox - p0x, oy - p0y, oz - p0z
        u = f * (sx * hx + sy * hy + sz_ * hz)
        qx = sy * e1z - sz_ * e1y
        qy = sz_ * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = (
            (jnp.abs(a) >= _MOLLER_EPS)
            & (u >= 0.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin)
            & (t <= tcap)
            & (live[:, j][:, None] > 0.0)
        )
        tj = jnp.where(ok, t, _BIG)
        # strict <: the EARLIEST pair j wins exact-t ties (keep-left)
        take = tj < t_b
        t_b = jnp.where(take, tj, t_b)
        s_b = jnp.where(take, slots[:, j][:, None], s_b)
        nx_b = jnp.where(take, tri(9), nx_b)
        ny_b = jnp.where(take, tri(10), ny_b)
        nz_b = jnp.where(take, tri(11), nz_b)
        ob_b = jnp.where(take, tri(12), ob_b)

    t_out[...] = t_b
    slot_out[...] = s_b
    nx_out[...] = nx_b
    ny_out[...] = ny_b
    nz_out[...] = nz_b
    obj_out[...] = ob_b


def winner_step_pallas(rows, comps, live, slots, interpret: bool = False,
                       tm: int | None = None):
    """One dense sweep step as a Pallas kernel.

    rows: dict with rox..rdz, tmin, t — each (sz, p) f32 (t = per-lane
    residual cap, exactly as packets._dense_mt consumes it).
    comps: (sz, 13, RL) f32 — the R fetched blocks, component-major over
    the REVERSE-visit concatenated pair axis (packets._comp order).
    live:  (sz, RL) f32 1/0 pair-row validity.
    slots: (sz, RL) i32 global slot ids.

    Returns (t, slot, nx, ny, nz, obj), each (sz, p) — the raw winner
    channels (BIG / undefined where no pair hit; callers mask with
    t < BIG exactly as for packets._winner_reduce).
    """
    sz, p = rows["rox"].shape
    rl = comps.shape[2]
    tm = min(tm or _TM, sz)
    assert sz % tm == 0, (sz, tm)

    row_spec = pl.BlockSpec((tm, p), lambda i: (i, 0), memory_space=_VMEM)
    kw = {}
    if not interpret and pltpu is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        )
    out = pl.pallas_call(
        _step_kernel,
        grid=(sz // tm,),
        in_specs=[
            row_spec, row_spec, row_spec,  # ro
            row_spec, row_spec, row_spec,  # rd
            row_spec, row_spec,  # tmin, tcap
            pl.BlockSpec((tm, 13, rl), lambda i: (i, 0, 0), memory_space=_VMEM),
            pl.BlockSpec((tm, rl), lambda i: (i, 0), memory_space=_VMEM),
            pl.BlockSpec((tm, rl), lambda i: (i, 0), memory_space=_VMEM),
        ],
        out_specs=[row_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((sz, p), jnp.float32),
            jax.ShapeDtypeStruct((sz, p), jnp.int32),
            jax.ShapeDtypeStruct((sz, p), jnp.float32),
            jax.ShapeDtypeStruct((sz, p), jnp.float32),
            jax.ShapeDtypeStruct((sz, p), jnp.float32),
            jax.ShapeDtypeStruct((sz, p), jnp.float32),
        ],
        interpret=interpret,
        **kw,
    )(
        rows["rox"], rows["roy"], rows["roz"],
        rows["rdx"], rows["rdy"], rows["rdz"],
        rows["tmin"], rows["t"],
        comps, live.astype(jnp.float32), slots,
    )
    return tuple(out)
