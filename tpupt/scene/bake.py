"""Device-side re-baking of the world-space treelet table.

The packet intersector traces against world-space triangle data baked at
scene build (accel/treelets.py).  When an optimizer updates
``scene.positions`` (inverse rendering of vertex geometry), the baked
table goes stale; ``rebake_treelets`` recomputes it *on device* from the
current positions and object transforms — treelet topology (which triangle
sits in which slot) is reused, only the numbers are refreshed.  Pure jnp,
jit-friendly; call it inside the training loop after each update.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core.types import SceneArrays
from tpupt.render.intersect import _LaneMat
from tpupt.core import vec
from tpupt.core.vec import Vec3

_FAR = jnp.float32(3.0e37)


def world_slot_tris(scene: SceneArrays):
    """Differentiable world-space triangle data in SLOT order.

    Returns (w0, w1, w2, pad): Vec3s of (K*L,) world vertices per treelet
    slot, computed from ``scene.positions`` through the object transforms
    — the same elementwise math the build-time bake runs, so values match
    ``scene.tre_tris`` exactly after a rebake.  This is both rebake's
    core and the table the differentiable refine pass scatters vertex
    cotangents into (render/intersect._fetch_tri_rows)."""
    pad = scene.slot_src < 0
    src = jnp.maximum(scene.slot_src, 0)
    obj = jnp.maximum(scene.slot_obj, 0)

    i0 = scene.tri_idx[:, 0][src]
    i1 = scene.tri_idx[:, 1][src]
    i2 = scene.tri_idx[:, 2][src]
    px, py, pz = scene.positions[:, 0], scene.positions[:, 1], scene.positions[:, 2]
    m = _LaneMat(scene.obj_m, obj)
    w0 = vec.transform_point(m, Vec3(px[i0], py[i0], pz[i0]))
    w1 = vec.transform_point(m, Vec3(px[i1], py[i1], pz[i1]))
    w2 = vec.transform_point(m, Vec3(px[i2], py[i2], pz[i2]))
    return w0, w1, w2, pad


def rebake_treelets(scene: SceneArrays) -> SceneArrays:
    from tpupt.accel.treelets import BLOCK_COMPONENTS

    K, ncols = scene.tre_tris.shape
    L = scene.s_leaf_size
    assert ncols == BLOCK_COMPONENTS * L

    obj = jnp.maximum(scene.slot_obj, 0)
    w0, w1, w2, pad = world_slot_tris(scene)

    far = jnp.full_like(w0.x, _FAR)
    zero = jnp.zeros_like(w0.x)
    p0 = vec.where(pad, Vec3(far, far, far), w0)
    e1 = vec.where(pad, Vec3(zero, zero, zero), w1 - w0)
    e2 = vec.where(pad, Vec3(zero, zero, zero), w2 - w0)

    # component-major packing [p0, e1, e2, cn, obj] x L per treelet row
    # (accel/treelets.BLOCK_COMPONENTS): the in-register winner-metadata
    # channels (cross-normal, object id) rebake together with the geometry
    cn = e1.cross(e2)  # zero for pad slots (e1 = e2 = 0)
    obj_col = jnp.where(pad, -1.0, obj.astype(jnp.float32))
    comps = [
        p0.x, p0.y, p0.z, e1.x, e1.y, e1.z, e2.x, e2.y, e2.z,
        cn.x, cn.y, cn.z, obj_col,
    ]
    tre_tris = jnp.concatenate(
        [c.reshape(K, L) for c in comps], axis=1
    )

    # treelet AABBs over valid slots
    def minmax(c0, c1, c2):
        lo = jnp.minimum(jnp.minimum(c0, c1), c2)
        hi = jnp.maximum(jnp.maximum(c0, c1), c2)
        lo = jnp.where(pad, _FAR, lo).reshape(K, L).min(axis=1)
        hi = jnp.where(pad, -_FAR, hi).reshape(K, L).max(axis=1)
        return lo, hi

    vx0, vx1 = minmax(w0.x, w1.x, w2.x)
    vy0, vy1 = minmax(w0.y, w1.y, w2.y)
    vz0, vz1 = minmax(w0.z, w1.z, w2.z)
    tre_min = jnp.stack([vx0, vy0, vz0], axis=1)
    tre_max = jnp.stack([vx1, vy1, vz1], axis=1)

    return scene.replace(tre_tris=tre_tris, tre_min=tre_min, tre_max=tre_max)
