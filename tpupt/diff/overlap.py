"""Per-bounce gradient all-reduce — overlapping psum with the backward
bounce sweep (BASELINE north star: "scene-parameter gradients all-reduced
over ICI overlapped with the backward bounce sweep").

A single post-hoc psum of the final cotangents serializes: every chip
finishes its whole backward scan, THEN the collective runs while compute
sits idle.  `psum_in_backward` is an identity whose VJP psums the
cotangent; applied to the (replicated) scene pytree INSIDE the bounce
scan body, each bounce's parameter-cotangent contribution is all-reduced
as soon as that bounce's backward step produces it — XLA's async
collectives then overlap bounce i's all-reduce with bounce i-1's backward
compute.  psum is linear, so the sum of per-bounce psums equals the
post-hoc psum of the summed cotangents exactly (up to the same-order fp
addition both perform); tests/test_sharding.py asserts the grads still
match the single-device render.

VMA bookkeeping: the forward is `pvary` (device-invariant scene →
device-varying view), NOT a plain identity.  With an identity, shard_map's
VMA typing auto-inserts its own pvary where the invariant scene meets the
varying rays — and the transpose of that auto-pvary is a SECOND psum on
top of ours, multiplying every gradient by the device count (caught by
tests/test_sharding.py as an exact n_devices factor).  Owning the pvary
inside the custom_vjp makes our psum the one and only reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ident_psum_bwd(x, axis_name):
    return jax.lax.pcast(x, axis_name, to="varying")


def _fwd(x, axis_name):
    return jax.lax.pcast(x, axis_name, to="varying"), None


def _bwd(axis_name, _res, g):
    return (jax.lax.psum(g, axis_name),)


_ident_psum_bwd.defvjp(_fwd, _bwd)


def psum_in_backward(tree, axis_name: str):
    """Identity on ``tree``; in reverse mode, psums every floating leaf's
    cotangent over ``axis_name`` at the point of use (i.e. inside the
    enclosing scan iteration's backward)."""
    return jax.tree_util.tree_map(
        lambda x: _ident_psum_bwd(x, axis_name)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )
