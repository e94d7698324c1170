"""Opt-in NaN/OOB debug mode (SURVEY.md §5 "sanitizers" plan).

The reference's only sanitizers are host-side ASAN/TSAN CMake flags that
never see device code (/root/reference/cmake/compiler.cmake); the TPU
analogue is `jax.experimental.checkify`.  A blanket
``checkify.float_checks`` would false-positive: the hot path *intends*
NaN/inf arithmetic (slab tests divide by zero direction components and
multiply the resulting infs — DESIGN.md).  So the debug mode is targeted:
`check_finite` guards the *outputs* of each bounce (radiance, throughput,
geometry), and `checked_jit` discharges them plus automatic out-of-bounds
index checks.

Usage:
    TPUPT_DEBUG=1 python -m tpupt.cli scene.json -o out.png
or in code:
    fn = checked_jit(render)   # raises JaxRuntimeError on NaN/OOB
"""

from __future__ import annotations

import functools
import os

import jax


def enabled() -> bool:
    """Read TPUPT_DEBUG dynamically (tests toggle it per-case)."""
    return bool(os.environ.get("TPUPT_DEBUG"))


def check_finite(name: str, *arrays) -> None:
    """Under TPUPT_DEBUG, fail the computation if any array holds a
    non-finite value.  No-op (and zero trace cost) otherwise."""
    if not enabled():
        return
    from jax.experimental import checkify

    for i, a in enumerate(arrays):
        if not jax.numpy.issubdtype(a.dtype, jax.numpy.floating):
            continue
        checkify.check(
            jax.numpy.all(jax.numpy.isfinite(a)),
            f"non-finite value in {name}[{i}]",
        )


def checked_jit(fn, **jit_kwargs):
    """jit(fn), discharging check_finite guards + automatic index checks
    when TPUPT_DEBUG is set; plain jit otherwise."""
    if not enabled():
        return jax.jit(fn, **jit_kwargs)
    from jax.experimental import checkify

    errs = checkify.user_checks | checkify.index_checks
    checked = jax.jit(checkify.checkify(fn, errors=errs), **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)  # raises JaxRuntimeError with the message
        return out

    return wrapper
