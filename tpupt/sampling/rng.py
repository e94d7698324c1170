"""Counter-based, shard-invariant RNG.

The reference seeds a thrust LCG per pixel with
``hash(hash(pixel_index) ^ iteration)`` and draws sequentially
(src/lib/path_tracer.cu:239, src/lib/ray_gen.cu:18, discard-per-bounce at
src/lib/path_tracer.cu:300-301).  A *stateful* stream is hostile to both
vectorization and sharding, so the TPU design makes the stream explicit:

    u = uniform(pixel_index, iteration, counter)

where ``counter`` statically encodes (bounce, lane).  The same function is
used by the jitted TPU renderer and the CPU reference renderer, so renders
are bit-identical regardless of device count or tile sharding — RNG depends
only on the global pixel index, never on the shard-local one (SURVEY.md §7
"RNG parity across sharding").

The hash is the reference's Wang-style integer hash (src/lib/hash.cuh:4-14),
which vectorizes to a handful of VPU uint32 ops.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
# Odd constant (2**32 / golden ratio) decorrelates successive counters.
_GOLDEN = jnp.uint32(0x9E3779B9)


def wang_hash(a: jnp.ndarray) -> jnp.ndarray:
    """The reference's integer hash (src/lib/hash.cuh:4-14), uint32 in/out."""
    a = a.astype(_U32)
    a = (a + _U32(0x7ED55D16)) + (a << 12)
    a = (a ^ _U32(0xC761C23C)) ^ (a >> 19)
    a = (a + _U32(0x165667B1)) + (a << 5)
    a = (a + _U32(0xD3A2646C)) ^ (a << 9)
    a = (a + _U32(0xFD7046C5)) + (a << 3)
    a = (a ^ _U32(0xB55A4F09)) ^ (a >> 16)
    return a


def pixel_seed(pixel_index: jnp.ndarray, iteration) -> jnp.ndarray:
    """Per-pixel-per-sample base seed: hash(hash(index) ^ iteration)
    (reference src/lib/path_tracer.cu:239)."""
    it = jnp.asarray(iteration).astype(_U32)
    return wang_hash(wang_hash(pixel_index) ^ it)


def uniform(seed: jnp.ndarray, counter) -> jnp.ndarray:
    """U[0,1) float32 from a base seed and a static draw counter.

    Counter layout used by the integrator (see render/integrator.py):
      0, 1             — sub-pixel jitter x, y
      2 + 16*b + lane  — bounce b draws: lane 0/1 sphere sample, 2 fresnel,
                         3 russian roulette, 4+2i/5+2i NEE sample for
                         light i (up to 6 lights)
    """
    c = jnp.asarray(counter).astype(_U32)
    bits = wang_hash(seed + c * _GOLDEN)
    # 24 mantissa-ish bits -> [0, 1); cheap and unbiased enough for MC.
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def jitter_counters():
    return 0, 1


def bounce_counter(bounce, lane: int):
    """Draw counter for (bounce, lane); bounce may be traced."""
    return 2 + jnp.asarray(bounce) * 16 + lane
