"""Multimesh-gap confirming experiment (round-5 verdict #7).

sec_stats.py diagnosed the multimesh config's 3.5x forward gap vs the
bunny flagship as WORKLOAD SHAPE: the metal/glass materials keep
specular chains alive at near-full width (65% of lanes at bounce1) and
maximally incoherent (1239 pairs/ray at bounce2), where the diffuse
flagship decays.  If that diagnosis is right, rendering the SAME
geometry with every material substituted to lambertian should close the
gap to roughly the primary-cost ratio (~1.6x — three meshes spread
across the frame cost more primaries regardless of materials).

This renders the shipped multi_mesh scene twice at the BASELINE config
(1024², 16 spp, mb=8, RR@4): stock materials vs all-lambertian (same
albedos, mat_type forced diffuse), and prints both rates.

Usage: python experiments/multimesh_diffuse.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from tpupt.utils.cache import setup_compile_cache

    setup_compile_cache("bench")

    from tpupt.bench.harness import _scene_multimesh, _timed
    from tpupt.core.types import MAT_DIFFUSE
    from tpupt.render.integrator import render_image

    scene, camera = _scene_multimesh()
    diffuse = scene.replace(
        materials=scene.materials.replace(
            mat_type=jnp.full_like(scene.materials.mat_type, MAT_DIFFUSE)
        )
    )
    fn = jax.jit(partial(
        render_image, width=1024, height=1024, spp=16, max_bounces=8,
        rr_start=4,
    ))
    for name, s in (("stock (metal+glass)", scene), ("all-lambertian", diffuse)):
        rays, secs = _timed(fn, (s, camera), 2)
        print(f"{name}: {rays/secs/1e6:.2f} Mrays/s ({rays} rays, {secs:.3f}s)")


if __name__ == "__main__":
    main()
