"""tpupt — a TPU-native differentiable path tracer in JAX/Pallas.

A from-scratch re-design of the capabilities of LesleyLai/cuda-path-tracer
(reference surveyed in SURVEY.md) for TPU hardware:

  * sphere + triangle-mesh primitives loaded from the same JSON scene schema
    (reference: src/lib/assets/json_parser.cpp:174-224)
  * SAH BVH acceleration (reference: src/lib/accelerators/bvh.cpp:60-253),
    flattened depth-first with skip links for stackless lockstep traversal
  * progressive multi-bounce path tracing with diffuse / metal / dielectric
    BSDFs (reference: src/lib/path_tracer.cu:138-201)
  * Edge-Avoiding À-Trous wavelet denoiser as a differentiable post-pass
    (reference: src/lib/denoising/edge_avoiding_a_trous_denoiser.cu)
  * reverse-mode gradients w.r.t. materials, background light and vertex
    positions (an extension over the reference)
  * image-tile sharding over a `jax.sharding.Mesh` with psum gradient
    reduction for multi-chip / multi-host runs (extension; the reference is
    single-GPU only)

Design notes: everything on the device side is a pure function over pytrees
of flat arrays, compiled once under `jax.jit`; there is no per-bounce
host↔device round trip (the reference launches kernels and reads back a
compaction count every bounce, src/lib/path_tracer.cu:413-470).
"""

__version__ = "0.1.0"

from tpupt.core.types import Camera, Materials, SceneArrays, RenderBuffers
from tpupt.scene.description import SceneDescription
from tpupt.scene.json_parser import scene_from_json
from tpupt.render.integrator import render_image, trace_sample
from tpupt.render.progressive import PathTracer
from tpupt.denoise.atrous import atrous_denoise

__all__ = [
    "Camera",
    "Materials",
    "SceneArrays",
    "RenderBuffers",
    "SceneDescription",
    "scene_from_json",
    "render_image",
    "trace_sample",
    "PathTracer",
    "atrous_denoise",
]
