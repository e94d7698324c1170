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

# Lazy re-exports (PEP 562).  Eager imports would pull in jax.numpy
# constants at import time, which initializes the XLA backend — that
# breaks multi-host startup, where `jax.distributed.initialize` must run
# before ANY backend-touching call (tpupt.dist.sharding.init_distributed
# is importable pre-init precisely because of this), and it slows CLI
# startup for --help-style invocations.
_EXPORTS = {
    "Camera": ("tpupt.core.types", "Camera"),
    "Materials": ("tpupt.core.types", "Materials"),
    "SceneArrays": ("tpupt.core.types", "SceneArrays"),
    "RenderBuffers": ("tpupt.core.types", "RenderBuffers"),
    "SceneDescription": ("tpupt.scene.description", "SceneDescription"),
    "scene_from_json": ("tpupt.scene.json_parser", "scene_from_json"),
    "render_image": ("tpupt.render.integrator", "render_image"),
    "trace_sample": ("tpupt.render.integrator", "trace_sample"),
    "PathTracer": ("tpupt.render.progressive", "PathTracer"),
    "atrous_denoise": ("tpupt.denoise.atrous", "atrous_denoise"),
}


def __getattr__(name):
    try:
        module, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'tpupt' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))


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
