from tpupt.render.integrator import render_image, trace_sample
from tpupt.render.progressive import PathTracer

__all__ = ["render_image", "trace_sample", "PathTracer"]
