"""Image output & display conversion.

Reference: linear_to_gamma + preview kernels pack float color to RGBA8 with
gamma 1/2.2 (src/lib/path_tracer.cu:221-225, 334-385); PNG writing via stb
(src/lib/image.cpp:9-22)."""

from __future__ import annotations

import numpy as np


def linear_to_gamma(color: np.ndarray) -> np.ndarray:
    return np.power(np.maximum(color, 0.0), 1.0 / 2.2)


def to_uint8(color: np.ndarray, normalization: str = "none") -> np.ndarray:
    """Float buffer (..., 3) -> uint8, reference preview_kernel semantics:
    optional [-1,1]->[0,1] remap (normals), gamma, clamp*255.99."""
    c = np.asarray(color, np.float32)
    if normalization == "neg1_1_to_0_1":
        c = c * 0.5 + 0.5
    c = linear_to_gamma(c)
    return (np.clip(c, 0.0, 1.0) * 255.99).astype(np.uint8)


def depth_to_uint8(depth: np.ndarray) -> np.ndarray:
    """Depth display = gamma(1/depth) greyscale (preview_depth_kernel,
    src/lib/path_tracer.cu:334-356)."""
    with np.errstate(divide="ignore"):
        v = 1.0 / np.asarray(depth, np.float32)
    g = to_uint8(np.repeat(v[..., None], 3, axis=-1))
    return g


def write_image_file(path: str, rgb_uint8: np.ndarray) -> None:
    """Write an RGB(A) uint8 image as PNG."""
    from PIL import Image

    Image.fromarray(rgb_uint8).save(path)
