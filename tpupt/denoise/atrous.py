"""Differentiable Edge-Avoiding À-Trous wavelet denoiser (Dammertz 2010).

Re-implements the reference kernel
(src/lib/denoising/edge_avoiding_a_trous_denoiser.cu:24-116) TPU-style:
instead of a per-pixel 5x5 gather kernel, each of the 25 dilated taps is an
edge-padded whole-image shift — pure dense VPU math that XLA fuses into a
handful of elementwise loops, and reverse-mode differentiable end-to-end
(BASELINE config 4 needs gradients *through* the denoiser).

Semantics preserved from the reference:
  * B3-spline weights {3/8, 1/4, 1/16} indexed by min(|dx|, |dy|)  (cu:39,79)
  * edge-stopping weight = c_w * n_w * p_w with
      c_w = min(exp(-||dc||^2 / c_phi), 1)
      n_w = min(exp(-max(||dn||^2 / step^2, 0) / n_phi), 1)
      p_w = min(exp(-||dp||^2 / p_phi), 1)                         (cu:58-77)
  * world position reconstructed from the depth G-buffer by re-generating
    the pixel-center camera ray (cu:44-45, 71-72)
  * doubling step widths 1, 2, 4, ... <= filter_size               (cu:107)
  * taps clamp to the image border — the reference clamps to [0, width]
    (an off-by-one reading the next row, cu:51-54); we clamp to width-1,
    the obviously intended behavior (SURVEY.md §2.2 notes the quirk).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core import camera as cam
from tpupt.core.types import Camera

_KERNEL = (3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def _positions_from_depth(depth: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) world positions via pixel-center rays."""
    h, w = depth.shape
    fx, fy = cam.pixel_centers(w, h)
    ro, rd = cam.generate_rays(camera, w, h, fx, fy)  # Vec3 of (H*W,)
    pos = ro + rd * depth.reshape(-1)
    return pos.to_array().reshape(h, w, 3)


def _shift(padded: jnp.ndarray, dy: int, dx: int, pad: int, h: int, w: int):
    """Slice a (H, W, C) window shifted by (dy, dx) out of an edge-padded
    array; clamped-border semantics come from the 'edge' padding."""
    return padded[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def atrous_pass(
    color: jnp.ndarray,
    normal: jnp.ndarray,
    pos: jnp.ndarray,
    step: int,
    color_weight: float,
    normal_weight: float,
    position_weight: float,
) -> jnp.ndarray:
    """One à-trous pass at dilation ``step`` (static int)."""
    h, w = color.shape[:2]
    pad = 2 * step
    pc = jnp.pad(color, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    pn = jnp.pad(normal, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    pp = jnp.pad(pos, ((pad, pad), (pad, pad), (0, 0)), mode="edge")

    step2 = jnp.float32(step * step)
    acc = jnp.zeros_like(color)
    cum_w = jnp.zeros(color.shape[:2], color.dtype)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            ct = _shift(pc, dy * step, dx * step, pad, h, w)
            nt = _shift(pn, dy * step, dx * step, pad, h, w)
            pt = _shift(pp, dy * step, dx * step, pad, h, w)

            dc = color - ct
            c_w = jnp.minimum(
                jnp.exp(-jnp.sum(dc * dc, -1) / color_weight), 1.0
            )
            dn = normal - nt
            n_w = jnp.minimum(
                jnp.exp(-jnp.maximum(jnp.sum(dn * dn, -1) / step2, 0.0) / normal_weight),
                1.0,
            )
            dp = pos - pt
            p_w = jnp.minimum(
                jnp.exp(-jnp.sum(dp * dp, -1) / position_weight), 1.0
            )

            weight = c_w * n_w * p_w * _KERNEL[min(abs(dx), abs(dy))]
            acc = acc + ct * weight[..., None]
            cum_w = cum_w + weight
    return acc / cum_w[..., None]


def atrous_denoise(
    color: jnp.ndarray,
    normal: jnp.ndarray,
    depth: jnp.ndarray,
    camera: Camera,
    filter_size: int = 10,
    color_weight: float = 0.45,
    normal_weight: float = 0.30,
    position_weight: float = 0.25,
) -> jnp.ndarray:
    """Full denoise: doubling dilations while step <= filter_size.
    Inputs are (H, W, 3)/(H, W); returns (H, W, 3).  Fully differentiable
    w.r.t. color/normal/depth and the camera."""
    pos = _positions_from_depth(depth, camera)
    step = 1
    while step <= filter_size:
        color = atrous_pass(
            color, normal, pos, step, color_weight, normal_weight, position_weight
        )
        step *= 2
    return color
