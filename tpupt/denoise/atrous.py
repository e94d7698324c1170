"""Differentiable Edge-Avoiding À-Trous wavelet denoiser (Dammertz 2010).

Re-implements the reference kernel
(src/lib/denoising/edge_avoiding_a_trous_denoiser.cu:24-116) TPU-style:
instead of a per-pixel 5x5 gather kernel, each of the 25 dilated taps is an
edge-padded whole-image shift — pure dense VPU math that XLA fuses into a
handful of elementwise loops, and reverse-mode differentiable end-to-end
(BASELINE config 4 needs gradients *through* the denoiser).

Layout: all hot math runs on per-channel (H, W) PLANES.  On TPU the minor
axis maps to the 128 vector lanes, so an (H, W, 3) array uses 3 of 128
lanes on every elementwise op — the exact poison DESIGN.md measures at
~100x on the render path.  Channels are split once on entry and stacked
once on exit; every tap/weight op in between is full-width (H, W).

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


def _position_planes(depth: jnp.ndarray, camera: Camera):
    """(H, W) depth -> 3 world-position planes via pixel-center rays."""
    h, w = depth.shape
    fx, fy = cam.pixel_centers(w, h)
    ro, rd = cam.generate_rays(camera, w, h, fx, fy)  # Vec3 of (H*W,)
    pos = ro + rd * depth.reshape(-1)
    return [pos.x.reshape(h, w), pos.y.reshape(h, w), pos.z.reshape(h, w)]


def _shift(padded: jnp.ndarray, dy: int, dx: int, pad: int, h: int, w: int):
    """Slice an (H, W) window shifted by (dy, dx) out of an edge-padded
    plane; clamped-border semantics come from the 'edge' padding."""
    return padded[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def _atrous_pass_planes(
    cs: list, ns: list, ps: list, step: int,
    color_weight: float, normal_weight: float, position_weight: float,
) -> list:
    """One à-trous pass at dilation ``step`` over per-channel planes."""
    h, w = cs[0].shape
    pad = 2 * step
    pc = [jnp.pad(c, pad, mode="edge") for c in cs]
    pn = [jnp.pad(n, pad, mode="edge") for n in ns]
    pp = [jnp.pad(p, pad, mode="edge") for p in ps]

    step2 = jnp.float32(step * step)
    acc = [jnp.zeros_like(cs[0]) for _ in range(3)]
    cum_w = jnp.zeros_like(cs[0])
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            sy, sx = dy * step, dx * step
            ct = [_shift(p, sy, sx, pad, h, w) for p in pc]
            nt = [_shift(p, sy, sx, pad, h, w) for p in pn]
            pt = [_shift(p, sy, sx, pad, h, w) for p in pp]

            dc2 = sum((c - t) ** 2 for c, t in zip(cs, ct))
            c_w = jnp.minimum(jnp.exp(-dc2 / color_weight), 1.0)
            dn2 = sum((n - t) ** 2 for n, t in zip(ns, nt))
            n_w = jnp.minimum(
                jnp.exp(-jnp.maximum(dn2 / step2, 0.0) / normal_weight), 1.0
            )
            dp2 = sum((p - t) ** 2 for p, t in zip(ps, pt))
            p_w = jnp.minimum(jnp.exp(-dp2 / position_weight), 1.0)

            weight = c_w * n_w * p_w * _KERNEL[min(abs(dx), abs(dy))]
            acc = [a + t * weight for a, t in zip(acc, ct)]
            cum_w = cum_w + weight
    inv = 1.0 / cum_w
    return [a * inv for a in acc]


def atrous_pass(
    color: jnp.ndarray,
    normal: jnp.ndarray,
    pos: jnp.ndarray,
    step: int,
    color_weight: float,
    normal_weight: float,
    position_weight: float,
) -> jnp.ndarray:
    """One à-trous pass at dilation ``step`` (static int) over (H, W, 3)
    arrays — a convenience wrapper; the plane split/stack happens per
    call, so multi-pass callers should prefer ``atrous_denoise``."""
    out = _atrous_pass_planes(
        [color[..., i] for i in range(3)],
        [normal[..., i] for i in range(3)],
        [pos[..., i] for i in range(3)],
        step, color_weight, normal_weight, position_weight,
    )
    return jnp.stack(out, axis=-1)


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
    w.r.t. color/normal/depth and the camera.  Channels are split to
    (H, W) planes once here and stacked once at the end (layout note in
    the module docstring)."""
    ps = _position_planes(depth, camera)
    cs = [color[..., i] for i in range(3)]
    ns = [normal[..., i] for i in range(3)]
    step = 1
    while step <= filter_size:
        cs = _atrous_pass_planes(
            cs, ns, ps, step, color_weight, normal_weight, position_weight
        )
        step *= 2
    return jnp.stack(cs, axis=-1)
