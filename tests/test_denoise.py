"""À-trous denoiser tests: golden parity with a literal per-pixel loop
implementation of the reference kernel
(edge_avoiding_a_trous_denoiser.cu:24-86) and invariance properties."""

import numpy as np
import jax.numpy as jnp

from tpupt.core.camera import generate_rays, make_camera, pixel_centers
from tpupt.denoise.atrous import atrous_denoise, atrous_pass, _position_planes

KERNEL = [3 / 8, 1 / 4, 1 / 16]


def _naive_pass(color, normal, pos, step, c_phi, n_phi, p_phi):
    """Literal transcription of the reference per-pixel kernel (with the
    clamp fixed to width-1/height-1)."""
    h, w = color.shape[:2]
    out = np.zeros_like(color)
    for y in range(h):
        for x in range(w):
            cval, nval, pval = color[y, x], normal[y, x], pos[y, x]
            s = np.zeros(3)
            cum = 0.0
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    u = min(max(x + dx * step, 0), w - 1)
                    v = min(max(y + dy * step, 0), h - 1)
                    ct, nt, pt = color[v, u], normal[v, u], pos[v, u]
                    cw = min(np.exp(-np.sum((cval - ct) ** 2) / c_phi), 1.0)
                    nw = min(np.exp(-max(np.sum((nval - nt) ** 2) / step**2, 0.0) / n_phi), 1.0)
                    pw = min(np.exp(-np.sum((pval - pt) ** 2) / p_phi), 1.0)
                    wgt = cw * nw * pw * KERNEL[min(abs(dx), abs(dy))]
                    s += ct * wgt
                    cum += wgt
            out[y, x] = s / cum
    return out


def test_pass_matches_naive_loop():
    rng = np.random.default_rng(0)
    h, w = 10, 12
    color = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    normal = rng.normal(0, 1, (h, w, 3)).astype(np.float32)
    pos = rng.uniform(-2, 2, (h, w, 3)).astype(np.float32)
    for step in (1, 2, 4):
        ours = np.asarray(
            atrous_pass(jnp.asarray(color), jnp.asarray(normal), jnp.asarray(pos),
                        step, 0.45, 0.30, 0.25)
        )
        ref = _naive_pass(color, normal, pos, step, 0.45, 0.30, 0.25)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_constant_image_is_fixed_point():
    h = w = 16
    color = jnp.full((h, w, 3), 0.4)
    normal = jnp.full((h, w, 3), 0.0).at[..., 2].set(1.0)
    depth = jnp.full((h, w), 2.0)
    cam = make_camera(vfov=np.pi / 2)
    out = atrous_denoise(color, normal, depth, cam, filter_size=4)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-5)


def test_denoise_reduces_noise_preserves_edges():
    rng = np.random.default_rng(1)
    h = w = 32
    # two flat regions + noise; G-buffers carry the edge
    clean = np.where(np.arange(w)[None, :, None] < w // 2, 0.2, 0.8).astype(np.float32)
    clean = np.repeat(clean, 3, axis=2) * np.ones((h, 1, 3), np.float32)
    noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2, 0] = 1.0
    normal[:, w // 2 :, 2] = 1.0
    depth = np.broadcast_to(
        np.where(np.arange(w)[None, :] < w // 2, 1.0, 3.0), (h, w)
    ).astype(np.float32)
    cam = make_camera(vfov=np.pi / 2)
    out = np.asarray(
        atrous_denoise(jnp.asarray(noisy), jnp.asarray(normal), jnp.asarray(depth), cam, filter_size=8)
    )
    # noise (variance within each region) drops a lot
    for sl in (np.s_[:, 2 : w // 2 - 2], np.s_[:, w // 2 + 2 : -2]):
        assert out[sl].std() < 0.35 * noisy[sl].std()
    # edge magnitude preserved within 20%
    edge = out[:, w // 2 + 1].mean() - out[:, w // 2 - 2].mean()
    assert edge > 0.8 * 0.6


def test_positions_from_depth_matches_rays():
    cam = make_camera(position=(1, 0, 0), vfov=np.pi / 3)
    h, w = 8, 8
    depth = jnp.full((h, w), 2.5)
    pos = np.stack([np.asarray(p) for p in _position_planes(depth, cam)], axis=-1)
    fx, fy = pixel_centers(w, h)
    ro, rd = generate_rays(cam, w, h, fx, fy)
    expect = np.asarray((ro + rd * 2.5).to_array()).reshape(h, w, 3)
    np.testing.assert_allclose(pos, expect, atol=1e-6)


def test_denoise_is_differentiable():
    import jax

    cam = make_camera(vfov=np.pi / 2)
    h = w = 8
    rng = np.random.default_rng(2)
    color = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    normal = jnp.zeros((h, w, 3)).at[..., 2].set(1.0)
    depth = jnp.full((h, w), 2.0)

    def loss(c):
        return jnp.sum(atrous_denoise(c, normal, depth, cam, filter_size=2) ** 2)

    g = jax.grad(loss)(color)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
