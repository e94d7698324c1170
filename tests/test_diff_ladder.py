"""Width-laddered differentiable bounce scan (round-5): the static-rung
scan with packet-row compaction + cond overflow must reproduce the flat
scan — exact ray counts, colors/grads at amplified-ulp tolerance (XLA
FMA-contraction choices differ across program widths, as for the forward
chain ladder — tests/test_chained.py), for ANY schedule including ones
far too narrow (the overflow cond falls back to full width)."""

import jax
import jax.numpy as jnp
import numpy as np

import tpupt.render.integrator as integ
from tpupt.diff.params import extract_params, with_params
from tpupt.render.integrator import render_image

W = H = 128  # 64 packet rows — past _DIFF_LADDER_MIN_ROWS
MB = 8


def _loss_and_rays(scene, cam, spec, monkeypatch, spp=1):
    monkeypatch.setattr(integ, "_DIFF_LADDER", spec)
    params = extract_params(scene)

    def loss(p):
        buf, rays = render_image(
            with_params(scene, p), cam, W, H, spp,
            max_bounces=MB, differentiable=True,
        )
        return jnp.sum(buf.color * buf.color) + jnp.sum(buf.depth), (
            buf, rays,
        )

    (lv, (buf, rays)), g = jax.value_and_grad(loss, has_aux=True)(params)
    return float(lv), np.asarray(buf.color), int(rays), g


def _assert_matches(a, b):
    la, ca, ra, ga = a
    lb, cb, rb, gb = b
    assert ra == rb  # exact ray counts: pure scheduling
    np.testing.assert_allclose(ca, cb, rtol=2e-5, atol=2e-6)
    assert abs(la - lb) <= 2e-4 * max(1.0, abs(la))
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=5e-4, atol=1e-5
        ),
        ga, gb,
    )


def test_diff_ladder_matches_flat_sphere(sphere_scene, camera, monkeypatch):
    flat = _loss_and_rays(sphere_scene, camera, "off", monkeypatch)
    lad = _loss_and_rays(sphere_scene, camera, "auto", monkeypatch)
    _assert_matches(lad, flat)


def test_diff_ladder_matches_flat_mesh(full_scene, camera, monkeypatch):
    """Mesh scene: exercises the diff sweep payload, the in-trace rebake
    and the cotangent slot scatter under sliced/permuted widths."""
    flat = _loss_and_rays(full_scene, camera, "off", monkeypatch)
    lad = _loss_and_rays(full_scene, camera, "auto", monkeypatch)
    _assert_matches(lad, flat)


def test_diff_ladder_overflow_cond_is_exact(sphere_scene, camera, monkeypatch):
    """A schedule far too narrow for the scene must still be exact: every
    narrow rung overflows into the full-width cond branch."""
    flat = _loss_and_rays(sphere_scene, camera, "off", monkeypatch)
    lad = _loss_and_rays(
        sphere_scene, camera, "1.0,0.015625", monkeypatch
    )
    _assert_matches(lad, flat)


def test_diff_ladder_groups_resolution(monkeypatch):
    monkeypatch.setattr(integ, "_DIFF_LADDER", "auto")
    g = integ._diff_ladder_groups(8, 4096 * 256)
    assert g is not None
    assert sum(nb for nb, _ in g) == 8
    rows = [r for _, r in g]
    assert rows == sorted(rows, reverse=True)  # monotone shrinking
    assert rows[0] == 4096 and rows[-1] < 4096
    # disabled / tiny / degenerate schedules fall back to the flat scan
    monkeypatch.setattr(integ, "_DIFF_LADDER", "off")
    assert integ._diff_ladder_groups(8, 4096 * 256) is None
    monkeypatch.setattr(integ, "_DIFF_LADDER", "auto")
    assert integ._diff_ladder_groups(8, 8 * 256) is None  # < MIN_ROWS
    monkeypatch.setattr(integ, "_DIFF_LADDER", "1.0")
    assert integ._diff_ladder_groups(8, 4096 * 256) is None  # no-op
