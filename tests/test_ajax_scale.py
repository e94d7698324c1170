"""Reference-scale accelerator proof (VERDICT r3 #6): the ajax-white
scene's generated bust is now 81,920 triangles (K ~ 3.7k treelets — the
two-level cull's first test above K ~ 10^3).  The full product pipeline
(JSON -> OBJ -> native BVH -> treelet bake -> packet render) must build
and render it without faulting, and the render must actually hit the
bust."""

import os

import numpy as np
import jax.numpy as jnp


def test_ajax_scene_is_reference_scale():
    from tpupt.bench.harness import _scene_ajax

    scene, camera = _scene_ajax()
    assert scene.tri_idx.shape[0] >= 50_000, scene.tri_idx.shape
    assert scene.tre_min.shape[0] >= 1_000  # well past _TWOLEVEL_MIN_K


def test_ajax_small_render_hits_bust():
    from tpupt.bench.harness import _scene_ajax
    from tpupt.render.integrator import render_image

    scene, camera = _scene_ajax()
    w, h = 48, 80  # tiny portrait crop of the 720x1280 framing
    buf, rays = render_image(scene, camera, w, h, 1, max_bounces=2)
    color = np.asarray(buf.color)
    assert np.isfinite(color).all()
    assert int(rays) > 0
    # the bust fills the frame center: those pixels must diverge from the
    # pure sky gradient a bust-free render produces
    empty = scene.replace(
        tre_min=jnp.full((1, 3), 3e37), tre_max=jnp.full((1, 3), 3e37)
    )
    buf2, _ = render_image(empty, camera, w, h, 1, max_bounces=2)
    sky = np.asarray(buf2.color)
    mid = (slice(h // 3, 2 * h // 3), slice(w // 3, 2 * w // 3))
    cm = color.reshape(h, w, 3)[mid]
    sm = sky.reshape(h, w, 3)[mid]
    assert np.abs(cm - sm).max() > 0.05, "bust not visible in the render"


def test_ensure_models_regenerates_on_version_bump(tmp_path):
    from tpupt.scene import assets_gen

    d = str(tmp_path)
    assets_gen.ensure_models(d)
    p = os.path.join(d, "quad.obj")
    first = open(p).readline()
    assert "tpupt-gen quad.obj v1" in first
    # stale tag -> regenerated; current tag -> untouched
    with open(p, "w") as fh:
        fh.write("# tpupt-gen quad.obj v0\nv 0 0 0\n")
    assets_gen.ensure_models(d)
    assert "tpupt-gen quad.obj v1" in open(p).readline()
    mtime = os.path.getmtime(p)
    assets_gen.ensure_models(d)
    assert os.path.getmtime(p) == mtime


def test_ajax_hi_render_at_real_reference_scale():
    """The REAL ajax scale (round-4 verdict #3): 327,680 tris,
    K ~ 1.5e4 — the super-pq selection regime (kpad >= _SUPER_SEL_MIN_K
    engages by default).  Full product pipeline must build and render,
    and the bust must be visible."""
    import tpupt.accel.packets as pk
    from tpupt.bench.harness import _scene_ajax_hi
    from tpupt.render.integrator import render_image

    scene, camera = _scene_ajax_hi()
    assert scene.tri_idx.shape[0] >= 300_000, scene.tri_idx.shape
    K = scene.tre_min.shape[0]
    kpad = -(-K // pk._SUPER) * pk._SUPER
    assert kpad >= pk._SUPER_SEL_MIN_K  # super-pq is the engaged mode

    w, h = 36, 64
    buf, rays = render_image(scene, camera, w, h, 1, max_bounces=2)
    color = np.asarray(buf.color)
    assert np.isfinite(color).all()
    assert int(rays) > 0
    empty = scene.replace(
        tre_min=jnp.full((1, 3), 3e37), tre_max=jnp.full((1, 3), 3e37)
    )
    buf2, _ = render_image(empty, camera, w, h, 1, max_bounces=2)
    sky = np.asarray(buf2.color)
    mid = (slice(h // 3, 2 * h // 3), slice(w // 3, 2 * w // 3))
    cm = color.reshape(h, w, 3)[mid]
    sm = sky.reshape(h, w, 3)[mid]
    assert np.abs(cm - sm).max() > 0.05, "bust not visible in the render"
