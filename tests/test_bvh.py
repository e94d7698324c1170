import numpy as np
import jax.numpy as jnp

from tpupt.accel.bvh import build_bvh, validate_bvh
from tpupt.accel.traverse import moller_trumbore, traverse_mesh
from tpupt.scene.procedural import box, icosphere, torus_knot
from tpupt.scene.description import SceneDescription


def _random_soup(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (n, 3))
    verts = centers[:, None, :] + rng.normal(0, 0.3, (n, 3, 3))
    positions = verts.reshape(-1, 3).astype(np.float32)
    tris = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return positions, tris


def test_build_structure_icosphere():
    v, f = icosphere(2)
    validate_bvh(build_bvh(v, f), v, f)


def test_build_structure_soup():
    for n in (1, 2, 3, 4, 5, 17, 200):
        v, f = _random_soup(n, seed=n)
        validate_bvh(build_bvh(v, f), v, f)


def test_build_degenerate_identical_centroids():
    # all triangles identical: the reference SAH would recurse into an empty
    # partition and panic; our builder must fall back to a median split.
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.tile(np.array([[0, 1, 2]], np.int32), (16, 1))
    bvh = build_bvh(v, tris)
    assert bvh.num_nodes == 31
    assert sorted(t for t in bvh.node_tri if t >= 0) == list(range(16))


def _traverse_scene(v, f):
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.eye(4), "m")
    return d.build()


def _brute_closest(scene, ro, rd, t_min):
    verts = scene.positions[scene.tri_idx]  # (T,3,3)
    ok, t = moller_trumbore(
        ro[:, None], rd[:, None],
        verts[None, :, 0], verts[None, :, 1], verts[None, :, 2],
        t_min[:, None], jnp.full((ro.shape[0], 1), 3e38),
    )
    t_masked = np.where(np.asarray(ok), np.asarray(t), 3e38)
    return t_masked.min(axis=1), t_masked.argmin(axis=1)


def _run_traversal(scene, ro, rd, t_min):
    n_rays = ro.shape[0]
    return traverse_mesh(
        scene, jnp.int32(0), scene.obj_m[0], scene.obj_inv_m[0],
        ro, rd, t_min,
        jnp.full((n_rays,), 3e38), jnp.full((n_rays,), -1, jnp.int32),
        jnp.ones((n_rays,), bool),
    )


def _random_rays(n_rays, seed=1, spread=4.0):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-spread, spread, (n_rays, 3)), jnp.float32)
    rd = rng.normal(0, 1, (n_rays, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True), jnp.float32)
    return ro, rd


def test_traversal_matches_brute_force_soup():
    """Random soup: same hits, t within float tolerance.  (Slim random
    triangles make Moller-Trumbore ill-conditioned, and XLA fuses the
    traversal body with FMA, so bit-equality only holds for well-formed
    meshes — see the icosphere test below.)"""
    v, f = _random_soup(150, seed=3)
    scene = _traverse_scene(v, f)
    ro, rd = _random_rays(256)
    t_min = jnp.full((256,), 1e-4)

    t_bvh, tri_bvh, _ = _run_traversal(scene, ro, rd, t_min)
    t_ref, _ = _brute_closest(scene, ro, rd, t_min)
    hit_ref = t_ref < 3e37
    hit_bvh = np.asarray(tri_bvh) >= 0

    np.testing.assert_array_equal(hit_bvh, hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_bvh)[hit_bvh], t_ref[hit_ref], rtol=2e-3, atol=1e-4
    )
    assert hit_ref.sum() > 20  # the test actually hit things


def test_traversal_matches_brute_force_icosphere_exact():
    """Well-conditioned mesh: traversal must find the identical closest
    triangle with near-identical t."""
    v, f = icosphere(2)
    scene = _traverse_scene(v, f)
    ro, rd = _random_rays(512, seed=7, spread=2.0)
    # aim half the rays at the origin so plenty hit
    rd = rd.at[::2].set(jnp.asarray(-np.asarray(ro[::2]) /
                                    np.linalg.norm(np.asarray(ro[::2]), axis=1, keepdims=True),
                                    jnp.float32))
    t_min = jnp.full((512,), 1e-4)

    t_bvh, tri_bvh, _ = _run_traversal(scene, ro, rd, t_min)
    t_ref, tri_ref = _brute_closest(scene, ro, rd, t_min)
    hit_ref = t_ref < 3e37
    hit_bvh = np.asarray(tri_bvh) >= 0

    np.testing.assert_array_equal(hit_bvh, hit_ref)
    np.testing.assert_array_equal(np.asarray(tri_bvh)[hit_bvh], tri_ref[hit_ref])
    np.testing.assert_allclose(
        np.asarray(t_bvh)[hit_bvh], t_ref[hit_ref], rtol=1e-6
    )
    assert hit_ref.sum() > 200


def test_traversal_respects_tmin():
    v, f = box()
    scene = _traverse_scene(v, f)
    # ray from inside the box: with t_min large enough to skip the near wall
    ro = jnp.array([[0.0, 0.0, 0.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    for t_min_val, expect_t in [(1e-4, 0.5), (0.6, 3e38)]:
        t, tri, _ = traverse_mesh(
            scene, jnp.int32(0), scene.obj_m[0], scene.obj_inv_m[0],
            ro, rd, jnp.array([t_min_val]),
            jnp.array([3e38]), jnp.array([-1], jnp.int32), jnp.array([True]),
        )
        if expect_t < 1:
            assert abs(float(t[0]) - expect_t) < 1e-5
        else:
            assert int(tri[0]) == -1


def test_traversal_step_bound():
    """Skip-link traversal must visit at most 2*nodes steps."""
    v, f = torus_knot(segments=60, sides=8)
    scene = _traverse_scene(v, f)
    n_rays = 64
    rng = np.random.default_rng(5)
    ro = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)), jnp.float32)
    rd = jnp.asarray(rng.normal(0, 1, (n_rays, 3)), jnp.float32)
    _, _, steps = traverse_mesh(
        scene, jnp.int32(0), scene.obj_m[0], scene.obj_inv_m[0],
        ro, rd, jnp.full((n_rays,), 1e-4),
        jnp.full((n_rays,), 3e38), jnp.full((n_rays,), -1, jnp.int32),
        jnp.ones((n_rays,), bool),
    )
    assert int(steps) <= scene.node_tri.shape[0] + 1
