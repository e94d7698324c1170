"""Native C++ runtime tests: builder/parser parity with the python specs."""

import numpy as np
import pytest

from tpupt import native
from tpupt.accel.bvh import _build_bvh_numpy, validate_bvh
from tpupt.scene.obj_loader import _load_obj_python
from tpupt.scene.procedural import bunny_substitute, icosphere, write_obj

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library not built"
)


def test_native_bvh_valid_and_equivalent():
    v, f = icosphere(3)
    flat_n = native.build_bvh_native(v, f)
    validate_bvh(flat_n, v, f)
    flat_p = _build_bvh_numpy(v, f)
    assert flat_n.num_nodes == flat_p.num_nodes
    # same leaf set (ordering may differ: nth_element vs argpartition)
    assert sorted(t for t in flat_n.node_tri if t >= 0) == sorted(
        t for t in flat_p.node_tri if t >= 0
    )


def test_native_bvh_traversal_parity():
    """Renders/hits must agree regardless of which builder produced the
    tree: closest-hit is builder-order independent."""
    import jax.numpy as jnp

    from tpupt.accel.traverse import traverse_mesh
    from tpupt.scene.description import SceneDescription

    v, f = icosphere(2)
    d = SceneDescription()
    d.add_material("m", "lambertian", albedo=(1, 1, 1))
    d.add_mesh("mesh", v, f)
    d.add_mesh_object("mesh", np.eye(4), "m")
    base = d.build()

    hits = []
    for flat in (_build_bvh_numpy(v, f), native.build_bvh_native(v, f)):
        # swap the BVH arrays into the scene pytree (single mesh: global
        # node/tri indexing == local)
        scene = base.replace(
            node_min=jnp.asarray(flat.node_min),
            node_max=jnp.asarray(flat.node_max),
            node_tri=jnp.asarray(flat.node_tri),
            node_skip=jnp.asarray(flat.node_skip),
        )

        rng = np.random.default_rng(0)
        n = 128
        ro = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
        rd = rng.normal(0, 1, (n, 3))
        rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True), jnp.float32)
        t, tri, _ = traverse_mesh(
            scene, jnp.int32(0), scene.obj_m[0], scene.obj_inv_m[0],
            ro, rd, jnp.full((n,), 1e-4),
            jnp.full((n,), 3e38), jnp.full((n,), -1, jnp.int32),
            jnp.ones((n,), bool),
        )
        hits.append((np.asarray(t), np.asarray(tri)))

    np.testing.assert_allclose(hits[0][0], hits[1][0], rtol=1e-6)
    np.testing.assert_array_equal(hits[0][1] >= 0, hits[1][1] >= 0)


def test_native_obj_parity(tmp_path):
    v, f = bunny_substitute()
    path = str(tmp_path / "m.obj")
    write_obj(path, v, f)
    pv, pf = _load_obj_python(path)
    nv, nf = native.load_obj_native(path)
    np.testing.assert_allclose(nv, pv, atol=1e-6)
    np.testing.assert_array_equal(nf, pf)


def test_native_obj_polygons_and_negative_indices(tmp_path):
    path = str(tmp_path / "q.obj")
    with open(path, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        fh.write("f 1 2 3 4\n")        # quad -> 2 fan triangles
        fh.write("f -4//1 -3/2/1 -2\n")  # negative + slashed indices
    nv, nf = native.load_obj_native(path)
    pv, pf = _load_obj_python(path)
    np.testing.assert_array_equal(nf, pf)
    assert nf.shape == (3, 3)
    np.testing.assert_array_equal(nf[0], [0, 1, 2])
    np.testing.assert_array_equal(nf[1], [0, 2, 3])
    np.testing.assert_array_equal(nf[2], [0, 1, 2])


def test_native_obj_missing_file():
    with pytest.raises(ValueError):
        native.load_obj_native("/nonexistent/x.obj")
