"""Scene JSON schema tests (reference schema, json_parser.cpp:174-224)."""

import json
import os

import numpy as np
import pytest

from tpupt.scene.assets_gen import ensure_models, locate_asset_path
from tpupt.scene.json_parser import parse_transform, scene_from_json

SCENES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "scenes")


def test_parse_transform_commands():
    m = parse_transform({"translate": [1, 2, 3]})
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
    m = parse_transform({"scale": 2})
    np.testing.assert_allclose(np.diag(m), [2, 2, 2, 1])
    m = parse_transform({"scale": [1, 2, 3]})
    np.testing.assert_allclose(np.diag(m), [1, 2, 3, 1])
    m = parse_transform({"rotate": 90, "axis": [0, 0, 1]})
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_parse_transform_array_composes_left_multiplied():
    # m = elem @ m in order (json_parser.cpp:85-90): scale THEN translate
    m = parse_transform([{"scale": 2}, {"translate": [1, 0, 0]}])
    np.testing.assert_allclose(m @ [1, 0, 0, 1], [3, 0, 0, 1], atol=1e-6)
    # reversed order: translate then scale scales the translation too
    m2 = parse_transform([{"translate": [1, 0, 0]}, {"scale": 2}])
    np.testing.assert_allclose(m2 @ [1, 0, 0, 1], [4, 0, 0, 1], atol=1e-6)


def test_parse_transform_unknown_command():
    with pytest.raises(ValueError, match="Unrecognized transform"):
        parse_transform({"frobnicate": 1})


def test_three_balls_scene():
    desc = scene_from_json(os.path.join(SCENES, "three_balls.json"))
    assert desc.resolution == (1920, 1080)
    assert desc.spp == 200
    assert desc.object_count == 4
    scene = desc.build()
    assert scene.sphere_radius.shape[0] == 4
    assert set(np.asarray(scene.materials.mat_type)) == {0, 1, 2}
    # camera via the "o" extension: position (0,0,4)
    np.testing.assert_allclose(
        np.asarray(desc.camera.camera_matrix[:3, 3]), [0, 0, 4], atol=1e-6
    )
    assert abs(float(desc.camera.vfov) - np.deg2rad(45)) < 1e-6


def test_bunny_scene_two_instances_one_mesh():
    ensure_models()
    desc = scene_from_json(os.path.join(SCENES, "bunny.json"))
    scene = desc.build()
    # one mesh, two mesh objects + 1 sphere
    assert len(scene.s_mesh_root) == 1
    assert scene.s_obj_kind == (0, 1, 1)
    assert scene.s_obj_prim[1] == scene.s_obj_prim[2] == 0  # shared mesh


def test_ajax_look_at_camera():
    ensure_models()
    desc = scene_from_json(os.path.join(SCENES, "ajax-white.json"))
    m = np.asarray(desc.camera.camera_matrix)
    np.testing.assert_allclose(m[:3, 3], [6, 5.5, 0], atol=1e-5)
    assert desc.resolution == (720, 1280)


def test_multi_mesh_scene_distinct_meshes():
    ensure_models()
    desc = scene_from_json(os.path.join(SCENES, "multi_mesh.json"))
    scene = desc.build()
    assert len(scene.s_mesh_root) == 3  # the reference could only hold 1
    assert len(scene.s_mesh_tri_range) == 3
    los = [r[0] for r in scene.s_mesh_tri_range]
    assert los == sorted(los) and len(set(los)) == 3


def test_background_honored_when_asked(tmp_path):
    scene_file = tmp_path / "s.json"
    scene_file.write_text(json.dumps({
        "camera": {"vfov": 90},
        "background": [0.25, 0.5, 0.75],
        "materials": [],
        "surfaces": [],
    }))
    d1 = scene_from_json(str(scene_file))
    np.testing.assert_allclose(d1.bg_down, (0.5, 0.7, 1.0))  # reference default
    d2 = scene_from_json(str(scene_file), honor_background=True)
    np.testing.assert_allclose(d2.bg_down, (0.25, 0.5, 0.75))
    np.testing.assert_allclose(d2.bg_up, (0.25, 0.5, 0.75))
