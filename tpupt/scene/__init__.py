from tpupt.scene.description import SceneDescription
from tpupt.scene.json_parser import scene_from_json

__all__ = ["SceneDescription", "scene_from_json"]
