from tpupt.core.types import Camera, Materials, SceneArrays, Hit, RenderBuffers

__all__ = ["Camera", "Materials", "SceneArrays", "Hit", "RenderBuffers"]
