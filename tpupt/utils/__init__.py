from tpupt.utils.timer import Stopwatch
from tpupt.utils.image import write_image_file, to_uint8

__all__ = ["Stopwatch", "write_image_file", "to_uint8"]
