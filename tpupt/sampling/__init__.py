from tpupt.sampling.rng import uniform, wang_hash, pixel_seed
from tpupt.sampling.sphere import random_in_unit_sphere

__all__ = ["uniform", "wang_hash", "pixel_seed", "random_in_unit_sphere"]
