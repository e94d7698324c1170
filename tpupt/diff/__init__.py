from tpupt.diff.params import extract_params, with_params
from tpupt.diff.fit import fit_scene

__all__ = ["extract_params", "with_params", "fit_scene"]
