"""Differentiation utilities.

Lazy attribute resolution: ``fit`` imports the integrator, and the
integrator imports ``tpupt.diff.overlap`` — eagerly importing ``fit``
here would make ``import tpupt.render`` a circular import.
"""

from tpupt.diff.params import extract_params, with_params

__all__ = ["extract_params", "with_params", "fit_scene"]


def __getattr__(name):
    if name == "fit_scene":
        from tpupt.diff.fit import fit_scene

        return fit_scene
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
