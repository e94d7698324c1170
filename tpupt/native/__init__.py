"""Native (C++) runtime components with ctypes bindings.

The reference's host runtime — BVH construction, model loading, scene
upload orchestration — is C++ (src/lib/accelerators/bvh.cpp,
src/lib/assets/model_loader.cpp).  tpupt keeps the same split: the JAX/XLA
side owns all device compute, while init-time hot paths run natively:

  * `build_bvh_native`  — SAH BVH builder (bvh_builder.cpp)
  * `load_obj_native`   — OBJ parser (obj_loader.cpp)

The library is compiled on demand with g++ (no extra deps; see build()).
Every entry point has a pure-python fallback, so the framework works even
without a toolchain — `native_available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtpupt_native.so")
_SOURCES = ["bvh_builder.cpp", "obj_loader.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success."""
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    if not force and os.path.exists(_LIB_PATH):
        newest_src = max(os.path.getmtime(s) for s in srcs)
        if os.path.getmtime(_LIB_PATH) >= newest_src:
            return True
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           *srcs, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("TPUPT_NO_NATIVE"):
            return None
        if not build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tpupt_build_bvh.restype = ctypes.c_int64
        lib.tpupt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpupt_obj_count.restype = ctypes.c_int
        lib.tpupt_obj_count.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tpupt_obj_parse.restype = ctypes.c_int
        lib.tpupt_obj_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(positions: np.ndarray, tris: np.ndarray):
    """Native FlatBVH build; returns the same structure as
    tpupt.accel.bvh.build_bvh or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from tpupt.accel.bvh import FlatBVH

    positions = np.ascontiguousarray(positions, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    t = tris.shape[0]
    b = 2 * t - 1
    node_min = np.empty((b, 3), np.float32)
    node_max = np.empty((b, 3), np.float32)
    node_tri = np.empty((b,), np.int32)
    node_skip = np.empty((b,), np.int32)
    rc = lib.tpupt_build_bvh(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        positions.shape[0],
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t,
        node_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_skip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != b:
        raise RuntimeError(f"native BVH build failed (rc={rc})")
    return FlatBVH(node_min, node_max, node_tri, node_skip)


def load_obj_native(path: str):
    """Native OBJ parse; returns (positions, tris) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.tpupt_obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise ValueError(f"OBJ parse failed for {path!r} (rc={rc})")
    if nv.value == 0 or nt.value == 0:
        raise ValueError(f"OBJ file {path!r} has no triangles")
    positions = np.empty((nv.value, 3), np.float32)
    tris = np.empty((nt.value, 3), np.int32)
    rc = lib.tpupt_obj_parse(
        path.encode(),
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"OBJ parse failed for {path!r} (rc={rc})")
    return positions, tris
