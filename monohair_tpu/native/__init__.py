"""Native C++ host kernels (ctypes-loaded, compiled on demand with g++).

The TPU does the tensor math; these cover host-side hot spots where the
reference leaned on external C++/CUDA: currently marching tetrahedra for the
coarse-mesh export (instant-ngp's CUDA marching cubes, run.py:272-276).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    src = os.path.join(_HERE, "marching.cpp")
    lib_path = os.path.join(_HERE, "_native.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                            "-o", lib_path, src], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.marching_tets.restype = ctypes.c_int64
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        _LIB = lib
    except Exception as e:  # toolchain missing -> numpy fallback
        print(f"[native] build failed ({e}); using numpy fallbacks")
        _BUILD_FAILED = True
    return _LIB


def marching_tetrahedra_native(grid: np.ndarray, iso: float,
                               max_tris: Optional[int] = None
                               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ marching tetrahedra; returns None if the native lib is unavailable."""
    lib = _build()
    if lib is None:
        return None
    g = np.ascontiguousarray(grid, np.float32)
    if max_tris is None:
        # crossing cubes bound: cells whose 2x2x2 window straddles iso
        inside = g > iso
        est = int(inside.sum())
        max_tris = min(max(est * 16, 1 << 20), 120_000_000)
    out = np.empty((max_tris, 9), np.float32)
    n = lib.marching_tets(g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          *map(ctypes.c_int64, g.shape), ctypes.c_float(iso),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          ctypes.c_int64(max_tris))
    if n < 0:  # overflow: retry with a bigger buffer
        return marching_tetrahedra_native(grid, iso, max_tris * 4)
    verts = out[:n].reshape(-1, 3).astype(np.float64)
    faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    return verts, faces
