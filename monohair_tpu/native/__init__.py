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
    srcs = [os.path.join(_HERE, f) for f in ("marching.cpp", "connect.cpp")]
    lib_path = os.path.join(_HERE, "_native.so")
    try:
        if (not os.path.exists(lib_path)
                or any(os.path.getmtime(lib_path) < os.path.getmtime(s)
                       for s in srcs)):
            subprocess.run(["g++", "-O3", "-march=native", "-fopenmp",
                            "-shared", "-fPIC",
                            "-o", lib_path] + srcs, check=True,
                           capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.marching_tets.restype = ctypes.c_int64
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_fp = ctypes.POINTER(ctypes.c_float)
        c_ip = ctypes.POINTER(ctypes.c_int64)
        c_up = ctypes.POINTER(ctypes.c_uint8)
        lib.cts_run.restype = ctypes.c_void_p
        lib.cts_run.argtypes = [
            c_dp, c_ip, ctypes.c_int64, ctypes.c_int64, c_fp, c_fp,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            ctypes.c_uint64, c_ip, c_ip]
        lib.cts_fetch.restype = None
        lib.cts_fetch.argtypes = [ctypes.c_void_p, c_dp, c_ip, c_up]
        lib.cts_free.restype = None
        lib.cts_free.argtypes = [ctypes.c_void_p]
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


def connect_to_scalp_native(strands, num_root: int, occ: np.ndarray,
                            ori_voxel: np.ndarray,
                            out_ratio_threshold: float = 0.5,
                            thr_dist: float = 0.5, thr_dot: float = 0.9,
                            max_thr_dist: float = 2.0,
                            min_thr_dot: float = 0.6,
                            jitter_retries: int = 2, seed: int = 0):
    """C++ connect_to_scalp (connect.cpp); returns (strands, attached_flags)
    or None if the native lib is unavailable. Mirrors
    strands/connect.py::connect_to_scalp (HairGrow.py:606-784)."""
    lib = _build()
    if lib is None or not hasattr(lib, "cts_run"):
        return None
    pts = np.ascontiguousarray(
        np.concatenate([np.asarray(s, np.float64) for s in strands], 0))
    offsets = np.zeros(len(strands) + 1, np.int64)
    np.cumsum([len(s) for s in strands], out=offsets[1:])
    occ_c = np.ascontiguousarray(occ, np.float32)
    ori_c = np.ascontiguousarray(ori_voxel, np.float32)
    n_out = ctypes.c_int64(0)
    p_out = ctypes.c_int64(0)
    handle = lib.cts_run(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(strands), num_root,
        occ_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ori_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *map(ctypes.c_int64, occ_c.shape),
        out_ratio_threshold, thr_dist, thr_dot, max_thr_dist, min_thr_dot,
        jitter_retries, seed, ctypes.byref(n_out), ctypes.byref(p_out))
    if not handle:
        return None
    try:
        out_pts = np.empty((p_out.value, 3), np.float64)
        out_off = np.empty(n_out.value + 1, np.int64)
        out_flag = np.empty(n_out.value, np.uint8)
        lib.cts_fetch(handle,
                      out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      out_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                      out_flag.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    finally:
        lib.cts_free(handle)
    out = [out_pts[out_off[i]:out_off[i + 1]].copy()
           for i in range(n_out.value)]
    return out, out_flag.astype(bool)
