"""ctypes bindings to the native host-runtime kernels (meshkit.cpp).

The shared library is compiled on first use with g++ (cached next to the
source); everything degrades gracefully to the numpy implementations when no
compiler is available (``KNPEMIDG_NATIVE=0`` disables explicitly)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshkit.cpp")
_LIB = os.path.join(_HERE, "libmeshkit.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("KNPEMIDG_NATIVE", "1") == "0":
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.build_facets.restype = ctypes.c_int
        lib.build_facets.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int32,
            i64p, i64p, i64p, i32p, i32p,
            i64p, i64p, i32p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.morton_codes.restype = None
        lib.morton_codes.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int32, u64p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_facets(cells: np.ndarray, d: int):
    """Unique-facet tables via the native kernel.

    Returns (if_verts, if_cells(2), if_locs(2), ef_verts, ef_cell, ef_loc)
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    nc = cells.shape[0]
    max_f = nc * (d + 1)
    if_verts = np.empty((max_f, d), dtype=np.int64)
    if_ca = np.empty(max_f, dtype=np.int64)
    if_cb = np.empty(max_f, dtype=np.int64)
    if_la = np.empty(max_f, dtype=np.int32)
    if_lb = np.empty(max_f, dtype=np.int32)
    ef_verts = np.empty((max_f, d), dtype=np.int64)
    ef_cell = np.empty(max_f, dtype=np.int64)
    ef_loc = np.empty(max_f, dtype=np.int32)
    n_if = ctypes.c_int64()
    n_ef = ctypes.c_int64()
    rc = lib.build_facets(
        cells.reshape(-1), nc, d,
        if_verts.reshape(-1), if_ca, if_cb, if_la, if_lb,
        ef_verts.reshape(-1), ef_cell, ef_loc,
        ctypes.byref(n_if), ctypes.byref(n_ef),
    )
    if rc != 0:
        raise ValueError("non-manifold mesh (facet shared by >2 cells)")
    ni, ne = n_if.value, n_ef.value
    return (
        if_verts[:ni].copy(),
        np.stack([if_ca[:ni], if_cb[:ni]], axis=1),
        np.stack([if_la[:ni], if_lb[:ni]], axis=1),
        ef_verts[:ne].copy(),
        ef_cell[:ne].copy(),
        ef_loc[:ne].copy(),
    )


def morton_codes(points: np.ndarray, bits: int = 10) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, d = pts.shape
    codes = np.empty(n, dtype=np.uint64)
    lib.morton_codes(pts.reshape(-1), n, d, bits, codes)
    return codes
