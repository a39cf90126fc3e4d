"""ctypes bridge to the native C++ host runtime (native/rt_native.cpp).

The shared library is compiled on demand with the system toolchain the
first time it is needed (cached next to the source, keyed on source
mtime), so the repo stays buildable with nothing but g++.  Every native
entry point has a pure-Python fallback (e.g. raytpu/bvh.py's numpy
builder) and the two are cross-checked bit-for-bit in tests; set
``RAYTPU_NO_NATIVE=1`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "native", "rt_native.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "_rt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("RAYTPU_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        lib.rt_build_bvh.restype = ctypes.c_int
        lib.rt_build_bvh.argtypes = argtypes
        lib.rt_build_bvh_sah.restype = ctypes.c_int
        lib.rt_build_bvh_sah.argtypes = argtypes
        if lib.rt_native_abi_version() != 2:
            return None
        _lib = lib
        return _lib


def build_bvh_native(centers: np.ndarray, radii: np.ndarray,
                     leaf_size: int, pad: float, sah: bool = False):
    """Native BVH build -> (nodes (m, 9) f32, perm (n,) f32) or None.

    ``sah=True`` selects the binned surface-area-heuristic builder
    (rt_build_bvh_sah); default is the median-split builder that the
    numpy fallback mirrors bit-for-bit."""
    lib = get_lib()
    if lib is None:
        return None
    centers = np.ascontiguousarray(centers, np.float64)
    radii = np.ascontiguousarray(radii, np.float64)
    n = len(radii)
    nodes = np.empty((max(2 * n - 1, 1), 9), np.float32)
    perm = np.empty((n,), np.float32)
    fn = lib.rt_build_bvh_sah if sah else lib.rt_build_bvh
    m = fn(centers, radii, n, int(leaf_size), float(pad),
           nodes.reshape(-1), perm)
    if m <= 0:
        return None
    return nodes[:m].copy(), perm
