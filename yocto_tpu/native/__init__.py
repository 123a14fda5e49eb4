"""ctypes bindings to the native host helpers (libytpu.so).

The native BVH builder mirrors ops/bvh.py's semantics; `build_bvh_native`
returns None when the shared library is unavailable so callers fall back
to the NumPy builder.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libytpu.so")
    if not os.path.exists(path):
        # try building on the fly if a toolchain is present
        src = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                           "build.sh")
        if os.path.exists(src):
            import subprocess
            try:
                subprocess.run(["sh", src], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ytpu_build_bvh.restype = ctypes.c_int
    lib.ytpu_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB


def build_bvh_native(bboxes: np.ndarray, highquality: bool = False,
                     max_prims: int = 4):
    """Native build; returns ops.bvh.BvhArrays or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..ops.bvh import BvhArrays

    n = len(bboxes)
    if n == 0:
        return None
    bboxes = np.ascontiguousarray(bboxes, np.float32)
    cap = 2 * n
    node_bmin = np.empty((cap, 3), np.float32)
    node_bmax = np.empty((cap, 3), np.float32)
    start = np.empty(cap, np.int32)
    num = np.empty(cap, np.int32)
    axis = np.empty(cap, np.int32)
    internal = np.empty(cap, np.uint8)
    prims = np.empty(n, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    count = lib.ytpu_build_bvh(
        ptr(bboxes, ctypes.c_float), n, int(highquality), max_prims,
        ptr(node_bmin, ctypes.c_float), ptr(node_bmax, ctypes.c_float),
        ptr(start, ctypes.c_int32), ptr(num, ctypes.c_int32),
        ptr(axis, ctypes.c_int32), ptr(internal, ctypes.c_uint8),
        ptr(prims, ctypes.c_int32))
    if count <= 0:
        return None
    return BvhArrays(
        bbox_min=node_bmin[:count].copy(), bbox_max=node_bmax[:count].copy(),
        start=start[:count].copy(), num=num[:count].copy(),
        axis=axis[:count].copy(),
        internal=internal[:count].astype(bool),
        primitives=prims)
