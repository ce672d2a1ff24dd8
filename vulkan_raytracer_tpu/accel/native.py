"""ctypes bindings for the native C++ acceleration-structure builders.

The compute path is JAX/XLA; the *build* stage (grid binning, BVH
construction) is host-side native code — the analogue of the Vulkan
driver's AS build the reference calls into
(accelerationstructure.cpp:85-151).  The shared library is compiled on
first use with g++ (no pip deps); everything degrades gracefully to the
NumPy builders when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from ..utils import logging as log

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "accel_build.cpp"
_LIB = _NATIVE_DIR / "libvkrt_accel.so"

_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no toolchain / sandbox: fall back to numpy
        log.warn("native accel build unavailable (%s); using NumPy builders", e)
        return False


def get_lib():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("VKRT_DISABLE_NATIVE"):
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _SRC.exists() or not _compile():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.vkrt_grid_count.restype = ctypes.c_int64
        lib.vkrt_grid_count.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.vkrt_grid_fill.restype = None
        lib.vkrt_grid_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.vkrt_bvh_build.restype = ctypes.c_int32
        lib.vkrt_bvh_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except OSError as e:
        log.warn("failed to load native accel library: %s", e)
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def grid_bin_native(tmin, tmax, gmin, cell, res):
    """CSR-bin triangles into grid cells; returns (start, ids) or None."""
    lib = get_lib()
    if lib is None:
        return None
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    gmin = np.ascontiguousarray(gmin, np.float32)
    cell = np.ascontiguousarray(cell, np.float32)
    res = np.ascontiguousarray(res, np.int32)
    t = tmin.shape[0]
    nc = int(np.prod(res.astype(np.int64)))
    counts = np.empty(nc, np.int32)
    total = lib.vkrt_grid_count(
        _ptr(tmin), _ptr(tmax), t, _ptr(gmin), _ptr(cell), _ptr(res), _ptr(counts)
    )
    start = np.empty(nc + 1, np.int32)
    ids = np.empty(max(int(total), 1), np.int32)
    lib.vkrt_grid_fill(
        _ptr(tmin), _ptr(tmax), t, _ptr(gmin), _ptr(cell), _ptr(res),
        _ptr(counts), _ptr(start), _ptr(ids),
    )
    return start, ids[: int(total)], counts


def bvh_build_native(v0, v1, v2, leaf_size):
    """Threaded-BVH build; returns (node_min, node_max, first, miss, slots)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    n_leaves = -(-t // leaf_size)
    max_nodes = 4 * max(n_leaves, 1) + 3
    max_slots = (2 * n_leaves + 2) * leaf_size + t
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    first = np.empty(max_nodes, np.int32)
    miss = np.empty(max_nodes, np.int32)
    slots = np.empty(max_slots, np.int32)
    n_slots = np.zeros(1, np.int32)
    n_nodes = lib.vkrt_bvh_build(
        _ptr(v0), _ptr(v1), _ptr(v2), t, leaf_size,
        _ptr(node_min), _ptr(node_max), _ptr(first), _ptr(miss), _ptr(slots),
        _ptr(n_slots),
    )
    ns = int(n_slots[0])
    return (
        node_min[:n_nodes].copy(),
        node_max[:n_nodes].copy(),
        first[:n_nodes].copy(),
        miss[:n_nodes].copy(),
        slots[:ns].copy(),
    )
