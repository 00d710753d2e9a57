"""Native (C++) runtime components, bound via ctypes.

The reference's host runtime is native Rust with driver-native acceleration-
structure builds; the TPU framework keeps its host-side hot paths native too:
- `bvh_builder`: binned-SAH BVH build (bvh_builder.cpp).

Libraries are compiled on demand with g++ (cached next to the source); every
native entry point has a pure-numpy fallback so the framework never hard-
requires a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libbvh_builder.so")
_SRC_PATH = os.path.join(_DIR, "bvh_builder.cpp")
_HASH_PATH = _LIB_PATH + ".srchash"

_lib = None
_lib_failed = False


def _src_hash() -> str:
    with open(_SRC_PATH, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        # Rebuild keyed on a HASH of the source (mtimes are unreliable: a git
        # checkout stamps source and any stray binary identically, silently
        # loading a stale or wrong-arch library).
        want = _src_hash()
        have = None
        if os.path.exists(_LIB_PATH) and os.path.exists(_HASH_PATH):
            with open(_HASH_PATH) as f:
                have = f.read().strip()
        if have != want:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=300,
            )
            with open(_HASH_PATH, "w") as f:
                f.write(want)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bvh_build_sah.restype = ctypes.c_int
        lib.bvh_build_sah.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        log.exception("native bvh_builder unavailable; using numpy fallback")
        _lib_failed = True
    return _lib


def have_native() -> bool:
    return _load() is not None


def build_bvh_sah(positions: np.ndarray, indices: np.ndarray, leaf_size: int):
    """Binned-SAH build. Returns (node_min, node_max, node_miss, node_leaf,
    leaf_tris) numpy arrays, or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    t = len(indices)
    cap = 2 * t
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_miss = np.empty(cap, np.int32)
    node_leaf = np.empty(cap, np.int32)
    leaf_tris = np.empty((cap, leaf_size), np.int32)
    counts = np.zeros(2, np.int32)

    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.bvh_build_sah(
        fp(positions), len(positions), ip(indices), t, leaf_size,
        fp(node_min), fp(node_max), ip(node_miss), ip(node_leaf),
        ip(leaf_tris), ip(counts),
    )
    if rc != 0:
        return None
    n, l = int(counts[0]), int(counts[1])
    return (
        node_min[:n].copy(), node_max[:n].copy(), node_miss[:n].copy(),
        node_leaf[:n].copy(), leaf_tris[:l].copy(),
    )
