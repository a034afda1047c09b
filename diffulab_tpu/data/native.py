"""ctypes bindings for the native host data-path kernels (_native/collate.cpp).

The shared library builds on first use with g++ (cached next to the source);
every entry point has a NumPy fallback so the package works without a
toolchain. ``HAS_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "_native" / "collate.cpp"
_LIB_PATH = Path(__file__).parent / "_native" / "libdiffulab_collate.so"
_N_THREADS = min(8, os.cpu_count() or 1)

_lib: ctypes.CDLL | None = None
HAS_NATIVE = False
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB_PATH), "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        logger.warning("native collate build failed (%s); using NumPy fallback", e)
        return False


def _load() -> None:
    global _lib, HAS_NATIVE, _tried
    if _tried:
        return
    _tried = True
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("native collate load failed (%s); using NumPy fallback", e)
        return
    lib.normalize_u8_to_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
    ]
    lib.gather_collate_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ]
    lib.gather_normalize_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_int,
    ]
    _lib = lib
    HAS_NATIVE = True


def normalize_u8_to_f32(src: np.ndarray, scale: float = 1.0 / 127.5, bias: float = -1.0) -> np.ndarray:
    """uint8 array -> float32 ``x * scale + bias`` (default: [-1, 1] range)."""
    _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if _lib is None:
        return src.astype(np.float32) * scale + bias
    dst = np.empty(src.shape, np.float32)
    _lib.normalize_u8_to_f32(
        src.ctypes.data, dst.ctypes.data, src.size,
        ctypes.c_float(scale), ctypes.c_float(bias), _N_THREADS,
    )
    return dst


def gather_collate_f32(store: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Stack ``store[indices]`` rows into one contiguous float32 batch."""
    _load()
    store = np.ascontiguousarray(store, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if _lib is None:
        return store[indices].copy()
    sample_elems = int(np.prod(store.shape[1:]))
    dst = np.empty((len(indices), *store.shape[1:]), np.float32)
    _lib.gather_collate_f32(
        store.ctypes.data, indices.ctypes.data, dst.ctypes.data,
        len(indices), sample_elems, _N_THREADS,
    )
    return dst


def gather_normalize_u8(store: np.ndarray, indices: np.ndarray,
                        scale: float = 1.0 / 127.5, bias: float = -1.0) -> np.ndarray:
    """Fused ``store[indices].astype(f32) * scale + bias`` for uint8 stores."""
    _load()
    store = np.ascontiguousarray(store, dtype=np.uint8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if _lib is None:
        return store[indices].astype(np.float32) * scale + bias
    sample_elems = int(np.prod(store.shape[1:]))
    dst = np.empty((len(indices), *store.shape[1:]), np.float32)
    _lib.gather_normalize_u8(
        store.ctypes.data, indices.ctypes.data, dst.ctypes.data,
        len(indices), sample_elems, ctypes.c_float(scale), ctypes.c_float(bias), _N_THREADS,
    )
    return dst
