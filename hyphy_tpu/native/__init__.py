"""Native (C++) host-runtime kernels, loaded via ctypes.

The TPU computes likelihoods; the host-side runtime around it (alignment
parsing support, pattern compression, distance estimation for NJ) mirrors
the reference's native data layer (``src/core/dataset_filter.cpp``).
The shared library is compiled on first use with g++ and cached next to
the source; every entry point has a NumPy fallback so the native build is
an accelerator, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "datapath.cpp")
_LIB = os.path.join(_DIR, "libdatapath.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB)
            lib.tn93_distances.argtypes = [
                ctypes.POINTER(ctypes.c_int8), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ]
            lib.tn93_distances.restype = None
            lib.compress_patterns.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ]
            lib.compress_patterns.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


_extra_libs: dict = {}


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Build (if stale) and load ``native/<name>.cpp`` -> ``lib<name>.so``.
    Returns None when the toolchain is unavailable; callers fall back to
    their NumPy mirrors."""
    if name in _extra_libs:
        return _extra_libs[name]
    with _lock:
        if name in _extra_libs:
            return _extra_libs[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        out = os.path.join(_DIR, f"lib{name}.so")
        lib = None
        try:
            if (not os.path.exists(out)) or (
                os.path.getmtime(out) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", out, src],
                    check=True, capture_output=True, timeout=180,
                )
            lib = ctypes.CDLL(out)
        except Exception:
            lib = None
        _extra_libs[name] = lib
        return lib


def tn93_distances(states: np.ndarray, saturation: float = 5.0) -> Optional[np.ndarray]:
    """[taxa, taxa] TN93 distances from [taxa, sites] int8 states
    (0..3 = ACGT, negative = unresolved); None if the native lib is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, dtype=np.int8)
    taxa, sites = states.shape
    out = np.zeros((taxa, taxa), dtype=np.float64)
    lib.tn93_distances(
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        taxa, sites, saturation,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def compress_patterns(codes: np.ndarray):
    """(pattern_index [sites], first_site [n_patterns]) or None.
    ``codes``: [taxa, sites] int32 column character codes."""
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    taxa, sites = codes.shape
    pattern_index = np.empty(sites, dtype=np.int32)
    first_site = np.empty(sites, dtype=np.int32)
    n = lib.compress_patterns(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        taxa, sites,
        pattern_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first_site.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return pattern_index, first_site[:n]
