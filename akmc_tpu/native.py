"""ctypes bindings for the native C++ runtime components (native/akmc_native.cpp).

Auto-builds the shared library with g++ on first use (no pybind11 in this
environment; plain C ABI + ctypes). All entry points have pure-Python
fallbacks — the native path is an accelerator, not a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "akmc_native.cpp")
_SO = os.path.join(_HERE, "_akmc_native.so")

_lib = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        try:
            # retry without -march=native / OpenMP for maximal portability
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO],
                check=True, capture_output=True, timeout=240,
            )
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.neighbor_list_cell.restype = ctypes.c_int
    lib.neighbor_list_cell.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.xyz_count.restype = ctypes.c_int64
    lib.xyz_count.argtypes = [ctypes.c_char_p]
    lib.xyz_read.restype = ctypes.c_int
    lib.xyz_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
    ]
    lib.omp_thread_count.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def neighbor_list_cell(
    pos: np.ndarray,
    cutoff: float,
    max_nn: int,
    lattice=None,
    pbc: bool = False,
    strict: bool = True,
) -> np.ndarray:
    """Cell-list padded ELL neighbor table (ascending index order, -1 pad).
    Semantically identical to lattice.build_neighbor_list."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pos = np.ascontiguousarray(pos, np.float64)
    n = pos.shape[0]
    out = np.full((n, max_nn), -1, np.int32)
    lat = np.ascontiguousarray(
        lattice if lattice is not None else (0.0, 1.0, 1.0), np.float64
    )
    rc = lib.neighbor_list_cell(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, cutoff, max_nn,
        lat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if pbc else 0, 1 if strict else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        raise ValueError(
            f"neighbor count exceeds max_nn={max_nn} (native builder)"
        )
    return out


def read_xyz_native(path: str):
    """Fast xyz read -> (element codes int32, pos (N,3) f64)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = lib.xyz_count(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    elem = np.empty(n, np.int32)
    pos = np.empty((n, 3), np.float64)
    rc = lib.xyz_read(
        path.encode(), n,
        elem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError(f"xyz_read({path}) failed with code {rc}")
    return elem, pos
