"""Native (C++) kernels, loaded via ctypes.

Currently: the permutohedral-lattice Gaussian filter backing the exact dense-
CRF backend (the reference's only native dependency was pydensecrf; this is
our from-scratch equivalent). The shared library builds on first use with a
single g++ invocation — no build system required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "permutohedral.cpp")
_LIB_PATH = os.path.join(_HERE, "_permutohedral.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.permutohedral_filter.restype = None
        lib.permutohedral_filter.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return lib


def permutohedral_filter(positions: np.ndarray, values: np.ndarray,
                         normalize: bool = False) -> np.ndarray:
    """out_i ≈ sum_j exp(-|p_i-p_j|^2/2) v_j (lattice approximation, defined
    up to a global constant — the lattice kernel is a repeated box blur).

    positions: (N, pd) float32, pre-divided by the kernel std devs.
    values: (N, vd) float32.
    normalize: divide by the filtered all-ones channel, giving a weighted
      average (what dense-CRF message passing uses; matches pydensecrf's
      kernel normalization).
    """
    lib = load_library()
    positions = np.ascontiguousarray(positions, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    n, pd = positions.shape
    assert values.shape[0] == n
    if normalize:
        values = np.concatenate([values, np.ones((n, 1), np.float32)], axis=1)
    vd = values.shape[1]
    out = np.zeros((n, vd), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.permutohedral_filter(
        positions.ctypes.data_as(fp), values.ctypes.data_as(fp),
        out.ctypes.data_as(fp), n, pd, vd,
    )
    if normalize:
        return out[:, :-1] / np.maximum(out[:, -1:], 1e-20)
    return out
