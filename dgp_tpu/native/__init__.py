"""Native (C++) Pareto utilities with transparent numpy fallback.

``nd_sort_2d`` / ``hv_2d`` accelerate the BO archive bookkeeping — the
reference's O(n^2) Python non-dominated sort (EHVI.py:35-81) — with an
O(n log n) C++ sweep. The shared library is built on demand with g++ (see
Makefile); if the toolchain or build is unavailable everything falls back to
the pure-numpy implementations in ``dgp_tpu.bo.ehvi``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpareto.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libpareto.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nd_sort_2d.restype = ctypes.c_int64
        lib.nd_sort_2d.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.hv_2d.restype = ctypes.c_double
        lib.hv_2d.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def nd_sort_2d(Y, C, obj1_ascending=True):
    """Drop-in for ``dgp_tpu.bo.ehvi.NDC`` (2 objectives, minimization)."""
    lib = _load()
    if lib is None:
        from ..bo.ehvi import _ndc_numpy

        return _ndc_numpy(Y, C, obj1_ascending=obj1_ascending)
    y = np.ascontiguousarray(
        np.concatenate((np.asarray(Y[0]).reshape(-1, 1),
                        np.asarray(Y[1]).reshape(-1, 1)), axis=1),
        dtype=np.float64,
    )
    n = y.shape[0]
    feasible = np.ascontiguousarray(
        (np.asarray(C).reshape(n, -1).max(axis=1) <= 0).astype(np.uint8)
    )
    out = np.empty(n, dtype=np.int64)
    count = lib.nd_sort_2d(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        feasible.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    nd = [int(i) for i in out[:count]]
    return nd if obj1_ascending else nd[::-1]


def hv_2d(ND, Y, bounds):
    """Fast path for ``dgp_tpu.bo.ehvi.HV_calcul`` **assuming an in-box
    front**: points of ``ND`` outside the (U1, U2) reference corner are
    skipped and the rest summed, whereas HV_calcul returns 0 for the whole
    front when any ND point exceeds both bounds and zeroes segments per its
    staircase quirks. Callers with possibly out-of-box fronts must use
    HV_calcul."""
    lib = _load()
    if lib is None:
        from ..bo.ehvi import HV_calcul

        return HV_calcul(ND, Y, bounds)
    _, _, u1, u2 = bounds
    y = np.ascontiguousarray(
        np.concatenate((np.asarray(Y[0]).reshape(-1, 1),
                        np.asarray(Y[1]).reshape(-1, 1)), axis=1),
        dtype=np.float64,
    )
    nd = np.ascontiguousarray(np.asarray(ND, dtype=np.int64))
    if nd.size == 0:
        return 0.0
    return float(lib.hv_2d(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nd.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nd.size, float(u1), float(u2),
    ))
