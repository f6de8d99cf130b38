"""Native (C++) components: exact optimal transport + histogram forest.

The reference relies on two third-party C++ cores this package replaces
natively (SURVEY.md §2.6):
  * POT's network simplex for exact Wasserstein
    (/root/reference/src/distribution_distances.py:329-343 via `ot.emd2`)
    → `ot_emd.cpp`, bound below;
  * LightGBM's tree learner in rf mode for detection/utility classifiers
    (/root/reference/src/generative_model_utils.py:75)
    → `hist_forest.cpp`, bound in `gemm_gan_tpu.native.forest`.
Both are ctypes shared libraries; build with
`python -m gemm_gan_tpu.native.build` (lazy-built on first use otherwise).
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
    from gemm_gan_tpu.native.build import load_native_lib

    lib = load_native_lib("libotemd.so")
    if lib is not None:
        lib.emd2.restype = ctypes.c_double
        lib.emd2.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # a [n]
            ctypes.POINTER(ctypes.c_double),  # b [m]
            ctypes.POINTER(ctypes.c_double),  # M [n*m]
            ctypes.c_int,                     # n
            ctypes.c_int,                     # m
            ctypes.c_long,                    # max iterations
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def exact_emd2(a: np.ndarray, b: np.ndarray, M: np.ndarray,
               num_iter_max: int = 10_000_000) -> float:
    """Exact OT cost <P*, M> with marginals a, b (sum to the same mass)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native OT library not built")
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    M = np.ascontiguousarray(M, np.float64)
    n, m = M.shape
    ret = lib.emd2(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, m, num_iter_max,
    )
    if ret < 0:
        raise RuntimeError("native OT solver failed to converge")
    return float(ret)
