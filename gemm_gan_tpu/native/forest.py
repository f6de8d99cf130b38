"""ctypes binding for the native histogram random forest (hist_forest.cpp).

sklearn-style estimator replacing the reference's LightGBM rf-mode classifier
(/root/reference/src/generative_model_utils.py:75,
`LGBMClassifier(boosting_type='rf')`): histogram-binned splits, per-node
feature subsampling, bootstrap bagging, thread-parallel trees. Used by the
detection/utility harnesses (gemm_gan_tpu/eval/detection.py) with an sklearn
RandomForest fallback when the toolchain is absent.
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

    lib = load_native_lib("libhistforest.so")
    if lib is None:
        return None
    lib.hf_train.restype = ctypes.c_void_p
    lib.hf_train.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # X [n*d]
        ctypes.POINTER(ctypes.c_int32),   # y [n]
        ctypes.c_int64, ctypes.c_int64,   # n, d
        ctypes.c_int32,                   # n_classes
        ctypes.c_int32,                   # n_trees
        ctypes.c_int32,                   # max_depth
        ctypes.c_int32,                   # n_bins
        ctypes.c_double,                  # feature_fraction (<=0 => sqrt)
        ctypes.c_double,                  # bagging_fraction
        ctypes.c_int32,                   # min_leaf
        ctypes.c_uint64,                  # seed
        ctypes.c_int32,                   # n_threads
    ]
    lib.hf_predict_proba.restype = None
    lib.hf_predict_proba.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.hf_free.restype = None
    lib.hf_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def forest_available() -> bool:
    return _load() is not None


class HistForestClassifier:
    """Native histogram random forest with the sklearn estimator surface
    (`fit`/`predict`/`predict_proba`/`classes_`) the eval harnesses expect."""

    def __init__(self, n_estimators: int = 100, max_depth: int = 16,
                 n_bins: int = 64, feature_fraction: float = -1.0,
                 bagging_fraction: float = 1.0, min_samples_leaf: int = 1,
                 random_state: int = 0, n_jobs: int = -1):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.n_bins = n_bins
        self.feature_fraction = feature_fraction
        self.bagging_fraction = bagging_fraction
        self.min_samples_leaf = min_samples_leaf
        self.random_state = random_state
        self.n_jobs = n_jobs
        self._handle = None
        self._lib = None
        self.classes_ = None
        self._d = None

    def __del__(self):
        self._release()

    def _release(self):
        if self._handle is not None and self._lib is not None:
            self._lib.hf_free(self._handle)
            self._handle = None

    def fit(self, X, y):
        lib = _load()
        if lib is None:
            raise RuntimeError("native hist-forest library not built")
        self._release()
        X = np.ascontiguousarray(X, np.float32)
        if X.ndim != 2:
            raise ValueError(f"X must be 2-D, got {X.shape}")
        self.classes_, y_idx = np.unique(np.asarray(y), return_inverse=True)
        n_classes = max(2, len(self.classes_))
        y_idx = np.ascontiguousarray(y_idx, np.int32)
        n, d = X.shape
        self._d = d
        n_threads = os.cpu_count() if self.n_jobs in (-1, 0, None) else self.n_jobs
        handle = lib.hf_train(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, d, n_classes, self.n_estimators, self.max_depth, self.n_bins,
            self.feature_fraction, self.bagging_fraction,
            self.min_samples_leaf, self.random_state, n_threads)
        if not handle:
            raise RuntimeError("hf_train failed (bad inputs?)")
        self._handle = handle
        self._lib = lib
        self._n_out = n_classes
        return self

    def predict_proba(self, X):
        if self._handle is None:
            raise RuntimeError("fit() before predict")
        X = np.ascontiguousarray(X, np.float32)
        if X.ndim != 2 or X.shape[1] != self._d:
            raise ValueError(f"X shape {X.shape} != (*, {self._d})")
        n = X.shape[0]
        out = np.empty((n, self._n_out), np.float32)
        n_threads = os.cpu_count() if self.n_jobs in (-1, 0, None) else self.n_jobs
        self._lib.hf_predict_proba(
            self._handle,
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        # restrict to the observed classes (binary-with-one-class edge case)
        return out[:, :len(self.classes_)] if len(self.classes_) < self._n_out \
            else out

    def predict(self, X):
        proba = self.predict_proba(X)
        return self.classes_[np.argmax(proba, axis=1)]

    def score(self, X, y):
        return float(np.mean(self.predict(X) == np.asarray(y)))
