"""ctypes bindings for the C++ oracle library (see rgp_oracle.cpp).

Auto-builds ``librgp_oracle.so`` with make on first use (g++, ~1 s).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librgp_oracle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_DIR, "rgp_oracle.cpp")
    ):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    d = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.rbf_psi_stats.argtypes = [d, d, d, d, ctypes.c_double, i64, i64, i64, d, d, d]
    lib.rbf_psi_stats.restype = None
    lib.collapsed_bound.argtypes = [d, ctypes.c_double, d, d, d, d,
                                    ctypes.c_double, ctypes.c_double, i64, i64, i64]
    lib.collapsed_bound.restype = ctypes.c_double
    lib.collapsed_bound_whitened.argtypes = [d, ctypes.c_double, d, d, d, d,
                                             ctypes.c_double, ctypes.c_double,
                                             i64, i64, i64]
    lib.collapsed_bound_whitened.restype = ctypes.c_double
    lib.jacobi_eigh.argtypes = [d, i64, d, d]
    lib.jacobi_eigh.restype = None
    lib.systematic_resample.argtypes = [d, ctypes.c_double, i64,
                                        ctypes.POINTER(ctypes.c_int64)]
    lib.systematic_resample.restype = None
    _lib = lib
    return lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rbf_psi_stats(mu, s, Z, ls, var):
    lib = _load()
    mu = np.ascontiguousarray(mu, np.float64)
    s = np.ascontiguousarray(s, np.float64)
    Z = np.ascontiguousarray(Z, np.float64)
    ls = np.ascontiguousarray(ls, np.float64)
    T, Q = mu.shape
    M = Z.shape[0]
    psi0 = np.empty(T)
    psi1 = np.empty((T, M))
    psi2 = np.empty((M, M))
    lib.rbf_psi_stats(_dp(mu), _dp(s), _dp(Z), _dp(ls), float(var),
                      T, M, Q, _dp(psi0), _dp(psi1), _dp(psi2))
    return psi0, psi1, psi2


def collapsed_bound(Kmm, psi0_sum, psi1, psi2, Y, Yvar, noise, jitter):
    lib = _load()
    Kmm = np.ascontiguousarray(Kmm, np.float64)
    psi1 = np.ascontiguousarray(psi1, np.float64)
    psi2 = np.ascontiguousarray(psi2, np.float64)
    Y = np.ascontiguousarray(Y, np.float64)
    T, D = Y.shape
    M = Kmm.shape[0]
    yv = None if Yvar is None else np.ascontiguousarray(Yvar, np.float64)
    return lib.collapsed_bound(
        _dp(Kmm), float(psi0_sum), _dp(psi1), _dp(psi2), _dp(Y),
        _dp(yv) if yv is not None else None,
        float(noise), float(jitter), T, M, D,
    )


def collapsed_bound_whitened(Kmm, psi0_sum, psi1, psi2, Y, Yvar, noise,
                             floor_rel=1e-6):
    """Independent oracle for the spectral-whitening bound formulation
    (rgp_tpu.inference.collapsed_vi), using the library's own Jacobi
    eigensolver — no LAPACK in the loop."""
    lib = _load()
    Kmm = np.ascontiguousarray(Kmm, np.float64)
    psi1 = np.ascontiguousarray(psi1, np.float64)
    psi2 = np.ascontiguousarray(psi2, np.float64)
    Y = np.ascontiguousarray(Y, np.float64)
    T, D = Y.shape
    M = Kmm.shape[0]
    yv = None if Yvar is None else np.ascontiguousarray(Yvar, np.float64)
    return lib.collapsed_bound_whitened(
        _dp(Kmm), float(psi0_sum), _dp(psi1), _dp(psi2), _dp(Y),
        _dp(yv) if yv is not None else None,
        float(noise), float(floor_rel), T, M, D,
    )


def jacobi_eigh(A):
    lib = _load()
    A = np.ascontiguousarray(A, np.float64)
    N = A.shape[0]
    lam = np.empty(N)
    V = np.empty((N, N))
    lib.jacobi_eigh(_dp(A), N, _dp(lam), _dp(V))
    return lam, V


def systematic_resample(log_w, u0):
    lib = _load()
    log_w = np.ascontiguousarray(log_w, np.float64)
    N = log_w.shape[0]
    idx = np.empty(N, np.int64)
    lib.systematic_resample(_dp(log_w), float(u0), N,
                            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return idx
