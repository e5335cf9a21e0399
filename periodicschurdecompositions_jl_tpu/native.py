"""ctypes bindings for the native C++ host implementation (native/pschur_cpu.cpp).

The shared library implements the reference's scalar algorithm shape
(periodic Hessenberg reduction + Francis double-shift periodic QR, reference
/root/reference/src/PeriodicSchurDecompositions.jl:213-259,322-1096) as
sequential -O3 C++.  Two roles:

* the honest CPU baseline that ``bench.py`` times the TPU pipeline against
  (the reference publishes no numbers and Julia is not in the image —
  BASELINE.md documents the methodology);
* a fast exact-float64 host backend for small problems where TPU dispatch
  overhead dominates (``pschur_real_cpu``).

Built on demand with g++ if the .so is missing (no pybind11 in the image;
plain C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_HERE), "native", "pschur_cpu.cpp")
_SO = os.path.join(os.path.dirname(_HERE), "native", "libpschur_cpu.so")

_lib = None


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    if not hasattr(lib, "pqz_complex_cpu"):
        # stale .so from before the complex QZ landed: rebuild once
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
    lib.pschur_real_cpu.restype = ctypes.c_int
    lib.pschur_real_cpu.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int]
    lib.phessenberg_cpu.restype = None
    lib.phessenberg_cpu.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int]
    lib.pqz_complex_cpu.restype = ctypes.c_int
    lib.pqz_complex_cpu.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    """True if the native host library is loadable (builds it if needed)."""
    return _load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def pschur_real_cpu(A, maxitfac: int = 30, want_z: bool = True
                    ) -> Tuple[np.ndarray, Optional[np.ndarray],
                               np.ndarray, np.ndarray]:
    """Real periodic Schur decomposition on the host (native C++).

    Args:
      A: (p, n, n) real cycle (right orientation: product A[0]...A[p-1]).

    Returns:
      (T, Z, wr, wi): quasi-triangular stack, orthogonal factors with
      ``Z[l].T @ A[l] @ Z[(l+1)%p] = T[l]``, eigenvalue parts.

    Raises:
      RuntimeError: if the library is unavailable or the iteration fails.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable (g++ missing?)")
    T = np.array(A, np.float64, order="C", copy=True)
    if T.ndim != 3 or T.shape[1] != T.shape[2]:
        raise ValueError(f"expected (p, n, n), got {T.shape}")
    p, n, _ = T.shape
    Z = np.zeros_like(T)
    wr = np.zeros(n)
    wi = np.zeros(n)
    rc = lib.pschur_real_cpu(p, n, _dp(T), _dp(Z), _dp(wr), _dp(wi),
                             int(maxitfac), int(bool(want_z)))
    if rc != 0:
        raise RuntimeError(f"native pschur_real_cpu failed to converge (rc={rc})")
    return T, (Z if want_z else None), wr, wi


def phessenberg_cpu(A, want_q: bool = True
                    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Periodic Hessenberg reduction on the host (native C++)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable (g++ missing?)")
    H = np.array(A, np.float64, order="C", copy=True)
    p, n, _ = H.shape
    Q = np.zeros_like(H)
    lib.phessenberg_cpu(p, n, _dp(H), _dp(Q), int(bool(want_q)))
    return H, (Q if want_q else None)


def pqz_complex_cpu(H, S, maxitfac: int = 30, want_z: bool = True):
    """Complex periodic QZ of a Hessenberg+triangular cycle (native C++).

    The common NONSINGULAR fast path for the AED window analyses
    (ops/aed.py): input ``H`` (p, n, n) complex128 with H[0] upper
    Hessenberg and H[1:] upper triangular, ``S`` the signature.

    Returns (T, Z, alpha, beta, scal) or None when the native core
    declined (rc=2: a negligible triangular diagonal needs the full
    singular-factor machinery; rc=1: budget exhausted) — the caller
    falls back to the jitted exact core.

    Raises RuntimeError when the library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable (g++ missing?)")
    T = np.array(H, np.complex128, order="C", copy=True)
    p, n, _ = T.shape
    Sa = np.ascontiguousarray(
        [1 if bool(s) else -1 for s in S], dtype=np.int32)
    Z = np.zeros_like(T)
    alpha = np.zeros(n, np.complex128)
    beta = np.zeros(n, np.float64)
    scal = np.zeros(n, np.int32)
    dpz = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa
    ipz = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))  # noqa
    rc = lib.pqz_complex_cpu(p, n, dpz(T), ipz(Sa), dpz(Z), dpz(alpha),
                             dpz(beta), ipz(scal), int(maxitfac),
                             int(bool(want_z)))
    if rc != 0:
        return None
    return T, (Z if want_z else None), alpha, beta, scal
