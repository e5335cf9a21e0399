"""Integrity checks for periodic Schur decompositions.

`check_psd` is the public verification utility (behavioral contract from the
reference's `checkpsd`, src/diagnostics.jl:183-263): triangularity of the
factors, orthonormality of the Schur vectors, and the per-factor
reconstruction residual against the original cycle.

Host-side (numpy) on purpose: it is a diagnostic/testing tool, not a hot
path, and exact branchy reporting is clearer off-device.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


from .types import GeneralizedPeriodicSchur


def _reconstruct(P):
    """Per-factor reconstruction Ahat[l] from (T, Z) honoring orientation/S."""
    p = P.period
    Ts = np.asarray(P.Ts)
    Zs = np.asarray(P.Zs)
    left = P.orientation == "L"
    S = P.S if isinstance(P, GeneralizedPeriodicSchur) else (True,) * p
    Ahat = np.empty_like(Ts)
    for l in range(p):
        ln = (l + 1) % p
        if bool(S[l]) ^ left:
            Ahat[l] = Zs[l] @ Ts[l] @ Zs[ln].conj().T
        else:
            Ahat[l] = Zs[ln] @ Ts[l] @ Zs[l].conj().T
    return Ahat


def check_psd(P, A: Optional[np.ndarray] = None, *, qtol: float = 10.0,
              tol: float = 100.0, verbose: bool = False):
    """Verify a periodic Schur decomposition.

    Args:
      P: PeriodicSchur or GeneralizedPeriodicSchur (with Zs present).
      A: optional original cycle, stacked (p, n, n); enables the
         reconstruction-residual check.
      qtol: orthonormality threshold multiplier: ||Z Z' - I|| < qtol*eps*n.
      tol: reconstruction threshold multiplier: ||A - Ahat||_1 <= tol*eps*||A||_1
           per factor (reference default 100, src/diagnostics.jl:191).

    Returns:
      (ok, report) where report maps check names to measured values.
    """
    Ts = np.asarray(P.Ts)
    p, n, _ = Ts.shape
    eps = np.finfo(Ts.real.dtype).eps
    report = {}
    ok = True

    # triangularity: all factors upper triangular; the schurindex factor may
    # be quasi-triangular (one extra subdiagonal) for real dtypes
    isreal = not np.iscomplexobj(Ts)
    tri_junk = 0.0
    for l in range(p):
        k = -1 if (l == P.schurindex and isreal) else 0
        sub = np.tril(Ts[l], k - 1)
        tri_junk = max(tri_junk, np.abs(sub).max() if sub.size else 0.0)
    report["triangularity_junk"] = tri_junk
    ok &= tri_junk == 0.0

    if P.Zs is not None:
        Zs = np.asarray(P.Zs)
        orth = max(
            np.linalg.norm(Zs[l] @ Zs[l].conj().T - np.eye(n), ord=1) for l in range(p)
        )
        report["orthonormality"] = orth
        report["orthonormality_bound"] = qtol * eps * n
        ok &= orth < qtol * eps * n

        if A is not None:
            A = np.asarray(A)
            Ahat = _reconstruct(P)
            worst = 0.0
            for l in range(p):
                anorm = max(np.linalg.norm(A[l], ord=1), np.finfo(A.real.dtype).tiny)
                worst = max(worst, np.linalg.norm(A[l] - Ahat[l], ord=1) / anorm)
            report["residual_rel"] = worst
            report["residual_bound"] = tol * eps
            ok &= worst <= tol * eps
    if verbose:
        print("check_psd:", "OK" if ok else "FAIL", report)
    return bool(ok), report


class FacChecker:
    """Transformation-chain verifier for debugging iteration cores.

    Behavioral contract from the reference's `_FacChecker`
    (src/diagnostics.jl:45-178): capture the initial cycle, then recompute
    the implied original factors from the current (H, Z) at any point in an
    iteration and report the drift.  Use inside host-side experiments (the
    jitted cores can be stepped by lowering maxitfac).
    """

    def __init__(self, A, S=None, left=False):
        self.A = np.asarray(A).copy()
        self.p = self.A.shape[0]
        self.S = tuple(bool(x) for x in S) if S is not None else (True,) * self.p
        self.left = left

    def __call__(self, label: str, H, Z, verbose: bool = True) -> float:
        H = np.asarray(H)
        Z = np.asarray(Z)
        p = self.p
        worst = 0.0
        for l in range(p):
            ln = (l + 1) % p
            if self.S[l] ^ self.left:
                Ax = Z[l] @ H[l] @ Z[ln].conj().T
            else:
                Ax = Z[ln] @ H[l] @ Z[l].conj().T
            scale = max(np.abs(self.A[l]).max(), 1e-300)
            worst = max(worst, np.abs(Ax - self.A[l]).max() / scale)
        if verbose:
            print(f"FacChecker[{label}]: worst factor drift {worst:.3e}")
        return worst
