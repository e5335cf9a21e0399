"""Public decomposition drivers.

API parity with the reference's exported surface
(src/PeriodicSchurDecompositions.jl:108-177, src/generalized.jl:87-148,
:1191-1211): ``pschur`` (standard and generalized via the ``S`` argument),
``gpschur`` (A/B-pair convenience), ``phessenberg``.

All drivers accept either a stacked ``(p, n, n)`` array or a sequence of
``(n, n)`` matrices, are functional (inputs never mutated), and return the
pytree result types of :mod:`..types`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..types import ConvergenceFailure, GeneralizedPeriodicSchur, PeriodicSchur
from ..utils.circshift import rev_alias
from ..ops.hessenberg import phessenberg_core, phessenberg_signed_core
from ..ops.pqz_complex import pqz_complex_core


def _stack(A) -> jax.Array:
    A = jnp.stack([jnp.asarray(a) for a in A]) if not hasattr(A, "ndim") else jnp.asarray(A)
    if A.ndim != 3 or A.shape[1] != A.shape[2]:
        raise ValueError(f"expected a (p, n, n) cycle, got shape {A.shape}")
    return A


def _char_lr(lr) -> str:
    s = str(lr).lstrip(":").upper()
    if s not in ("R", "L"):
        raise ValueError("orientation must be 'R' (right) or 'L' (left)")
    return s


def phessenberg(A, S: Optional[Sequence[bool]] = None, want_q: bool = True):
    """Periodic Hessenberg(-triangular) reduction of a cycle.

    Returns (H, Q): H[0] upper Hessenberg, H[1:] upper triangular, with
    ``Q[l]^H A[l] Q[(l+1)%p] = H[l]`` (direct factors) or
    ``Q[(l+1)%p]^H A[l] Q[l] = H[l]`` (inverted factors, when ``S`` given).
    """
    A = _stack(A)
    if S is None or all(bool(x) for x in S):
        return phessenberg_core(A, want_q=want_q)
    return phessenberg_signed_core(A, tuple(bool(x) for x in S), want_q=want_q)


def _pschur_complex_gen(A, S, orient, want_t, want_z, maxitfac):
    """Right-orientation complex GPSD pipeline on a stacked cycle."""
    p = A.shape[0]
    if orient == "L":
        A = A[::-1]
        S = tuple(reversed(S))
    if not S[0]:
        raise ValueError("the leftmost signature entry must be +1 (True); "
                         "rotate the cycle so a direct factor leads")
    if all(S):
        H, Q = phessenberg_core(A, want_q=want_z)
    else:
        H, Q = phessenberg_signed_core(A, S, want_q=want_z)
    from ..config import verbosity
    if verbosity("main") >= 1:
        T, Z, alpha, beta, scale, ok, info = pqz_complex_core(
            H, S, Z=Q, want_z=want_z, maxitfac=maxitfac, with_info=True)
        print(f"[pschur complex] p={p} n={A.shape[-1]}: "
              f"{int(info['niter'])} iterations "
              f"(budget {int(info['maxit'])}), converged={bool(ok)}")
    else:
        T, Z, alpha, beta, scale, ok = pqz_complex_core(
            H, S, Z=Q, want_z=want_z, maxitfac=maxitfac)
    if not bool(ok):
        raise ConvergenceFailure(-1)
    P = GeneralizedPeriodicSchur(
        S=S, schurindex=0, Ts=T, Zs=Z, alpha=alpha, beta=beta,
        alphascale=scale, orientation="R")
    if orient == "L":
        P = rev_alias(P)
    return P


def pschur(A, lr="R", S: Optional[Sequence[bool]] = None, *,
           want_t: bool = True, want_z: bool = True,
           maxitfac: Optional[int] = None, aggressive: bool = False):
    """Periodic (generalized) Schur decomposition of a matrix cycle.

    Args:
      A: (p, n, n) stacked cycle or sequence of square matrices.
      lr: 'R' for the product ``A[0] @ ... @ A[p-1]``, 'L' for
          ``A[p-1] @ ... @ A[0]``.
      S: optional signature (True = direct, False = inverted factor);
         selects the generalized decomposition.
      want_t/want_z: keep the triangular/unitary factors.
      maxitfac: iteration budget factor (default 30).

    Returns:
      PeriodicSchur (S is None) or GeneralizedPeriodicSchur (S given).
    """
    if aggressive:
        # the reference's aggressive deflation thresholds are themselves
        # partially implemented (it raises NotImplemented for the controlled
        # zero shift combination, src/rgeneralized.jl:245-247)
        from ..types import PSDNotImplemented
        raise PSDNotImplemented("aggressive deflation thresholds")
    A = _stack(A)
    orient = _char_lr(lr)
    p = A.shape[0]
    mif = 30 if maxitfac is None else int(maxitfac)
    if jnp.issubdtype(A.dtype, jnp.complexfloating):
        if S is None:
            gps = _pschur_complex_gen(A, (True,) * p, orient, want_t, want_z, mif)
            return PeriodicSchur(Ts=gps.Ts, Zs=gps.Zs, values=gps.values,
                                 orientation=gps.orientation,
                                 schurindex=gps.schurindex)
        return _pschur_complex_gen(A, tuple(bool(x) for x in S), orient,
                                   want_t, want_z, mif)
    # real dtypes
    if S is None:
        from ..ops.pqr_real import pschur_real_pipeline
        return pschur_real_pipeline(A, orient, want_t=want_t, want_z=want_z,
                                    maxitfac=mif)
    from ..ops.pqz_real import pschur_real_gen_pipeline
    return pschur_real_gen_pipeline(A, tuple(bool(x) for x in S), orient,
                                    want_t=want_t, want_z=want_z,
                                    maxitfac=120 if maxitfac is None else mif)


def gpschur(As, Bs, **kwargs):
    """GPSD of the formal product ``B[p-1]^-1 A[p-1] ... B[0]^-1 A[0]``.

    Convenience builder matching the reference's `gpschur`
    (src/generalized.jl:1182-1211): interleaves the pairs into a length-2p
    signed cycle (terms shifted by one, which does not change eigenvalues).
    """
    As = [jnp.asarray(a) for a in As]
    Bs = [jnp.asarray(b) for b in Bs]
    ph = len(As)
    ib = 0 if ph == 1 else ph - 2
    Cs = [As[ph - 1], Bs[ib]]
    Ss = [True, False]
    for j in range(ph - 2, -1, -1):
        Cs.append(As[j])
        Cs.append(Bs[ph - 1 if j == 0 else j - 1])
        Ss.extend([True, False])
    C = jnp.stack(Cs)
    if not jnp.issubdtype(C.dtype, jnp.complexfloating):
        kwargs.setdefault("lr", "R")
    return pschur(C, kwargs.pop("lr", "R"), S=tuple(Ss), **kwargs)
