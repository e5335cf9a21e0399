"""Arbitrary-precision (mpmath) host path: generic-eltype periodic QZ.

Capability parity with the reference's generic-eltype (BigFloat) pipeline:
the reference runs extended precision end to end through its generic signed
Hessenberg-triangular reduction (/root/reference/src/generalized.jl:1085-1179)
and its eltype-generic complex periodic QZ core
(/root/reference/src/generalized.jl:166-931), exercised with BigFloat in its
test matrix (/root/reference/test/runtests.jl, test/generalized.jl).  TPU
hardware has no extended-precision story beyond the float-float (~2^-48)
production path, so — exactly like the reference — the generic path is a
HOST path: a scalar mpmath implementation of the same two stages at any
working precision (``mpmath.mp.dps``).

Scope and conventions (all mirror the f64 cores of this package):

* complex (unitary) decomposition for any input eltype: real cycles are
  decomposed in complex arithmetic (the reference's generic REAL core keeps
  a real quasi-triangular form; this path trades that structural nicety for
  one generic core — a documented deviation).
* signatures per :mod:`.pqz_complex` (``S[0]`` must be True); eigenvalues in
  decomposed ``alpha / beta * 2^scale`` form with ``|alpha| ∈ [1,2) ∪ {0}``
  and ``beta ∈ {0,1}``.
* algorithm identical to :func:`.pqz_complex.pqz_complex_core` (MB03BZ
  semantics: deflation tests 1-3, controlled zero shift, deflate_pos/neg,
  single-shift QZ sweeps, diagonal phase-rescale postprocess), written as
  plain scalar Python over mpmath numbers.

This is a small-n convenience/verification path (object arithmetic is
O(n^3 p) Python-scalar work); the production paths are the jitted cores.
"""
from __future__ import annotations

import dataclasses
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from mpmath import mp, mpc, mpf
    HAVE_MPMATH = True
except ImportError:  # pragma: no cover - mpmath is in the base image
    HAVE_MPMATH = False


# --------------------------------------------------------------------------
# scalar kernels

def _givens(f, g):
    """Complex Givens: (c real >= 0, s, r) with [c s; -s̄ c] @ [f, g] = [r, 0].

    Same convention as ops/rotations.givens_complex (g == 0 -> (1, 0, f)
    exactly; f == 0 -> (0, ḡ/|g|, |g|)); mpmath needs no over/underflow
    scaling.
    """
    f = mpc(f)
    g = mpc(g)
    if g == 0:
        return mp.one, mpc(0), f
    if f == 0:
        ag = abs(g)
        return mp.zero, g.conjugate() / ag, mpc(ag)
    af = abs(f)
    d = mp.sqrt(af * af + abs(g) ** 2)
    c = af / d
    fs = f / af
    return c, fs * g.conjugate() / d, fs * d


def _lmat(c, s):
    """Left action of G(c, s) on a row pair: [[c, s], [-s̄, c]] (c real)."""
    return (c, s, -s.conjugate(), mpc(c))


def _rmat_adj(c, s):
    """Right action of G(c, s)^H on a column pair: [[c, -s], [s̄, c]]."""
    return (c, -s, s.conjugate(), mpc(c))


def _rows2(A, i, M, lo=0, hi=None):
    """A[i:i+2, lo:hi] = M @ A[i:i+2, lo:hi] (M a flat 2x2 tuple)."""
    a, b, c, d = M
    hi = len(A) if hi is None else hi
    Ai, Ai1 = A[i], A[i + 1]
    for j in range(lo, hi):
        x, y = Ai[j], Ai1[j]
        Ai[j] = a * x + b * y
        Ai1[j] = c * x + d * y


def _cols2(A, j, M, lo=0, hi=None):
    """A[lo:hi, j:j+2] = A[lo:hi, j:j+2] @ M."""
    a, b, c, d = M
    hi = len(A) if hi is None else hi
    for i in range(lo, hi):
        Ai = A[i]
        x, y = Ai[j], Ai[j + 1]
        Ai[j] = x * a + y * c
        Ai[j + 1] = x * b + y * d


def _to_mp(A) -> List[List[List[mpc]]]:
    A = np.asarray(A)
    if A.ndim != 3 or A.shape[1] != A.shape[2]:
        raise ValueError(f"expected a (p, n, n) cycle, got shape {A.shape}")
    if A.dtype == object:
        # arbitrary-precision input (mpf/mpc entries): convert exactly —
        # a complex() round-trip would truncate to f64 and silently cap
        # the achievable backward error at ~1e-16 regardless of dps
        return [[[mpc(A[l, i, j]) for j in range(A.shape[2])]
                 for i in range(A.shape[1])] for l in range(A.shape[0])]
    return [[[mpc(complex(A[l, i, j])) for j in range(A.shape[2])]
             for i in range(A.shape[1])] for l in range(A.shape[0])]


def _eye_mp(n):
    return [[mpc(1) if i == j else mpc(0) for j in range(n)]
            for i in range(n)]


def _safeprod_signed_mp(x, S):
    """Scaled signed product: (alpha, beta, scale), |alpha| in [1,2) u {0}.

    Mirrors utils/safeprod.safeprod_signed (reference `_safeprod`,
    src/generalized.jl:933-976): beta = 0 encodes an infinite eigenvalue
    from a singular inverted factor.
    """
    alpha = mpc(1)
    beta = 1
    for xl, sl in zip(x, S):
        if sl:
            alpha = alpha * xl
        elif xl == 0:
            beta = 0
        else:
            alpha = alpha / xl
    scale = 0
    a = abs(alpha)
    if a != 0:
        e = mp.floor(mp.log(a, 2))
        scale = int(e)
        alpha = alpha / mpf(2) ** scale
        # guard log rounding at binade boundaries
        while abs(alpha) >= 2:
            alpha /= 2
            scale += 1
        while abs(alpha) < 1:
            alpha *= 2
            scale -= 1
    return alpha, beta, scale


# --------------------------------------------------------------------------
# reduction: signed periodic Hessenberg-triangular, Givens-based

def phessenberg_mp(A, S: Sequence[bool], want_q: bool = True):
    """Generic periodic Hessenberg(-triangular) reduction in mp arithmetic.

    Same contract as ops/hessenberg.phessenberg_signed_core (reference
    generic `_phessenberg!`, src/generalized.jl:1085-1179): on return
    ``H[0]`` is upper Hessenberg, ``H[1:]`` upper triangular, with
    ``Q[l]^H A[l] Q[(l+1)%p] = H[l]`` for direct factors and
    ``Q[(l+1)%p]^H A[l] Q[l] = H[l]`` for inverted ones.  ``A`` is a list
    of mp matrices and is MUTATED; pass a fresh copy.
    """
    p = len(A)
    n = len(A[0])
    if not S[0]:
        raise ValueError("signature entry S[0] must be True")
    Q = [_eye_mp(n) for _ in range(p)] if want_q else None

    # ---- stage 1: triangularize factors p-1..1 (Givens QR / RQ) ---------
    for l in range(p - 1, 0, -1):
        if S[l]:
            # QR: A[l] <- Qf^H A[l]; neighbor A[l-1] takes Qf on its S-side
            for j in range(n):
                for i in range(n - 1, j, -1):
                    c, s, r = _givens(A[l][i - 1][j], A[l][i][j])
                    if s == 0:
                        continue
                    A[l][i - 1][j] = r
                    A[l][i][j] = mpc(0)
                    _rows2(A[l], i - 1, _lmat(c, s), lo=j + 1)
                    if S[l - 1]:
                        _cols2(A[l - 1], i - 1, _rmat_adj(c, s))
                    else:
                        _rows2(A[l - 1], i - 1, _lmat(c, s))
                    if want_q:
                        _cols2(Q[l], i - 1, _rmat_adj(c, s))
        else:
            # RQ: A[l] <- A[l] Qf^H via right lmat rotations (row i zeroed
            # left-to-right with column pairs (j, j+1), rows bottom-up)
            for i in range(n - 1, 0, -1):
                for j in range(i):
                    c, s, r = _givens(A[l][i][j + 1], A[l][i][j])
                    if s == 0:
                        continue
                    A[l][i][j] = mpc(0)
                    A[l][i][j + 1] = r
                    _cols2(A[l], j, _lmat(c, s), hi=i)
                    if S[l - 1]:
                        _cols2(A[l - 1], j, _lmat(c, s))
                    else:
                        _rows2(A[l - 1], j, _rmat_adj(c, s))
                    if want_q:
                        _cols2(Q[l], j, _lmat(c, s))

    if n <= 2:
        for l in range(1, p):
            for i in range(1, n):
                for j in range(i):
                    A[l][i][j] = mpc(0)
        return A, Q

    # ---- stage 2: Givens Hessenberg reduction of factor 0 ----------------
    G: List[Tuple] = [(mp.one, mpc(0))] * n
    for j in range(n - 2):
        for i in range(n - 1, j + 1, -1):
            c, s, r = _givens(A[0][i - 1][j], A[0][i][j])
            A[0][i - 1][j] = r
            A[0][i][j] = mpc(0)
            _rows2(A[0], i - 1, _lmat(c, s), lo=j + 1)
            G[i] = (c, s)
        if want_q:
            for i in range(n - 1, j + 1, -1):
                _cols2(Q[0], i - 1, _rmat_adj(*G[i]))
        for l in range(p - 1, 0, -1):
            if S[l]:
                for i in range(n - 1, j + 1, -1):
                    _cols2(A[l], i - 1, _rmat_adj(*G[i]), hi=i + 1)
                    c, s, r = _givens(A[l][i - 1][i - 1], A[l][i][i - 1])
                    A[l][i - 1][i - 1] = r
                    A[l][i][i - 1] = mpc(0)
                    _rows2(A[l], i - 1, _lmat(c, s), lo=i)
                    G[i] = (c, s)
            else:
                for i in range(n - 1, j + 1, -1):
                    _rows2(A[l], i - 1, _lmat(*G[i]), lo=i - 1)
                    c, s, r = _givens(A[l][i][i], A[l][i][i - 1])
                    A[l][i][i] = r
                    A[l][i][i - 1] = mpc(0)
                    _cols2(A[l], i - 1, _lmat(c, s), hi=i)
                    G[i] = (c, -s)
            if want_q:
                for i in range(n - 1, j + 1, -1):
                    _cols2(Q[l], i - 1, _rmat_adj(*G[i]))
        for i in range(n - 1, j + 1, -1):
            _cols2(A[0], i - 1, _rmat_adj(*G[i]))
    return A, Q


# --------------------------------------------------------------------------
# QZ core (scalar mirror of ops/pqz_complex.pqz_complex_core +
# ops/pqz_deflate.make_deflate_cores)

def _deflate_pos_mp(H, Z, S, jlo, ldef, jdef, ilast, want_z):
    """Non-inverted singular factor: two unshifted half-sweeps meet at the
    zero (mirror of pqz_deflate.pos_core; reference deflate_pos,
    src/generalized.jl:453-566)."""
    p = len(H)
    H[ldef][jdef][jdef] = mpc(0)

    # first half-sweep downwards from jlo
    G = {}
    for k in range(jlo, jdef):
        c, s, r = _givens(H[0][k][k], H[0][k + 1][k])
        H[0][k][k] = r
        H[0][k + 1][k] = mpc(0)
        _rows2(H[0], k, _lmat(c, s), lo=k + 1)
        G[k] = (c, s)
    if want_z:
        for k in range(jlo, jdef):
            _cols2(Z[0], k, _rmat_adj(*G[k]))
    for l in range(p - 1, 0, -1):
        ntra = jdef - 2 if l < ldef else jdef - 1
        if S[l]:
            for k in range(jlo, ntra + 1):
                _cols2(H[l], k, _rmat_adj(*G[k]), hi=k + 2)
                c, s, r = _givens(H[l][k][k], H[l][k + 1][k])
                H[l][k][k] = r
                H[l][k + 1][k] = mpc(0)
                _rows2(H[l], k, _lmat(c, s), lo=k + 1)
                G[k] = (c, s)
        else:
            for k in range(jlo, ntra + 1):
                _rows2(H[l], k, _lmat(*G[k]), lo=k)
                c, s, r = _givens(H[l][k + 1][k + 1], H[l][k + 1][k])
                H[l][k + 1][k + 1] = r
                H[l][k + 1][k] = mpc(0)
                _cols2(H[l], k, _lmat(c, s), hi=k + 1)
                G[k] = (c, -s)
        if want_z:
            for k in range(jlo, ntra + 1):
                _cols2(Z[l], k, _rmat_adj(*G[k]))
    for k in range(jlo, jdef - 1):
        _cols2(H[0], k, _rmat_adj(*G[k]), hi=k + 2)

    # second half-sweep upwards from ilast
    G2 = {}
    for j in range(ilast, jdef, -1):
        c, s, r = _givens(H[0][j][j], H[0][j][j - 1])
        H[0][j][j] = r
        H[0][j][j - 1] = mpc(0)
        _cols2(H[0], j - 1, _lmat(c, s), hi=j)
        G2[j] = (c, -s)
    if want_z:
        for j in range(ilast, jdef, -1):
            _cols2(Z[1 % p], j - 1, _rmat_adj(*G2[j]))
    for l in range(1, p):
        ntra = jdef + 2 if l > ldef else jdef + 1
        if not S[l]:
            for j in range(ilast, ntra - 1, -1):
                _cols2(H[l], j - 1, _rmat_adj(*G2[j]), hi=j + 1)
                c, s, r = _givens(H[l][j - 1][j - 1], H[l][j][j - 1])
                H[l][j - 1][j - 1] = r
                H[l][j][j - 1] = mpc(0)
                _rows2(H[l], j - 1, _lmat(c, s), lo=j)
                G2[j] = (c, s)
        else:
            for j in range(ilast, ntra - 1, -1):
                _rows2(H[l], j - 1, _lmat(*G2[j]), lo=j - 1)
                c, s, r = _givens(H[l][j][j], H[l][j][j - 1])
                H[l][j][j] = r
                H[l][j][j - 1] = mpc(0)
                _cols2(H[l], j - 1, _lmat(c, s), hi=j)
                G2[j] = (c, -s)
        if want_z:
            for j in range(ilast, ntra - 1, -1):
                _cols2(Z[(l + 1) % p], j - 1, _rmat_adj(*G2[j]))
    for j in range(ilast, jdef + 1, -1):
        _rows2(H[0], j - 1, _lmat(*G2[j]), lo=j - 1)


def _deflate_neg_mp(H, Z, S, jlo, ldef, jdef, ilast, want_z):
    """Inverted singular factor: chase the zero off the window bottom/top
    (mirror of pqz_deflate.neg_core; reference deflate_neg,
    src/generalized.jl:568-740)."""
    p = len(H)
    n = len(H[0])
    H[ldef][jdef][jdef] = mpc(0)

    def zup(l, base, c, s):
        if want_z:
            _cols2(Z[l], base, _rmat_adj(c, s))

    if jdef + 1 > (ilast - jlo + 1) / 2:
        # ---------------- chase down ----------------
        for j1 in range(jdef, ilast):
            j = j1
            c, s, r = _givens(H[ldef][j][j + 1], H[ldef][j + 1][j + 1])
            H[ldef][j][j + 1] = r
            H[ldef][j + 1][j + 1] = mpc(0)
            _rows2(H[ldef], j, _lmat(c, s), lo=j + 2)
            ln = (ldef + 1) % p
            zup(ln, j, c, s)
            for _ in range(p - 1):
                Hl = H[ln]
                if ln == 0:
                    _rows2(Hl, j, _lmat(c, s), lo=j - 1)
                    c, s, r = _givens(Hl[j + 1][j], Hl[j + 1][j - 1])
                    Hl[j + 1][j] = r
                    Hl[j + 1][j - 1] = mpc(0)
                    _cols2(Hl, j - 1, _lmat(c, s), hi=j + 1)
                    j, s = j - 1, -s
                elif S[ln]:
                    _rows2(Hl, j, _lmat(c, s), lo=j)
                    c, s, r = _givens(Hl[j + 1][j + 1], Hl[j + 1][j])
                    Hl[j + 1][j + 1] = r
                    Hl[j + 1][j] = mpc(0)
                    _cols2(Hl, j, _lmat(c, s), hi=j + 1)
                    s = -s
                else:
                    _cols2(Hl, j, _rmat_adj(c, s), hi=j + 2)
                    c, s, r = _givens(Hl[j][j], Hl[j + 1][j])
                    Hl[j][j] = r
                    Hl[j + 1][j] = mpc(0)
                    _rows2(Hl, j, _lmat(c, s), lo=j + 1)
                ln = (ln + 1) % p
                zup(ln, j, c, s)
            _cols2(H[ldef], j, _rmat_adj(c, s), hi=j + 1)
        # deflate the last element of the Hessenberg factor
        j = ilast
        c, s, r = _givens(H[0][j][j], H[0][j][j - 1])
        H[0][j][j] = r
        H[0][j][j - 1] = mpc(0)
        _cols2(H[0], j - 1, _lmat(c, s), hi=j)
        c2, s2 = c, -s
        zup(1 % p, j - 1, c2, s2)
        for l in range(1, p):
            if l >= ldef:
                continue
            Hl = H[l]
            if not S[l]:
                _cols2(Hl, j - 1, _rmat_adj(c2, s2), hi=j + 1)
                cn, sn, r = _givens(Hl[j - 1][j - 1], Hl[j][j - 1])
                Hl[j - 1][j - 1] = r
                Hl[j][j - 1] = mpc(0)
                _rows2(Hl, j - 1, _lmat(cn, sn), lo=j)
                c2, s2 = cn, sn
            else:
                _rows2(Hl, j - 1, _lmat(c2, s2), lo=j - 1)
                cn, sn, r = _givens(Hl[j][j], Hl[j][j - 1])
                Hl[j][j] = r
                Hl[j][j - 1] = mpc(0)
                _cols2(Hl, j - 1, _lmat(cn, sn), hi=j)
                c2, s2 = cn, -sn
            zup((l + 1) % p, j - 1, c2, s2)
        _cols2(H[ldef], j - 1, _rmat_adj(c2, s2), hi=j + 1)
    else:
        # ---------------- chase up ----------------
        for j1 in range(jdef, jlo, -1):
            j = j1
            c, s, r = _givens(H[ldef][j - 1][j], H[ldef][j - 1][j - 1])
            H[ldef][j - 1][j] = r
            H[ldef][j - 1][j - 1] = mpc(0)
            _cols2(H[ldef], j - 1, _lmat(c, s), hi=j - 1)
            s = -s
            zup(ldef, j - 1, c, s)
            ln = (ldef - 1) % p
            for _ in range(p - 1):
                Hl = H[ln]
                if ln == 0:
                    _cols2(Hl, j - 1, _rmat_adj(c, s), hi=j + 2)
                    c, s, r = _givens(Hl[j][j - 1], Hl[j + 1][j - 1])
                    Hl[j][j - 1] = r
                    Hl[j + 1][j - 1] = mpc(0)
                    _rows2(Hl, j, _lmat(c, s), lo=j)
                    j = j + 1
                elif S[ln]:
                    _cols2(Hl, j - 1, _rmat_adj(c, s), hi=j + 1)
                    c, s, r = _givens(Hl[j - 1][j - 1], Hl[j][j - 1])
                    Hl[j - 1][j - 1] = r
                    Hl[j][j - 1] = mpc(0)
                    _rows2(Hl, j - 1, _lmat(c, s), lo=j)
                else:
                    _rows2(Hl, j - 1, _lmat(c, s), lo=j - 1)
                    c, s, r = _givens(Hl[j][j], Hl[j][j - 1])
                    Hl[j][j] = r
                    Hl[j][j - 1] = mpc(0)
                    _cols2(Hl, j - 1, _lmat(c, s), hi=j)
                    s = -s
                zup(ln, j - 1, c, s)
                ln = (ln - 1) % p
            _rows2(H[ldef], j - 1, _lmat(c, s), lo=j)
        # deflate the first element of the Hessenberg factor
        j = jlo
        c, s, r = _givens(H[0][j][j], H[0][j + 1][j])
        H[0][j][j] = r
        H[0][j + 1][j] = mpc(0)
        _rows2(H[0], j, _lmat(c, s), lo=j + 1)
        c2, s2 = c, s
        zup(0, j, c2, s2)
        for l in range(p - 1, 0, -1):
            if l <= ldef:
                continue
            Hl = H[l]
            if S[l]:
                _cols2(Hl, j, _rmat_adj(c2, s2), hi=j + 2)
                cn, sn, r = _givens(Hl[j][j], Hl[j + 1][j])
                Hl[j][j] = r
                Hl[j + 1][j] = mpc(0)
                _rows2(Hl, j, _lmat(cn, sn), lo=j + 1)
                c2, s2 = cn, sn
            else:
                _rows2(Hl, j, _lmat(c2, s2), lo=j)
                cn, sn, r = _givens(Hl[j + 1][j + 1], Hl[j + 1][j])
                Hl[j + 1][j + 1] = r
                Hl[j + 1][j] = mpc(0)
                _cols2(Hl, j, _lmat(cn, sn), hi=j + 1)
                c2, s2 = cn, -sn
            zup(l, j, c2, s2)
        _rows2(H[ldef], j, _lmat(c2, s2), lo=j + 1)


def _czshift_mp(H, Z, S, jlo, ilast, ulp, smlnum, want_z):
    """Controlled zero shift (mirror of pqz_deflate.czshift_core; reference
    src/generalized.jl:356-448).  Returns True if a deflation surfaced."""
    p = len(H)
    G = {}
    # stage A: triangularize the Hessenberg factor on the window
    for k in range(jlo, ilast):
        c, s, r = _givens(H[0][k][k], H[0][k + 1][k])
        H[0][k][k] = r
        H[0][k + 1][k] = mpc(0)
        _rows2(H[0], k, _lmat(c, s), lo=k + 1)
        G[k] = (c, s)
    if want_z:
        for k in range(jlo, ilast):
            _cols2(Z[0], k, _rmat_adj(*G[k]))
    # stage B: propagate backwards through the triangular factors
    for l in range(p - 1, 0, -1):
        for k in range(jlo, ilast):
            c, s = G[k]
            if s == 0:
                continue
            if S[l]:
                _cols2(H[l], k, _rmat_adj(c, s), hi=k + 2)
                tol = max(ulp * (abs(H[l][k][k]) + abs(H[l][k + 1][k + 1])),
                          smlnum)
                if abs(H[l][k + 1][k]) <= tol:
                    H[l][k + 1][k] = mpc(0)
                    G[k] = (mp.one, mpc(0))
                else:
                    c, s, r = _givens(H[l][k][k], H[l][k + 1][k])
                    H[l][k][k] = r
                    H[l][k + 1][k] = mpc(0)
                    _rows2(H[l], k, _lmat(c, s), lo=k + 1)
                    G[k] = (c, s)
            else:
                _rows2(H[l], k, _lmat(c, s), lo=k)
                tol = max(ulp * (abs(H[l][k][k]) + abs(H[l][k + 1][k + 1])),
                          smlnum)
                if abs(H[l][k + 1][k]) <= tol:
                    H[l][k + 1][k] = mpc(0)
                    G[k] = (mp.one, mpc(0))
                else:
                    c, s, r = _givens(H[l][k + 1][k + 1], H[l][k + 1][k])
                    H[l][k + 1][k + 1] = r
                    H[l][k + 1][k] = mpc(0)
                    _cols2(H[l], k, _lmat(c, s), hi=k + 1)
                    G[k] = (c, -s)
        if want_z:
            for k in range(jlo, ilast):
                _cols2(Z[l], k, _rmat_adj(*G[k]))
    # stage C: final chain to the right of the Hessenberg factor
    zflag = False
    for k in range(jlo, ilast):
        _cols2(H[0], k, _rmat_adj(*G[k]), hi=k + 2)
        zflag = zflag or (G[k][1] == 0)
    return zflag


def pqz_complex_core_mp(H, S: Sequence[bool], Z=None, want_z: bool = True,
                        maxitfac: int = 30, seed: int = 1234):
    """Generic-precision single-shift periodic QZ on mp matrices.

    Scalar mirror of :func:`.pqz_complex.pqz_complex_core` (reference
    MB03BZ-style core, src/generalized.jl:166-931); ``H`` (list of p mp
    matrices, H[0] Hessenberg, H[1:] triangular) and ``Z`` are MUTATED.

    Returns (H, Z, alpha, beta, scale, ok).
    """
    p = len(H)
    n = len(H[0])
    if not S[0]:
        raise ValueError("signature entry S[0] must be True")
    ulp = mp.eps
    smlnum = mpf(2) ** (-(1 << 20))  # mp exponents are unbounded
    safmin = smlnum
    maxit = maxitfac * n
    rng = random.Random(seed)
    if want_z and Z is None:
        Z = [_eye_mp(n) for _ in range(p)]

    alpha = [mpc(0)] * n
    beta = [1] * n
    scal = [0] * n

    def split1x1(ilast):
        a, b, sc = _safeprod_signed_mp([H[l][ilast][ilast] for l in range(p)],
                                       S)
        alpha[ilast] = a
        beta[ilast] = b
        scal[ilast] = sc

    ilast = n - 1
    iiter = 0
    ziter = 0
    jiter = 0
    while ilast >= 0 and jiter < maxit:
        jiter += 1
        if ilast == 0:
            split1x1(0)
            ilast -= 1
            iiter = 0
            ziter = 0
            continue
        # ---- test 1: negligible Hessenberg subdiagonal (bottom-most) ----
        jlo = 0
        for j in range(ilast, 0, -1):
            tol = max(ulp * (abs(H[0][j - 1][j - 1]) + abs(H[0][j][j])),
                      smlnum)
            if abs(H[0][j][j - 1]) <= tol:
                H[0][j][j - 1] = mpc(0)
                jlo = j
                break
        if jlo == ilast:
            split1x1(ilast)
            ilast -= 1
            iiter = 0
            ziter = 0
            continue
        # ---- tests 2/3: negligible triangular diagonal -------------------
        ldef = jdef = -1
        for wantpos in (True, False):
            for l in range(1, p):
                if bool(S[l]) != wantpos:
                    continue
                for j in range(ilast, jlo - 1, -1):
                    if j == ilast:
                        tol = abs(H[l][j - 1][j]) if j > 0 else mpf(0)
                    elif j == jlo:
                        tol = abs(H[l][j][j + 1])
                    else:
                        tol = abs(H[l][j - 1][j]) + abs(H[l][j][j + 1])
                    tol = max(ulp * tol, smlnum)
                    if abs(H[l][j][j]) <= tol:
                        ldef, jdef = l, j
                        break
                if ldef >= 0:
                    break
            if ldef >= 0:
                break
        if ldef >= 0:
            if S[ldef]:
                _deflate_pos_mp(H, Z, S, jlo, ldef, jdef, ilast, want_z)
            else:
                _deflate_neg_mp(H, Z, S, jlo, ldef, jdef, ilast, want_z)
            continue
        # ---- controlled zero shift ---------------------------------------
        if ziter >= 7:
            zflag = _czshift_mp(H, Z, S, jlo, ilast, ulp, smlnum, want_z)
            ziter = 1 if zflag else 0
            continue
        # ---- single-shift QZ sweep ----------------------------------------
        iiter += 1
        ziter += 1
        ifirst = jlo
        c, s, _ = _givens(mpc(1), mpc(1))
        for l in range(p - 1, 0, -1):
            hf = H[l][ifirst][ifirst]
            hl_ = H[l][ilast][ilast]
            if S[l]:
                c, s, _ = _givens(hf * c, hl_ * s.conjugate())
            else:
                c, s, _ = _givens(hl_ * c, -hf * s.conjugate())
                s = -s
        h0f = H[0][ifirst][ifirst]
        h0l = H[0][ilast][ilast]
        h0sub = H[0][ifirst + 1][ifirst]
        c, s, _ = _givens(h0f * c - h0l * s.conjugate(), h0sub * c)
        if iiter % 10 == 0:
            # exceptional shift: random rotation
            c, s, _ = _givens(mpc(rng.gauss(0, 1), rng.gauss(0, 1)),
                              mpc(rng.gauss(0, 1), rng.gauss(0, 1)))
        for k in range(ifirst, ilast):
            if k > ifirst:
                c, s, r = _givens(H[0][k][k - 1], H[0][k + 1][k - 1])
                H[0][k][k - 1] = r
                H[0][k + 1][k - 1] = mpc(0)
            _rows2(H[0], k, _lmat(c, s), lo=k)
            if want_z:
                _cols2(Z[0], k, _rmat_adj(c, s))
            for l in range(p - 1, 0, -1):
                if S[l]:
                    _cols2(H[l], k, _rmat_adj(c, s), hi=k + 2)
                    c, s, r = _givens(H[l][k][k], H[l][k + 1][k])
                    H[l][k][k] = r
                    H[l][k + 1][k] = mpc(0)
                    _rows2(H[l], k, _lmat(c, s), lo=k + 1)
                else:
                    _rows2(H[l], k, _lmat(c, s), lo=k)
                    c, s, r = _givens(H[l][k + 1][k + 1], H[l][k + 1][k])
                    H[l][k + 1][k + 1] = r
                    H[l][k + 1][k] = mpc(0)
                    _cols2(H[l], k, _lmat(c, s), hi=k + 1)
                    s = -s
                if want_z:
                    _cols2(Z[l], k, _rmat_adj(c, s))
            _cols2(H[0], k, _rmat_adj(c, s), hi=min(k + 3, n))
    ok = ilast < 0

    # ---- postprocess: rescale triangular diagonals to nonnegative reals --
    for l in range(p - 1, 0, -1):
        for j in range(n):
            d = H[l][j][j]
            absd = abs(d)
            if absd > safmin:
                z = d.conjugate() / absd
                newdiag = mpc(absd)
            else:
                z = mpc(1)
                newdiag = d
            if S[l]:
                for jj in range(n):
                    H[l][j][jj] = z * H[l][j][jj]
                sf = z
            else:
                for ii in range(n):
                    H[l][ii][j] = H[l][ii][j] * z
                sf = z.conjugate()
            H[l][j][j] = newdiag
            if want_z:
                sfc = sf.conjugate()
                for ii in range(n):
                    Z[l][ii][j] = Z[l][ii][j] * sfc
            lm = l - 1
            if S[lm]:
                sfc = sf.conjugate()
                for ii in range(n):
                    H[lm][ii][j] = H[lm][ii][j] * sfc
            else:
                for jj in range(n):
                    H[lm][j][jj] = sf * H[lm][j][jj]
    return H, Z if want_z else None, alpha, beta, scal, ok


# --------------------------------------------------------------------------
# result type + driver

@dataclasses.dataclass(frozen=True)
class MpGeneralizedPeriodicSchur:
    """Generic-precision GPSD result (host object arrays of mpmath numbers).

    Same field/semantics layout as types.GeneralizedPeriodicSchur; Ts/Zs are
    numpy object arrays of shape (p, n, n), alpha mpc / beta {0,1} / scale
    int lists of length n.
    """

    S: Tuple[bool, ...]
    Ts: np.ndarray
    Zs: Optional[np.ndarray]
    alpha: list
    beta: list
    alphascale: list
    orientation: str = "R"
    schurindex: int = 0
    dps: int = 15

    @property
    def period(self) -> int:
        return int(self.Ts.shape[0])

    @property
    def values(self) -> list:
        # evaluate at the decomposition's own working precision (the
        # ambient mp.dps would silently round 40-digit eigenvalues to it)
        with mp.workdps(max(self.dps, mp.dps)):
            out = []
            for a, b, sc in zip(self.alpha, self.beta, self.alphascale):
                if b == 0:
                    # alpha = beta = 0 encodes 0/0 (indeterminate, like the
                    # f64 path's NaN), distinct from a true infinity
                    out.append(mpc(mp.nan) if a == 0 else mpc(mp.inf))
                else:
                    out.append(a * mpf(2) ** sc)
        return out


def pschur_mp(A, S: Optional[Sequence[bool]] = None, lr: str = "R",
              want_z: bool = True, maxitfac: int = 30,
              dps: Optional[int] = None, seed: int = 1234
              ) -> MpGeneralizedPeriodicSchur:
    """Arbitrary-precision periodic Schur decomposition (host, mpmath).

    The generic-eltype analogue of ``pschur`` (reference BigFloat path):
    ``dps`` sets the working precision in decimal digits (default: the
    ambient ``mpmath.mp.dps``).  Real input is decomposed in complex
    arithmetic.  Returns an :class:`MpGeneralizedPeriodicSchur`; for the
    all-positive signature ``beta`` is identically 1 and ``values`` are the
    product eigenvalues.

    Reference: src/generalized.jl:87-148 (driver), :1085-1179 (generic
    reduction), :166-931 (eltype-generic core).
    """
    if not HAVE_MPMATH:  # pragma: no cover
        raise RuntimeError("mpmath is required for the generic-precision "
                           "path but is not importable")
    A = np.asarray(A)
    p = A.shape[0]
    if isinstance(S, str):
        # guard the pschur(A, lr, S=...) muscle-memory call shape:
        # a string in the S slot is an orientation
        S, lr = None, S
    if S is not None and len(S) != p:
        raise ValueError(f"signature length {len(S)} != cycle length {p}")
    S = (True,) * p if S is None else tuple(bool(x) for x in S)
    lr = str(lr).lstrip(":").upper()
    if lr not in ("R", "L"):
        raise ValueError("orientation must be 'R' or 'L'")
    if lr == "L":
        A = A[::-1]
        S = tuple(reversed(S))
    if not S[0]:
        raise ValueError("the leftmost signature entry must be +1 (True); "
                         "rotate the cycle so a direct factor leads")

    with mp.workdps(dps if dps is not None else mp.dps):
        Hm = _to_mp(A)
        Hm, Qm = phessenberg_mp(Hm, S, want_q=want_z)
        Hm, Zm, alpha, beta, scal, ok = pqz_complex_core_mp(
            Hm, S, Z=Qm, want_z=want_z, maxitfac=maxitfac, seed=seed)
    if not ok:
        from ..types import ConvergenceFailure
        raise ConvergenceFailure(-1)

    def _obj(M):
        if M is None:
            return None
        return np.array([[[M[l][i][j] for j in range(len(M[0]))]
                          for i in range(len(M[0]))] for l in range(p)],
                        dtype=object)

    used_dps = dps if dps is not None else mp.dps
    P = MpGeneralizedPeriodicSchur(
        S=S, Ts=_obj(Hm), Zs=_obj(Zm), alpha=alpha, beta=beta,
        alphascale=scal, orientation="R", schurindex=0, dps=used_dps)
    if lr == "L":
        # same re-labeling as utils/circshift.rev_alias (reference
        # src/utils.jl:49-85): Z'[0] = Z[0]; Z'[l] = Z[p-l]
        Zs = P.Zs
        if Zs is not None:
            Zs = np.roll(Zs[::-1], 1, axis=0)
        P = MpGeneralizedPeriodicSchur(
            S=tuple(reversed(P.S)), Ts=P.Ts[::-1], Zs=Zs, alpha=P.alpha,
            beta=P.beta, alphascale=P.alphascale, orientation="L",
            schurindex=p - 1, dps=used_dps)
    return P
