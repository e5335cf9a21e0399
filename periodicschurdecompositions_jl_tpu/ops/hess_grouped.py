"""Grouped-chain stage 2 of the ds split-complex signed reduction.

``phessenberg_signed_core_cxff`` (ops/pqz_complex_ff.py; reference
src/generalized.jl:1034-1079, Kressner's Givens Hessenberg stage) executes
one Givens rotation at a time: per (column, factor) it dispatches ~n
sequential slab updates, which makes the reduction DOMINATE the complex
pipeline on-chip (measured 15.45 s of the 16.59 s p=6 n=128 record —
BASELINE.md).  This module re-expresses the same stage with the work
split by role:

1. GENERATION stays sequential but touches only O(1)-per-step state:
   left-multiplications commute with right-multiplications, so the
   interleaved algorithm's rotation PARAMETERS depend on a narrow band
   whose evolution reduces to first-order recurrences:
   - factor-0 chain: rotation i = givens(col_j[i-1], r_{i+1}) — a scalar
     scan over the untouched column j;
   - S=+1 factors: the consumed superdiagonal value follows
     W <- c_in*col + conj(s_in)*W (the KNOWN incoming chain), and the
     fill is conj(s_in)*r_prev — a scalar givens scan with one vector
     affine carry;
   - S=-1 factors: the consumed column values follow
     V <- c_out*col - conj(s_out)*V' with the chain's OWN outgoing
     coefficients — same scan shape.
   The scan arithmetic mirrors cxff.cmatmul term order exactly, so the
   generated rotations are BITWISE identical to the interleaved code's.

2. APPLICATION becomes grouped: G adjacent rotations compose into one
   (G+1)x(G+1) unitary per group (same-slot batched across groups), and
   each chain applies as ceil((n-1)/G) static-slice ds slab products
   instead of n-1 masked 2-row/2-col updates.  Exact zeros outside the
   triangular/Hessenberg pattern are re-imposed by masks — the same
   backward-stable O(eps)-perturbation the interleaved setel writes make.

The composed-left product P = L_{imin}...L_{imax} serves both sides:
right-applied chains (rmat_adj = lmat^H) use P^H groupwise.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import ff
from .ff import FF
from . import cxff
from .cxff import CXF, givens_cxff


def _cx(re: FF, im: FF) -> CXF:
    return CXF(re, im)


def _t_mul(x: CXF, m: CXF) -> CXF:
    """x*m in cmatmul_rows/cols term order (bitwise scan parity)."""
    return CXF(ff.sub(ff.mul(x.re, m.re), ff.mul(x.im, m.im)),
               ff.add(ff.mul(x.re, m.im), ff.mul(x.im, m.re)))


def _t_mul_c0(x: CXF, c: FF) -> CXF:
    """x*(c + 0i) mirroring the term formula (the 0-products are exact)."""
    z = ff.zeros(c.hi.shape)
    return _t_mul(x, CXF(c, z))


def _bcast(s: CXF, shape) -> CXF:
    def b(x: FF) -> FF:
        return FF(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))
    return CXF(b(s.re), b(s.im))


def _conj(s: CXF) -> CXF:
    return CXF(s.re, ff.neg(s.im))


def _diag(M: CXF) -> CXF:
    def d(x):
        return jnp.diagonal(x, axis1=-2, axis2=-1)
    return CXF(FF(d(M.re.hi), d(M.re.lo)), FF(d(M.im.hi), d(M.im.lo)))


def _col(M: CXF, k) -> CXF:
    """Column k of an (n, n) CXF (k traced)."""
    n = M.re.hi.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n - 1)

    def g(x):
        return lax.dynamic_slice(x, (jnp.int32(0), k), (n, 1))[:, 0]

    return CXF(FF(g(M.re.hi), g(M.re.lo)), FF(g(M.im.hi), g(M.im.lo)))


# ---------------------------------------------------------------------------
# generation scans (descending i = n-1 .. 1; rotation i acts on rows/cols
# (i-1, i); active iff i >= lo)


def _scan_a(colj: CXF, lo):
    """Factor-0 chain: givens(colj[i-1], r_{i+1}) with r_n = colj[n-1].

    Mirrors pqz_complex_ff's a_step (f = A0[i-1,j] untouched, g = the r
    the previous step wrote via setel).  Returns (Gc, Gs, r_fin).
    """
    n = colj.shape[0]
    Gc0 = ff.ff(jnp.ones((n,), jnp.float32))
    Gs0 = cxff.zeros((n,))
    r0 = cxff.vget(colj, n - 1)

    def body(t, carry):
        Gc, Gs, r_prev = carry
        i = n - 1 - t
        act = i >= lo
        f = cxff.vget(colj, i - 1)
        c, s, r = givens_cxff(f, r_prev)
        Gc = cxff.fvset(Gc, i, c, act)
        Gs = cxff.vset(Gs, i, s, act)
        r_prev = cxff.where(act, r, r_prev)
        return Gc, Gs, r_prev

    return lax.fori_loop(0, n, body, (Gc0, Gs0, r0))


def _scan_bpos(Al: CXF, Gc_in: FF, Gs_in: CXF, lo):
    """S=+1 factor chain (incoming column chain rmat_adj(Gc_in, Gs_in)).

    f_i = c_in*d[i-1] + conj(s_in)*W[i-1] where W carries the evolving
    next-column values, g_i = conj(s_in)*r_prev.  Bitwise-equal rotations
    to the interleaved b_pos (cmatmul-order mirrored).
    """
    n = Al.re.hi.shape[0]
    d = _diag(Al)
    Gc0 = ff.ff(jnp.ones((n,), jnp.float32))
    Gs0 = cxff.zeros((n,))
    W0 = _col(Al, n - 1)
    r0 = cxff.vget(d, n - 1)

    def body(t, carry):
        Gc, Gs, W, r_prev = carry
        i = n - 1 - t
        act = i >= lo
        cin = cxff.fvget(Gc_in, i)
        sin = cxff.vget(Gs_in, i)
        sconj = _conj(sin)
        w = cxff.vget(W, i - 1)
        f = cxff.add(_t_mul_c0(cxff.vget(d, i - 1), cin), _t_mul(w, sconj))
        g = _t_mul(r_prev, sconj)
        c, s, r = givens_cxff(f, g)
        Gc = cxff.fvset(Gc, i, c, act)
        Gs = cxff.vset(Gs, i, s, act)
        r_prev = cxff.where(act, r, r_prev)
        # W <- c_in*Al[:, i-1] + conj(s_in)*W   (next step's column)
        Wn = cxff.add(_t_mul_c0(_col(Al, i - 1), cin), _t_mul(W, sconj))
        W = cxff.where(act, Wn, W)
        return Gc, Gs, W, r_prev

    Gc, Gs, _, _ = lax.fori_loop(0, n, body, (Gc0, Gs0, W0, r0))
    return Gc, Gs


def _scan_bneg(Al: CXF, Gc_in: FF, Gs_in: CXF, lo):
    """S=-1 factor chain (incoming row chain lmat(Gc_in, Gs_in)).

    f_i = -conj(s_in)*V[i-1] + c_in*D; g_i = -conj(s_in)*d[i-1]; the
    carries V (column values after this chain's own outgoing column ops)
    and D (the diagonal value) follow the interleaved evolution exactly.
    The emitted log stores (c, -s) as the interleaved b_neg does.
    """
    n = Al.re.hi.shape[0]
    d = _diag(Al)
    Gc0 = ff.ff(jnp.ones((n,), jnp.float32))
    Gs0 = cxff.zeros((n,))
    V0 = _col(Al, n - 1)
    D0 = cxff.vget(d, n - 1)

    def body(t, carry):
        Gc, Gs, V, D = carry
        i = n - 1 - t
        act = i >= lo
        cin = cxff.fvget(Gc_in, i)
        sin = cxff.vget(Gs_in, i)
        nsconj = cxff.neg(_conj(sin))  # lmat M[1,0]
        dval = cxff.vget(d, i - 1)
        vval = cxff.vget(V, i - 1)
        f = cxff.add(_t_mul(vval, nsconj), _t_mul_c0(D, cin))
        g = _t_mul(dval, nsconj)
        c, s, r = givens_cxff(f, g)
        del r
        Gc = cxff.fvset(Gc, i, c, act)
        Gs = cxff.vset(Gs, i, cxff.neg(s), act)
        # carries (interleaved evolution):
        # X = Al[i-1, i] after the incoming row op
        X = cxff.add(_t_mul_c0(vval, cin), _t_mul(D, sin))
        nsoconj = cxff.neg(_conj(s))  # outgoing col op second term
        Dn = cxff.add(_t_mul_c0(_t_mul_c0(dval, cin), c), _t_mul(X, nsoconj))
        Vp = cxff.vset(V, i - 1, X, act)
        Vn = cxff.add(_t_mul_c0(_col(Al, i - 1), c), _t_mul(Vp, nsoconj))
        V = cxff.where(act, Vn, V)
        D = cxff.where(act, Dn, D)
        return Gc, Gs, V, D

    Gc, Gs, _, _ = lax.fori_loop(0, n, body, (Gc0, Gs0, V0, D0))
    return Gc, Gs


# ---------------------------------------------------------------------------
# grouped composition and application


def _group_layout(n: int, G: int):
    """Static (bases, idx, valid): group g covers rows [base, base+G];
    slot m (m = 0..G-1) holds rotation i = base + G - m, valid when that
    i is in (base, n-1-g*G]."""
    ngroups = max(1, -(-(n - 1) // G))
    bases, idx, valid = [], [], []
    for g in range(ngroups):
        base = max(0, (n - 1) - (g + 1) * G)
        hi = (n - 1) - g * G
        bases.append(base)
        row_idx, row_valid = [], []
        for m in range(G):
            i = base + G - m
            ok = (base + 1 <= i <= hi) and (i <= n - 1)
            row_idx.append(min(i, n - 1))
            row_valid.append(ok)
        idx.append(row_idx)
        valid.append(row_valid)
    return bases, np.asarray(idx, np.int32), np.asarray(valid, bool)


def _gather_slots(Gc: FF, Gs: CXF, idx, valid):
    """(ngroups, G) rotation params with invalid slots forced identity."""
    c = FF(jnp.where(valid, Gc.hi[idx], 1.0),
           jnp.where(valid, Gc.lo[idx], 0.0))

    def m(x):
        return jnp.where(valid, x[idx], 0.0)

    s = CXF(FF(m(Gs.re.hi), m(Gs.re.lo)), FF(m(Gs.im.hi), m(Gs.im.lo)))
    return c, s


def _compose_left(Gc: FF, Gs: CXF, n: int, G: int):
    """Composed P_g = L_{imin} ... L_{imax} per group, L_i = lmat(c, s)
    acting on local rows (i-base-1, i-base).  Returns (P, bases)."""
    bases, idx, valid = _group_layout(n, G)
    ng = len(bases)
    c, s = _gather_slots(Gc, Gs, idx, valid)
    K = G + 1
    eye = jnp.broadcast_to(jnp.eye(K, dtype=jnp.float32), (ng, K, K))
    P = CXF(FF(eye, jnp.zeros_like(eye)),
            FF(jnp.zeros((ng, K, K), jnp.float32),
               jnp.zeros((ng, K, K), jnp.float32)))

    def rows2(P: CXF, a: int) -> CXF:
        return CXF(FF(P.re.hi[:, a:a + 2, :], P.re.lo[:, a:a + 2, :]),
                   FF(P.im.hi[:, a:a + 2, :], P.im.lo[:, a:a + 2, :]))

    def set_rows2(P: CXF, a: int, Y: CXF) -> CXF:
        def u(x, y):
            return x.at[:, a:a + 2, :].set(y)
        return CXF(FF(u(P.re.hi, Y.re.hi), u(P.re.lo, Y.re.lo)),
                   FF(u(P.im.hi, Y.im.hi), u(P.im.lo, Y.im.lo)))

    for m in range(G):
        ell = G - m  # descending local rotation position
        cm = FF(c.hi[:, m, None, None], c.lo[:, m, None, None])
        sm = CXF(FF(s.re.hi[:, m, None, None], s.re.lo[:, m, None, None]),
                 FF(s.im.hi[:, m, None, None], s.im.lo[:, m, None, None]))
        X = rows2(P, ell - 1)
        top = CXF(FF(X.re.hi[:, :1], X.re.lo[:, :1]),
                  FF(X.im.hi[:, :1], X.im.lo[:, :1]))
        bot = CXF(FF(X.re.hi[:, 1:], X.re.lo[:, 1:]),
                  FF(X.im.hi[:, 1:], X.im.lo[:, 1:]))
        # lmat: new_top = c*top + s*bot ; new_bot = -conj(s)*top + c*bot
        ntop = cxff.add(_t_mul_c0(top, cm), _t_mul(bot, sm))
        nbot = cxff.add(_t_mul(top, cxff.neg(_conj(sm))), _t_mul_c0(bot, cm))
        Y = CXF(FF(jnp.concatenate([ntop.re.hi, nbot.re.hi], 1),
                   jnp.concatenate([ntop.re.lo, nbot.re.lo], 1)),
                FF(jnp.concatenate([ntop.im.hi, nbot.im.hi], 1),
                   jnp.concatenate([ntop.im.lo, nbot.im.lo], 1)))
        P = set_rows2(P, ell - 1, Y)
    return P, bases


def _pgroup(P: CXF, g: int) -> CXF:
    return CXF(FF(P.re.hi[g], P.re.lo[g]), FF(P.im.hi[g], P.im.lo[g]))


def _ctransp(P: CXF) -> CXF:
    def t(x):
        return jnp.swapaxes(x, -2, -1)
    return CXF(FF(t(P.re.hi), t(P.re.lo)),
               FF(-t(P.im.hi), -t(P.im.lo)))


def _mm_left(P: CXF, X: CXF) -> CXF:
    """(K,K) @ (K,n) ds complex product (broadcast mul + tree sums)."""
    Pr = FF(P.re.hi[:, :, None], P.re.lo[:, :, None])
    Pi = FF(P.im.hi[:, :, None], P.im.lo[:, :, None])
    Xr = FF(X.re.hi[None, :, :], X.re.lo[None, :, :])
    Xi = FF(X.im.hi[None, :, :], X.im.lo[None, :, :])
    re = ff.sum_(ff.sub(ff.mul(Pr, Xr), ff.mul(Pi, Xi)), 1)
    im = ff.sum_(ff.add(ff.mul(Pr, Xi), ff.mul(Pi, Xr)), 1)
    return CXF(re, im)


def _mm_right(X: CXF, P: CXF) -> CXF:
    """(m,K) @ (K,K) ds complex product."""
    Xr = FF(X.re.hi[:, :, None], X.re.lo[:, :, None])
    Xi = FF(X.im.hi[:, :, None], X.im.lo[:, :, None])
    Pr = FF(P.re.hi[None, :, :], P.re.lo[None, :, :])
    Pi = FF(P.im.hi[None, :, :], P.im.lo[None, :, :])
    re = ff.sum_(ff.sub(ff.mul(Xr, Pr), ff.mul(Xi, Pi)), 1)
    im = ff.sum_(ff.add(ff.mul(Xr, Pi), ff.mul(Xi, Pr)), 1)
    return CXF(re, im)


def apply_left_grouped(M: CXF, P: CXF, bases) -> CXF:
    """M <- chain @ M via per-group P_g @ M[base:base+K, :] (descending
    groups first: group 0 holds the highest rotation indices)."""
    K = P.re.hi.shape[-1]
    for g in range(len(bases)):
        b = bases[g]
        X = CXF(FF(M.re.hi[b:b + K, :], M.re.lo[b:b + K, :]),
                FF(M.im.hi[b:b + K, :], M.im.lo[b:b + K, :]))
        Y = _mm_left(_pgroup(P, g), X)

        def u(x, y):
            return x.at[b:b + K, :].set(y)

        M = CXF(FF(u(M.re.hi, Y.re.hi), u(M.re.lo, Y.re.lo)),
                FF(u(M.im.hi, Y.im.hi), u(M.im.lo, Y.im.lo)))
    return M


def apply_right_grouped_H(M: CXF, P: CXF, bases) -> CXF:
    """M <- M @ chain^... applies the rmat_adj chain of the SAME log:
    total right multiplier = (L_{imin}...L_{imax})^H = P^H, groupwise
    M[:, base:base+K] @ P_g^H (descending groups first)."""
    K = P.re.hi.shape[-1]
    for g in range(len(bases)):
        b = bases[g]
        X = CXF(FF(M.re.hi[:, b:b + K], M.re.lo[:, b:b + K]),
                FF(M.im.hi[:, b:b + K], M.im.lo[:, b:b + K]))
        Y = _mm_right(X, _ctransp(_pgroup(P, g)))

        def u(x, y):
            return x.at[:, b:b + K].set(y)

        M = CXF(FF(u(M.re.hi, Y.re.hi), u(M.re.lo, Y.re.lo)),
                FF(u(M.im.hi, Y.im.hi), u(M.im.lo, Y.im.lo)))
    return M


def _triu_mask(M: CXF) -> CXF:
    def t(x):
        return jnp.triu(x)
    return CXF(FF(t(M.re.hi), t(M.re.lo)), FF(t(M.im.hi), t(M.im.lo)))


# ---------------------------------------------------------------------------
# grouped stage 2


def stage2_grouped(A: CXF, Q, S_arr, want_q: bool, G: int = 16,
                   j0=None, j1=None):
    """Givens Hessenberg reduction of factor 0 with per-factor
    re-triangularization; grouped-application rewrite of
    pqz_complex_ff.phessenberg_signed_core_cxff stage 2 (reference
    src/generalized.jl:1034-1079).  A: (p, n, n) CXF with A[0] full and
    A[1:] upper triangular; Q accumulated like the interleaved path.

    ``j0``/``j1`` (traced int32, default the full 0..n-2 range) bound the
    column loop — the chunk-resume hook of the host-chunked signed
    reduction (each device execute must stay under the axon ~60 s kill).
    """
    p, n, _ = A.re.hi.shape
    G = max(1, min(G, n - 1))

    def col_step(j, carry):
        A, Q = carry
        lo = j + 2
        A0 = cxff.fac_get(A, 0)
        Gc, Gs, r_fin = _scan_a(_col(A0, j), lo)
        P, bases = _compose_left(Gc, Gs, n, G)
        A0 = apply_left_grouped(A0, P, bases)
        # exact column-j pattern from the scan (what setel wrote)
        rows = lax.iota(jnp.int32, n)
        below = rows >= lo
        at_sub = rows == (j + 1)
        colj = _col(A0, j)
        colj = cxff.where(below, cxff.zeros((n,)), colj)
        colj = cxff.where(at_sub, _bcast(r_fin, (n,)), colj)
        A0 = cxff.setcol_cxff(A0, 0, j, colj)
        A = cxff.fac_set(A, 0, A0)
        if want_q:
            Q = cxff.fac_set(Q, 0, apply_right_grouped_H(
                cxff.fac_get(Q, 0), P, bases))

        def factor_step(t0, carry):
            A, Q, Gc, Gs, P = carry
            l = jnp.int32(p - 1) - t0
            Al = cxff.fac_get(A, l)
            is_pos = S_arr[jnp.clip(l, 0, p - 1)]
            Gco, Gso = lax.cond(
                is_pos,
                lambda a: _scan_bpos(a[0], a[1], a[2], lo),
                lambda a: _scan_bneg(a[0], a[1], a[2], lo),
                (Al, Gc, Gs))
            Po, bases2 = _compose_left(Gco, Gso, n, G)
            # S=+1: incoming cols (rmat_adj(in) = P_in^H), outgoing rows
            # (lmat(out)); S=-1: incoming rows, outgoing cols.
            PL = cxff.where(is_pos, Po, P)
            PR = cxff.where(is_pos, P, Po)
            Al = apply_left_grouped(Al, PL, bases2)
            Al = apply_right_grouped_H(Al, PR, bases2)
            Al = _triu_mask(Al)
            A = cxff.fac_set(A, l, Al)
            if want_q:
                Q = cxff.fac_set(Q, l, apply_right_grouped_H(
                    cxff.fac_get(Q, l), Po, bases2))
            return A, Q, Gco, Gso, Po

        if p > 1:
            A, Q, Gc, Gs, P = lax.fori_loop(
                0, p - 1, factor_step, (A, Q, Gc, Gs, P))

        A0 = apply_right_grouped_H(cxff.fac_get(A, 0), P, bases)
        A = cxff.fac_set(A, 0, A0)
        return A, Q

    if n > 2:
        lo_b = jnp.int32(0) if j0 is None else jnp.asarray(j0, jnp.int32)
        hi_b = jnp.int32(n - 2) if j1 is None else jnp.asarray(j1,
                                                               jnp.int32)
        A, Q = lax.fori_loop(lo_b, hi_b, col_step, (A, Q))
    return A, Q
