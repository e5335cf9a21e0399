"""Complex float-float arithmetic: complex arrays as (re, im) ds pairs.

The contract-grade TPU representation for the complex periodic QZ stack:
each complex value is ``CXF(re, im)`` where ``re``/``im`` are float-float
``ff.FF`` (hi, lo f32) pairs — four f32 arrays total.  Exact error-free
transformations give ~2^-48 unit roundoff at f32 hardware speed, which is
what lets the complex/generalized cores meet the <=1e-12 backward-error
contract ON the axon chip (the split emulated-f64 representation of
ops/cxkern.py bottoms out at the x64-rewriter's weak-add floor).

Mirrors ops/cxkern.py's API (givens_cx, lmat/rmat builders, masked slab
updates, reflectors) so the split cores port mechanically; mirrors
ops/ffkern.py's generation-input prescaling (ds arithmetic silently
degrades once magnitudes reach the f32-subnormal range).

Reference parity: the same numerical contracts as the complex element ops
the reference uses through Julia's LinearAlgebra (givensAlgorithm /
zlartg, reflector semantics of /root/reference/src/householder.jl:110-156).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ff
from .ff import FF
from .ffkern import _prescale


class CXF(NamedTuple):
    """Unevaluated complex value re + i*im as two FF (hi, lo) pairs."""

    re: FF
    im: FF

    @property
    def shape(self):
        return self.re.hi.shape


# ---------------------------------------------------------------------------
# construction / conversion


def cxf(re, im=None) -> CXF:
    re = re if isinstance(re, FF) else ff.ff(jnp.asarray(re, jnp.float32))
    if im is None:
        im = ff.zeros(re.hi.shape)
    elif not isinstance(im, FF):
        im = ff.ff(jnp.asarray(im, jnp.float32))
    return CXF(re, im)


def zeros(shape) -> CXF:
    return CXF(ff.zeros(shape), ff.zeros(shape))


def from_f64_split(re64, im64) -> CXF:
    """Exact split of (re, im) float64 arrays into ds pairs."""
    return CXF(ff.from_f64(jnp.asarray(re64)), ff.from_f64(jnp.asarray(im64)))


def to_f64_split(x: CXF):
    """(re, im) float64 arrays (emulated on TPU; exact on CPU)."""
    f64 = jnp.float64
    return (x.re.hi.astype(f64) + x.re.lo.astype(f64),
            x.im.hi.astype(f64) + x.im.lo.astype(f64))


# ---------------------------------------------------------------------------
# arithmetic


def add(a: CXF, b: CXF) -> CXF:
    return CXF(ff.add(a.re, b.re), ff.add(a.im, b.im))


def sub(a: CXF, b: CXF) -> CXF:
    return CXF(ff.sub(a.re, b.re), ff.sub(a.im, b.im))


def neg(a: CXF) -> CXF:
    return CXF(ff.neg(a.re), ff.neg(a.im))


def conj(a: CXF) -> CXF:
    return CXF(a.re, ff.neg(a.im))


def mul(a: CXF, b: CXF) -> CXF:
    return CXF(ff.sub(ff.mul(a.re, b.re), ff.mul(a.im, b.im)),
               ff.add(ff.mul(a.re, b.im), ff.mul(a.im, b.re)))


def mul_ff(a: CXF, r: FF) -> CXF:
    """a * r with r real (FF)."""
    return CXF(ff.mul(a.re, r), ff.mul(a.im, r))


def is0(a: CXF):
    return ff.eq0(a.re) & ff.eq0(a.im)


def cabs(a: CXF) -> FF:
    """Robust |a| in ds (max-scaled hypot, subnormal-range prescaled)."""
    return ff.hypot2(a.re, a.im)


def abs1(a: CXF) -> FF:
    """|re| + |im| (the cheap 1-norm magnitude the tolerances use)."""
    return ff.add(ff.abs_(a.re), ff.abs_(a.im))


def where(m, a: CXF, b: CXF) -> CXF:
    return CXF(ff.where(m, a.re, b.re), ff.where(m, a.im, b.im))


def div(a: CXF, b: CXF) -> CXF:
    """a / b (Smith-free: b prescaled by power of two; caller guards b=0)."""
    s_, _ = _prescale(jnp.maximum(jnp.abs(b.re.hi), jnp.abs(b.im.hi)))
    br = FF(b.re.hi * s_, b.re.lo * s_)
    bi = FF(b.im.hi * s_, b.im.lo * s_)
    d = ff.add(ff.sq(br), ff.sq(bi))
    ds_ = ff.where(ff.eq0(d), ff.full_like(d, 1.0), d)
    ar = FF(a.re.hi * s_, a.re.lo * s_)
    ai = FF(a.im.hi * s_, a.im.lo * s_)
    num_re = ff.add(ff.mul(ar, br), ff.mul(ai, bi))
    num_im = ff.sub(ff.mul(ai, br), ff.mul(ar, bi))
    return CXF(ff.div(num_re, ds_), ff.div(num_im, ds_))


# ---------------------------------------------------------------------------
# Givens generation (zlartg semantics; ds mirror of cxkern.givens_cx)


def givens_cxff(f: CXF, g: CXF):
    """(c: FF real >= 0, s: CXF, r: CXF), [c s; -conj(s) c] @ [f, g] = [r, 0].

    g == 0 -> (1, 0, f) exactly; f == 0 -> (0, conj(g)/|g|, |g|).
    Generation inputs are prescaled by an exact power of two when tiny
    (ffkern._prescale): c/s are scale-invariant, r is unscaled on return.
    """
    mx = jnp.maximum(jnp.maximum(jnp.abs(f.re.hi), jnp.abs(f.im.hi)),
                     jnp.maximum(jnp.abs(g.re.hi), jnp.abs(g.im.hi)))
    s_, inv_ = _prescale(mx)
    f = CXF(FF(f.re.hi * s_, f.re.lo * s_), FF(f.im.hi * s_, f.im.lo * s_))
    g = CXF(FF(g.re.hi * s_, g.re.lo * s_), FF(g.im.hi * s_, g.im.lo * s_))

    one = ff.ff(jnp.float32(1.0))
    zero = ff.zeros(())
    scale = ff.maximum(ff.maximum(ff.abs_(f.re), ff.abs_(f.im)),
                       ff.maximum(ff.abs_(g.re), ff.abs_(g.im)))
    sc = ff.where(ff.eq0(scale), one, scale)
    # shared-denominator divides become one fast reciprocal + muls each:
    # zlartg IS the sequential generation chain of the split-complex QZ
    # sweep, where div's two extra dependent divides are pure latency
    scinv = ff.recip(sc)
    fsr = ff.mul(f.re, scinv)
    fsi = ff.mul(f.im, scinv)
    gsr = ff.mul(g.re, scinv)
    gsi = ff.mul(g.im, scinv)
    f2 = ff.add(ff.sq(fsr), ff.sq(fsi))
    g2 = ff.add(ff.sq(gsr), ff.sq(gsi))
    d2 = ff.add(f2, g2)
    af = ff.sqrt(f2)
    d = ff.sqrt(d2)
    dsafe = ff.where(ff.eq0(d), one, d)
    afsafe = ff.where(ff.eq0(af), one, af)
    dinv = ff.recip(dsafe)
    afinv = ff.recip(afsafe)
    c_gen = ff.mul(af, dinv)
    fsign = CXF(ff.mul(fsr, afinv), ff.mul(fsi, afinv))
    dsc = ff.mul(d, sc)
    r_gen = CXF(ff.mul(fsign.re, dsc), ff.mul(fsign.im, dsc))
    sg_num = mul(fsign, CXF(gsr, ff.neg(gsi)))
    s_gen = CXF(ff.mul(sg_num.re, dinv), ff.mul(sg_num.im, dinv))

    # orthogonality renorm (see ffkern.givens_ff): one Newton step of
    # 1/sqrt about h = c^2 + |s|^2 drops the rotation's unitarity defect
    # to ~1 ulp
    h = ff.add(ff.sq(c_gen), ff.add(ff.sq(s_gen.re), ff.sq(s_gen.im)))
    corr = ff.mul_pow2(ff.sub(ff.ff(jnp.float32(3.0)), h),
                       jnp.float32(0.5))
    c_gen = ff.mul(c_gen, corr)
    s_gen = CXF(ff.mul(s_gen.re, corr), ff.mul(s_gen.im, corr))

    ag = ff.sqrt(g2)
    agsafe = ff.where(ff.eq0(ag), one, ag)
    s_f0 = CXF(ff.div(gsr, agsafe), ff.neg(ff.div(gsi, agsafe)))
    r_f0 = CXF(ff.mul(ag, sc), zero)

    g_is0 = is0(g)
    f_is0 = is0(f)
    c = ff.where(g_is0, one, ff.where(f_is0, zero, c_gen))
    s = where(g_is0, zeros(s_gen.shape), where(f_is0, s_f0, s_gen))
    r = where(g_is0, f, where(f_is0, r_f0, r_gen))
    r = CXF(FF(r.re.hi * inv_, r.re.lo * inv_),
            FF(r.im.hi * inv_, r.im.lo * inv_))
    return c, s, r


# ---------------------------------------------------------------------------
# 2x2 builders (c: FF real, s: CXF) -> (2, 2) CXF


def _m2_ff(a: FF, b: FF, c: FF, d: FF) -> FF:
    return FF(jnp.stack([jnp.stack([a.hi, b.hi]), jnp.stack([c.hi, d.hi])]),
              jnp.stack([jnp.stack([a.lo, b.lo]), jnp.stack([c.lo, d.lo])]))


def lmat_cxff(c: FF, s: CXF) -> CXF:
    """Row-pair left action [[c, s], [-conj(s), c]] (c real)."""
    z = ff.zeros(())
    return CXF(_m2_ff(c, s.re, ff.neg(s.re), c),
               _m2_ff(z, s.im, s.im, z))


def rmat_adj_cxff(c: FF, s: CXF) -> CXF:
    """Column-pair right action of G': [[c, -s], [conj(s), c]]."""
    z = ff.zeros(())
    return CXF(_m2_ff(c, ff.neg(s.re), s.re, c),
               _m2_ff(z, ff.neg(s.im), ff.neg(s.im), z))


def _el(M: FF, r, c) -> FF:
    return FF(M.hi[r, c], M.lo[r, c])


def cmatmul_rows(M: CXF, rows: CXF) -> CXF:
    """(k,k) CXF @ (k, ...) CXF, unrolled compensated ds dots."""
    k = M.re.hi.shape[0]

    def row(r):
        def term(s):
            mr, mi = _el(M.re, r, s), _el(M.im, r, s)
            xr = FF(rows.re.hi[s], rows.re.lo[s])
            xi = FF(rows.im.hi[s], rows.im.lo[s])
            return (ff.sub(ff.mul(mr, xr), ff.mul(mi, xi)),
                    ff.add(ff.mul(mr, xi), ff.mul(mi, xr)))

        are, aim = term(0)
        for s in range(1, k):
            tre, tim = term(s)
            are = ff.add(are, tre)
            aim = ff.add(aim, tim)
        return are, aim

    outs = [row(r) for r in range(k)]
    return CXF(ff.stack([o[0] for o in outs], 0),
               ff.stack([o[1] for o in outs], 0))


def cmatmul_cols(cols: CXF, M: CXF) -> CXF:
    """(..., k) CXF @ (k,k) CXF — column-slab right multiply."""
    k = M.re.hi.shape[0]

    def col(c):
        def term(s):
            mr, mi = _el(M.re, s, c), _el(M.im, s, c)
            xr = FF(cols.re.hi[..., s], cols.re.lo[..., s])
            xi = FF(cols.im.hi[..., s], cols.im.lo[..., s])
            return (ff.sub(ff.mul(xr, mr), ff.mul(xi, mi)),
                    ff.add(ff.mul(xr, mi), ff.mul(xi, mr)))

        are, aim = term(0)
        for s in range(1, k):
            tre, tim = term(s)
            are = ff.add(are, tre)
            aim = ff.add(aim, tim)
        return are, aim

    outs = [col(c) for c in range(k)]
    return CXF(ff.stack([o[0] for o in outs], -1),
               ff.stack([o[1] for o in outs], -1))


# ---------------------------------------------------------------------------
# masked slab updates (ds mirror of cxkern's rowsk_cx/colsk_cx/...)


def _ds4(H: CXF, start, sizes) -> CXF:
    return CXF(FF(lax.dynamic_slice(H.re.hi, start, sizes),
                  lax.dynamic_slice(H.re.lo, start, sizes)),
               FF(lax.dynamic_slice(H.im.hi, start, sizes),
                  lax.dynamic_slice(H.im.lo, start, sizes)))


def _dus4(H: CXF, vals: CXF, start) -> CXF:
    return CXF(FF(lax.dynamic_update_slice(H.re.hi, vals.re.hi, start),
                  lax.dynamic_update_slice(H.re.lo, vals.re.lo, start)),
               FF(lax.dynamic_update_slice(H.im.hi, vals.im.hi, start),
                  lax.dynamic_update_slice(H.im.lo, vals.im.lo, start)))


def rowsk_cxff(H: CXF, i, M: CXF, lo=None, hi=None, active=None) -> CXF:
    """H[i:i+k, lo:hi] = M @ H[i:i+k, lo:hi]; i/lo/hi traced."""
    k = M.re.hi.shape[0]
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - k)
    rows = _ds4(H, (i, jnp.int32(0)), (k, n))
    new = cmatmul_rows(M, rows)
    if lo is not None or hi is not None:
        col = lax.iota(jnp.int32, n)
        mask = jnp.ones((n,), bool)
        if lo is not None:
            mask &= col >= lo
        if hi is not None:
            mask &= col < hi
        new = where(mask[None, :], new, rows)
    if active is not None:
        new = where(active, new, rows)
    return _dus4(H, new, (i, jnp.int32(0)))


def colsk_cxff(H: CXF, j, M: CXF, lo=None, hi=None, active=None) -> CXF:
    """H[lo:hi, j:j+k] = H[lo:hi, j:j+k] @ M."""
    k = M.re.hi.shape[0]
    m, n = H.re.hi.shape
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - k)
    cols = _ds4(H, (jnp.int32(0), j), (m, k))
    new = cmatmul_cols(cols, M)
    if lo is not None or hi is not None:
        row = lax.iota(jnp.int32, m)
        mask = jnp.ones((m,), bool)
        if lo is not None:
            mask &= row >= lo
        if hi is not None:
            mask &= row < hi
        new = where(mask[:, None], new, cols)
    if active is not None:
        new = where(active, new, cols)
    return _dus4(H, new, (jnp.int32(0), j))


def getel_cxff(H: CXF, i, j) -> CXF:
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    v = _ds4(H, (i, j), (1, 1))
    return CXF(FF(v.re.hi[0, 0], v.re.lo[0, 0]),
               FF(v.im.hi[0, 0], v.im.lo[0, 0]))


def setel_cxff(H: CXF, i, j, val: CXF, active=None) -> CXF:
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    old = _ds4(H, (i, j), (1, 1))
    rs = lambda x: jnp.reshape(x, (1, 1))  # noqa: E731
    new = CXF(FF(rs(val.re.hi), rs(val.re.lo)),
              FF(rs(val.im.hi), rs(val.im.lo)))
    if active is not None:
        new = where(active, new, old)
    return _dus4(H, new, (i, j))


def getcol_cxff(H: CXF, i, j, k) -> CXF:
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - k)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    v = _ds4(H, (i, j), (k, 1))
    return CXF(FF(v.re.hi[:, 0], v.re.lo[:, 0]),
               FF(v.im.hi[:, 0], v.im.lo[:, 0]))


def setcol_cxff(H: CXF, i, j, vals: CXF, active=None) -> CXF:
    k = vals.re.hi.shape[0]
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - k)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    rs = lambda x: x.reshape(k, 1)  # noqa: E731
    new = CXF(FF(rs(vals.re.hi), rs(vals.re.lo)),
              FF(rs(vals.im.hi), rs(vals.im.lo)))
    if active is not None:
        old = _ds4(H, (i, j), (k, 1))
        new = where(active, new, old)
    return _dus4(H, new, (i, j))


def getrow_cxff(H: CXF, i, j, k) -> CXF:
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - k)
    v = _ds4(H, (i, j), (1, k))
    return CXF(FF(v.re.hi[0, :], v.re.lo[0, :]),
               FF(v.im.hi[0, :], v.im.lo[0, :]))


def setrow_cxff(H: CXF, i, j, vals: CXF, active=None) -> CXF:
    k = vals.re.hi.shape[0]
    m, n = H.re.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - k)
    rs = lambda x: x.reshape(1, k)  # noqa: E731
    new = CXF(FF(rs(vals.re.hi), rs(vals.re.lo)),
              FF(rs(vals.im.hi), rs(vals.im.lo)))
    if active is not None:
        old = _ds4(H, (i, j), (1, k))
        new = where(active, new, old)
    return _dus4(H, new, (i, j))


def fac_get(H: CXF, f) -> CXF:
    p, m, n = H.re.hi.shape
    f = jnp.clip(jnp.asarray(f, jnp.int32), 0, p - 1)
    z = jnp.int32(0)
    v = _ds4(H, (f, z, z), (1, m, n))
    return CXF(FF(v.re.hi[0], v.re.lo[0]), FF(v.im.hi[0], v.im.lo[0]))


def fac_set(H: CXF, f, M: CXF) -> CXF:
    p, m, n = H.re.hi.shape
    f = jnp.clip(jnp.asarray(f, jnp.int32), 0, p - 1)
    z = jnp.int32(0)
    e = lambda x: x[None]  # noqa: E731
    return CXF(
        FF(lax.dynamic_update_slice(H.re.hi, e(M.re.hi), (f, z, z)),
           lax.dynamic_update_slice(H.re.lo, e(M.re.lo), (f, z, z))),
        FF(lax.dynamic_update_slice(H.im.hi, e(M.im.hi), (f, z, z)),
           lax.dynamic_update_slice(H.im.lo, e(M.im.lo), (f, z, z))))


def at_set(H: CXF, idx, M: CXF) -> CXF:
    return CXF(FF(H.re.hi.at[idx].set(M.re.hi),
                  H.re.lo.at[idx].set(M.re.lo)),
               FF(H.im.hi.at[idx].set(M.im.hi),
                  H.im.lo.at[idx].set(M.im.lo)))


# (n,) CXF vector helpers for rotation-chain logs


def vget(G: CXF, k) -> CXF:
    n = G.re.hi.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n - 1)

    def one(x):
        return lax.dynamic_slice(x, (k,), (1,))[0]

    return CXF(FF(one(G.re.hi), one(G.re.lo)),
               FF(one(G.im.hi), one(G.im.lo)))


def vset(G: CXF, k, val: CXF, act) -> CXF:
    old = vget(G, k)
    v = where(act, val, old)
    n = G.re.hi.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n - 1)

    def upd(x, s):
        return lax.dynamic_update_slice(x, s[None], (k,))

    return CXF(FF(upd(G.re.hi, v.re.hi), upd(G.re.lo, v.re.lo)),
               FF(upd(G.im.hi, v.im.hi), upd(G.im.lo, v.im.lo)))


def fvget(G: FF, k) -> FF:
    n = G.hi.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n - 1)
    return FF(lax.dynamic_slice(G.hi, (k,), (1,))[0],
              lax.dynamic_slice(G.lo, (k,), (1,))[0])


def fvset(G: FF, k, val: FF, act) -> FF:
    old = fvget(G, k)
    v = ff.where(act, val, old)
    n = G.hi.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n - 1)
    return FF(lax.dynamic_update_slice(G.hi, v.hi[None], (k,)),
              lax.dynamic_update_slice(G.lo, v.lo[None], (k,)))


# ---------------------------------------------------------------------------
# complex ds Householder reflector (xLARFG semantics; mirrors
# cxkern.reflector_masked_cx with ffkern-style generation prescaling) for
# the ds split reduction


def _bc(x: FF, shape) -> FF:
    return FF(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))


def reflector_masked_cxff(x: CXF, start):
    """Reflector annihilating x[start+1:], acting on rows >= start.

    Returns (w: CXF with w[start] = 1 and zeros before start, tau: CXF,
    beta: FF real) with (I - tau w w^H) x = beta e_start.
    """
    n = x.re.hi.shape[0]
    rows = lax.iota(jnp.int32, n)
    m_tail = rows > start
    zv = ff.zeros((n,))
    s_, inv_ = _prescale(jnp.max(jnp.maximum(
        jnp.where(rows >= start, jnp.abs(x.re.hi), 0.0),
        jnp.where(rows >= start, jnp.abs(x.im.hi), 0.0))))
    x = CXF(FF(x.re.hi * s_, x.re.lo * s_), FF(x.im.hi * s_, x.im.lo * s_))
    alpha = CXF(ff.sum_(ff.where(rows == start, x.re, zv), 0),
                ff.sum_(ff.where(rows == start, x.im, zv), 0))
    tail_re = ff.where(m_tail, x.re, zv)
    tail_im = ff.where(m_tail, x.im, zv)
    xn2 = ff.sum_(ff.add(ff.sq(tail_re), ff.sq(tail_im)), 0)
    aab = ff.sqrt(ff.add(ff.add(ff.sq(alpha.re), ff.sq(alpha.im)), xn2))
    beta_v = ff.where(alpha.re.hi >= 0, ff.neg(aab), aab)
    degenerate = ff.eq0(xn2) & ff.eq0(alpha.im)
    beta = ff.where(degenerate, alpha.re, beta_v)
    bsafe = ff.where(ff.eq0(beta), ff.ff(jnp.float32(1.0)), beta)
    tau = CXF(ff.div(ff.sub(beta, alpha.re), bsafe),
              ff.div(ff.neg(alpha.im), bsafe))
    tau = where(degenerate, zeros(()), tau)
    # w tail = x / (alpha - beta) (complex division, denominator real+imag)
    den = CXF(ff.sub(alpha.re, beta), alpha.im)
    d2 = ff.add(ff.sq(den.re), ff.sq(den.im))
    d2s = ff.where(ff.eq0(d2), ff.ff(jnp.float32(1.0)), d2)
    dr = _bc(den.re, (n,))
    di = _bc(den.im, (n,))
    wre = ff.div(ff.add(ff.mul(tail_re, dr), ff.mul(tail_im, di)),
                 _bc(d2s, (n,)))
    wim = ff.div(ff.sub(ff.mul(tail_im, dr), ff.mul(tail_re, di)),
                 _bc(d2s, (n,)))
    onehot = ff.where(rows == start,
                      ff.ff(jnp.ones((n,), jnp.float32)), zv)
    w = CXF(ff.add(ff.where(m_tail, wre, zv), onehot),
            ff.where(m_tail, wim, zv))
    w = where(degenerate, CXF(onehot, zv), w)
    beta = FF(beta.hi * inv_, beta.lo * inv_)
    return w, tau, beta


def refl_left_cxff(A: CXF, w: CXF, tau_conj: CXF) -> CXF:
    """A -= tau_conj * w (w^H A)  (caller passes conj(tau))."""
    m = A.re.hi.shape[1]
    wr = FF(w.re.hi[:, None], w.re.lo[:, None])
    wi = FF(w.im.hi[:, None], w.im.lo[:, None])
    vre = ff.sum_(ff.add(ff.mul(wr, A.re), ff.mul(wi, A.im)), 0)
    vim = ff.sum_(ff.sub(ff.mul(wr, A.im), ff.mul(wi, A.re)), 0)
    tv = mul(tau_conj, CXF(vre, vim))
    tvr = FF(tv.re.hi[None, :], tv.re.lo[None, :])
    tvi = FF(tv.im.hi[None, :], tv.im.lo[None, :])
    del m
    return CXF(ff.sub(A.re, ff.sub(ff.mul(wr, tvr), ff.mul(wi, tvi))),
               ff.sub(A.im, ff.add(ff.mul(wr, tvi), ff.mul(wi, tvr))))


def refl_right_cxff(A: CXF, w: CXF, tau: CXF) -> CXF:
    """A <- A (I - tau w w^H):  A -= (A w) tau w^H."""
    wr = FF(w.re.hi[None, :], w.re.lo[None, :])
    wi = FF(w.im.hi[None, :], w.im.lo[None, :])
    vre = ff.sum_(ff.sub(ff.mul(A.re, wr), ff.mul(A.im, wi)), 1)
    vim = ff.sum_(ff.add(ff.mul(A.re, wi), ff.mul(A.im, wr)), 1)
    tv = mul(CXF(vre, vim), tau)
    tvr = FF(tv.re.hi[:, None], tv.re.lo[:, None])
    tvi = FF(tv.im.hi[:, None], tv.im.lo[:, None])
    # outer (tv) (w^H): tv_i * conj(w_j)
    return CXF(ff.sub(A.re, ff.add(ff.mul(tvr, wr), ff.mul(tvi, wi))),
               ff.sub(A.im, ff.sub(ff.mul(tvi, wr), ff.mul(tvr, wi))))
