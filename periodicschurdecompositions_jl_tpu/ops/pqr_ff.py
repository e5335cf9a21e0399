"""TPU-native real periodic QR core in float-float (double-single) precision.

Same algorithm as ops/pqr_real.py (MB03WD semantics, reference
src/PeriodicSchurDecompositions.jl:322-1096) with two changes that make it
the PRODUCTION path on the axon TPU:

* all arithmetic runs on (hi, lo) float32 pairs (ops/ff.py) — exact EFTs at
  hardware f32 speed, ~2^-48 unit roundoff, meeting the <=1e-12 backward
  error contract that the x64-rewriter's weak emulated add cannot;
* the bulge-chase sweep (the measured hot loop: >95%% of device ops) runs
  as the fused Pallas kernel pair of ops/pallas_sweep.py; the remaining
  per-iteration logic (band products, deflation scans, subdiagonal repair,
  1x1/2x2 deflation) is float-float XLA glue built on ops/ffslab.py.

Z is carried TRANSPOSED throughout (all Schur-vector updates are column
operations, which the TPU's memory model wants as row slabs on Z^T) and
transposed back at the end.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import AlgoConfig, default_config
from . import ff
from .ff import FF
from .ffkern import givens_ff, lanv2_ff, refl_mat_ff, reflector_ff
from .ffslab import (colsk_ff, fac_get, fac_set, getcol_ff, getel_ff,
                     rowsk_ff, setel_ff)
from .pallas_sweep import chase_sweep_ff


def _vel(v: FF, i) -> FF:
    """Clamped traced-index element of an FF vector."""
    n = v.hi.shape[0]
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, n - 1)
    return FF(lax.dynamic_slice(v.hi, (i,), (1,))[0],
              lax.dynamic_slice(v.lo, (i,), (1,))[0])


def _shift1(v: FF, fill=0.0) -> FF:
    """[fill, v[0], ..., v[n-2]] (the k-1 alignment used by the scans)."""
    pad = jnp.full((1,), fill, jnp.float32)
    return FF(jnp.concatenate([pad, v.hi[:-1]]),
              jnp.concatenate([pad * 0.0, v.lo[:-1]]))


def _band_products_ff(H: FF, n: int):
    """ds band entries of ℍ = H[0] @ (H[1] ... H[p-1]); see
    ops/pqr_real._band_products (reference :477-528)."""
    p = H.hi.shape[0]

    def diag(f, k):
        return FF(jnp.diagonal(H.hi[f], k), jnp.diagonal(H.lo[f], k))

    def padz(v: FF, npad):
        z = jnp.zeros((npad,), jnp.float32)
        return FF(jnp.concatenate([v.hi, z]), jnp.concatenate([v.lo, z]))

    P1 = ff.ff(jnp.ones((n,), jnp.float32))
    P2 = ff.zeros((n,))
    P3 = ff.zeros((n,))
    for l in range(1, p):
        D = FF(diag(l, 0).hi[:n], diag(l, 0).lo[:n])
        U = padz(FF(diag(l, 1).hi[:n - 1], diag(l, 1).lo[:n - 1]), 1)
        V = padz(FF(diag(l, 2).hi[:n - 2], diag(l, 2).lo[:n - 2]), 2)
        D1 = padz(FF(D.hi[1:], D.lo[1:]), 1)
        U1 = padz(FF(U.hi[1:], U.lo[1:]), 1)
        D2 = padz(FF(D.hi[2:], D.lo[2:]), 2)
        P3 = ff.add(ff.add(ff.mul(P1, V), ff.mul(P2, U1)), ff.mul(P3, D2))
        P2 = ff.add(ff.mul(P1, U), ff.mul(P2, D1))
        P1 = ff.mul(P1, D)
    d0 = FF(diag(0, 0).hi[:n], diag(0, 0).lo[:n])
    u0 = padz(FF(diag(0, 1).hi[:n - 1], diag(0, 1).lo[:n - 1]), 1)
    s0 = _shift1(padz(FF(diag(0, -1).hi[:n - 1], diag(0, -1).lo[:n - 1]), 1))
    P1m = _shift1(P1, 1.0)
    P2m = _shift1(P2)
    P3m = _shift1(P3)
    hsub = ff.mul(s0, P1m)
    hdiag = ff.add(ff.mul(s0, P2m), ff.mul(d0, P1))
    P11 = padz(FF(P1.hi[1:], P1.lo[1:]), 1)
    hsup = ff.add(ff.add(ff.mul(s0, P3m), ff.mul(d0, P2)),
                  ff.mul(u0, P11))
    return hdiag, hsub, hsup


@partial(jax.jit, static_argnames=("want_z", "maxitfac", "cfg", "interpret",
                                   "maxiter", "debug_state"))
def pqr_real_core_ff(
    Hhi: jax.Array,
    Hlo: jax.Array,
    ZThi: Optional[jax.Array] = None,
    ZTlo: Optional[jax.Array] = None,
    want_z: bool = True,
    maxitfac: int = 30,
    cfg: AlgoConfig = default_config,
    interpret: bool = False,
    maxiter: Optional[int] = None,
    debug_state: bool = False,
):
    """Run the ds real periodic QR iteration.

    Args:
      Hhi, Hlo: (p, n, n) f32 pair; H[0] upper Hessenberg, H[1:] triangular.
      ZThi, ZTlo: optional (p, n, n) f32 pair of TRANSPOSED initial Q stack.
      interpret: run the Pallas sweep kernels in interpreter mode (CPU
        tests); the TPU path compiles them with Mosaic.

    Returns (Thi, Tlo, ZThi, ZTlo, wr_hi, wr_lo, wi_hi, wi_lo, ok):
      quasi-triangular stack + TRANSPOSED Schur vectors + eigenvalue pairs.
    """
    p, n, _ = Hhi.shape
    ulp = float(ff.EPS)
    unfl = 1.175494e-38  # f32 tiny (ds exponent range is f32's)
    smlnum = unfl * (n / ulp)
    ulpx = cfg.ulp_x(ulp)
    dat1 = jnp.float32(0.75)
    dat2 = jnp.float32(-0.4375)
    maxit = maxitfac * n if maxiter is None else maxiter

    H0f = FF(Hhi, Hlo)
    if n == 1:
        lam = FF(jnp.ones(()), jnp.zeros(()))
        for f in range(p):
            lam = ff.mul(lam, FF(Hhi[f, 0, 0], Hlo[f, 0, 0]))
        zt = (ZThi, ZTlo) if ZThi is not None else (
            jnp.ones((p, 1, 1), jnp.float32), jnp.zeros((p, 1, 1), jnp.float32))
        return (Hhi, Hlo, zt[0], zt[1], lam.hi[None], lam.lo[None],
                jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32),
                jnp.asarray(True))

    # deflation thresholds for triangular-factor diagonals (reference
    # :379-388): ulp * n * opnorm1 — hi-precision is unnecessary here
    hnorms = ulp * n * jnp.max(
        jnp.sum(jnp.abs(Hhi.astype(jnp.float32)), axis=1), axis=1)

    # ghost-pad by one row/col; past one lane tile (N > 128) the Pallas
    # kernels switch to 8-aligned 16-row slab accesses (Mosaic requires
    # provably aligned dynamic sublane starts there), which needs N to be a
    # multiple of 8 with >= 15 rows of slack beyond any accessed row
    if n + 1 <= 128:
        N = n + 1
    else:
        N = ((n + 16 + 7) // 8) * 8
    def _pad(x):
        return jnp.zeros((p, N, N), jnp.float32).at[:, :n, :n].set(x)
    H = FF(_pad(Hhi), _pad(Hlo))
    if want_z:
        if ZThi is None:
            eyep = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
            ZT = FF(_pad(eyep), jnp.zeros((p, N, N), jnp.float32))
        else:
            ZT = FF(_pad(ZThi), _pad(ZTlo))
    else:
        ZT = FF(jnp.zeros((p, 1, 1), jnp.float32),
                jnp.zeros((p, 1, 1), jnp.float32))

    iv = jnp.arange(n, dtype=jnp.int32)
    zero = ff.zeros(())
    one = ff.ff(jnp.float32(1.0))

    def mT(M: FF) -> FF:
        return FF(M.hi.T, M.lo.T)

    def zup_t(ZT: FF, l, k, M: FF, active=None) -> FF:
        """Z[l][:, k:k+w] @= M  ==  ZT[l][k:k+w, :] = M^T @ rows."""
        if not want_z:
            return ZT
        Zl = fac_get(ZT, l)
        Zl = rowsk_ff(Zl, k, mT(M), active=active)
        return fac_set(ZT, l, Zl)

    # =================================================================
    def body(st):
        (H, ZT, wr, wi, i, l, its, itleft, jiter) = st

        Hn = FF(H.hi[:, :n, :n], H.lo[:, :n, :n])
        hdiag, hsub, hsup = _band_products_ff(Hn, n)

        # ---- deflation scan (ds magnitudes; thresholds in f32) --------
        hh11 = _shift1(hdiag)
        hh12 = _shift1(hsup)
        hh21 = hsub
        hh22 = hdiag
        tst1 = ff.add(ff.abs_(hh11), ff.abs_(hh22))
        ab = ff.maximum(ff.abs_(hh21), ff.abs_(hh12))
        ba = ff.minimum(ff.abs_(hh21), ff.abs_(hh12))
        aa = ff.maximum(ff.abs_(hh22), ff.abs_(ff.sub(hh11, hh22)))
        bb = ff.minimum(ff.abs_(hh22), ff.abs_(ff.sub(hh11, hh22)))
        stmp = ff.add(aa, ab)
        stmps = ff.where(ff.eq0(stmp), ff.full_like(stmp, 1.0), stmp)
        if cfg.slicot_convg:
            found_k = ff.le(ff.abs_(hh21),
                            ff.maximum(ff.mul_f(tst1, jnp.float32(ulp)),
                                       ff.full_like(tst1, smlnum)))
        else:
            lhs = ff.mul(ba, ff.div(ab, stmps))
            rhs = ff.maximum(ff.full_like(lhs, smlnum),
                             ff.mul_f(ff.mul(bb, ff.div(aa, stmps)),
                                      jnp.float32(ulpx)))
            at_ok = ff.le(lhs, rhs)
            found_k = ff.le(ff.abs_(hh21), ff.full_like(hh21, smlnum)) | \
                (ff.le(ff.abs_(hh21), ff.mul_f(tst1, jnp.float32(ulp)))
                 & at_ok)
        in_range = (iv >= l + 1) & (iv <= i)
        found_k &= in_range
        anyf = jnp.any(found_k)
        klast = jnp.max(jnp.where(found_k, iv, -1))
        lnew = jnp.where(i > l, jnp.where(anyf, klast, l), i)

        # ---- subdiagonal repair (reference :589-665) ------------------
        def repair(HZ):
            H, ZT = HZ

            def rep_step(t, HZ):
                H, ZT = HZ
                k = i - t
                act = k >= lnew
                for f in range(0, p - 1):
                    Hf = fac_get(H, f)
                    x0 = getel_ff(Hf, k, k)
                    x1 = getel_ff(Hf, k, k - 1)
                    w, tau, beta = reflector_ff(ff.stack([x0, x1], 0))
                    wv = ff.stack([FF(w.hi[1], w.lo[1]), one], 0)
                    tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (2,)),
                                   jnp.broadcast_to(tau.lo, (2,))), wv)
                    M2 = ff.sub(ff.ff(jnp.eye(2, dtype=jnp.float32)),
                                ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                                       FF(wv.hi[None, :], wv.lo[None, :])))
                    Hf = setel_ff(Hf, k, k - 1, zero, active=act)
                    Hf = setel_ff(Hf, k, k, beta, active=act)
                    Hf = colsk_ff(Hf, k - 1, M2, hi=k, active=act)
                    H = fac_set(H, f, Hf)
                    Hf1 = rowsk_ff(fac_get(H, f + 1), k - 1, M2, lo=k - 1,
                                   active=act)
                    H = fac_set(H, f + 1, Hf1)
                    ZT = zup_t(ZT, f + 1, k - 1, M2, active=act)
                act2 = act & (k < i)
                Hl = fac_get(H, p - 1)
                x0 = getel_ff(Hl, k + 1, k + 1)
                x1 = getel_ff(Hl, k + 1, k)
                w, tau, beta = reflector_ff(ff.stack([x0, x1], 0))
                wv = ff.stack([FF(w.hi[1], w.lo[1]), one], 0)
                tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (2,)),
                               jnp.broadcast_to(tau.lo, (2,))), wv)
                M2 = ff.sub(ff.ff(jnp.eye(2, dtype=jnp.float32)),
                            ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                                   FF(wv.hi[None, :], wv.lo[None, :])))
                Hl = setel_ff(Hl, k + 1, k, zero, active=act2)
                Hl = setel_ff(Hl, k + 1, k + 1, beta, active=act2)
                Hl = colsk_ff(Hl, k, M2, hi=k + 1, active=act2)
                H = fac_set(H, p - 1, Hl)
                H0 = rowsk_ff(fac_get(H, 0), k, M2, lo=k, active=act2)
                H = fac_set(H, 0, H0)
                ZT = zup_t(ZT, 0, k, M2, active=act2)
                return H, ZT

            H, ZT = lax.fori_loop(0, n, rep_step, (H, ZT))
            Hl = setel_ff(fac_get(H, p - 1), lnew, lnew - 1, zero)
            H = fac_set(H, p - 1, Hl)
            return H, ZT

        h0 = fac_get(H, 0)
        t1r = ff.add(ff.abs_(getel_ff(h0, lnew - 1, lnew - 1)),
                     ff.abs_(getel_ff(h0, lnew, lnew)))
        bndv = ff.abs_(getel_ff(h0, lnew, lnew - 1))
        need_repair = (lnew > 0) & (p > 1) & ff.gt(
            bndv, ff.maximum(ff.mul_f(t1r, jnp.float32(ulp)),
                             ff.full_like(t1r, smlnum)))
        H, ZT = lax.cond(need_repair, repair, lambda x: x, (H, ZT))
        H = fac_set(H, 0, setel_ff(fac_get(H, 0), lnew, lnew - 1, zero,
                                   active=lnew > 0))

        splitting = lnew >= i - 1

        # =============================================================
        # bulge-chase branch: shift + one fused Pallas sweep
        def do_chase(HZ):
            H, ZT = HZ
            exc1 = its == 10
            exc2 = (its % 10 == 0) & (~exc1)
            exc = exc1 | exc2
            sE = ff.where(
                exc1,
                ff.add(ff.abs_(_vel(hsub, lnew + 1)),
                       ff.abs_(_vel(hsub, lnew + 2))),
                ff.add(ff.abs_(_vel(hsub, i)), ff.abs_(_vel(hsub, i - 1))))
            h44E = ff.add(ff.mul_f(sE, dat1),
                          ff.where(exc1, _vel(hdiag, lnew), _vel(hdiag, i)))
            h33E = h44E
            h43h34E = ff.mul_f(ff.mul(sE, sE), dat2)
            h44 = _vel(hdiag, i)
            h33 = _vel(hdiag, i - 1)
            h43 = _vel(hsub, i)
            h34 = _vel(hsup, i - 1)
            h43h34 = ff.mul(h43, h34)
            ssh = ff.add(ff.add(ff.abs_(h33), ff.abs_(h34)),
                         ff.add(ff.abs_(h43), ff.abs_(h44)))
            sshs = ff.where(ff.eq0(ssh), ff.full_like(ssh, 1.0), ssh)
            h33n = ff.div(h33, sshs)
            h44n = ff.div(h44, sshs)
            h34n = ff.div(h34, sshs)
            h43n = ff.div(h43, sshs)
            trc = ff.mul_pow2(ff.add(h33n, h44n), 0.5)
            disc = ff.sub(ff.mul(ff.sub(h33n, trc), ff.sub(h44n, trc)),
                          ff.mul(h34n, h43n))
            rtdisc = ff.sqrt(ff.abs_(disc))
            rt1r_c = ff.mul(trc, ssh)
            rt1i_c = ff.mul(rtdisc, ssh)
            r1 = ff.add(trc, rtdisc)
            r2 = ff.sub(trc, rtdisc)
            pick = ff.where(
                ff.le(ff.abs_(ff.sub(r1, h44n)), ff.abs_(ff.sub(r2, h44n))),
                r1, r2)
            iszero_ssh = ff.eq0(ssh)
            rt1r = ff.where(iszero_ssh, zero,
                            ff.where(disc.hi >= 0, rt1r_c, ff.mul(pick, ssh)))
            rt2r = rt1r
            rt1i = ff.where(iszero_ssh, zero,
                            ff.where(disc.hi >= 0, rt1i_c, zero))
            rt2i = ff.neg(rt1i)

            m = lnew
            h11 = _vel(hdiag, m)
            h12 = _vel(hsup, m)
            h21 = _vel(hsub, m + 1)
            h22 = _vel(hdiag, m + 1)
            hsub_m2 = _vel(hsub, m + 2)
            h44s = ff.sub(h44E, h11)
            h33s = ff.sub(h33E, h11)
            h21s_ = ff.where(ff.eq0(h21), one, h21)
            v1E = ff.add(ff.div(ff.sub(ff.mul(h33s, h44s), h43h34E), h21s_),
                         h12)
            v2E = ff.sub(ff.sub(ff.sub(h22, h11), h33s), h44s)
            v3E = hsub_m2
            sv = ff.add(ff.add(ff.abs_(ff.sub(h11, rt2r)), ff.abs_(rt2i)),
                        ff.abs_(h21))
            svs = ff.where(ff.eq0(sv), ff.full_like(sv, 1.0), sv)
            h21s = ff.div(h21, svs)
            v1L = ff.sub(
                ff.add(ff.mul(h21s, h12),
                       ff.mul(ff.sub(h11, rt1r),
                              ff.div(ff.sub(h11, rt2r), svs))),
                ff.mul(rt1i, ff.div(rt2i, svs)))
            v2L = ff.mul(h21s, ff.sub(ff.sub(ff.add(h11, h22), rt1r), rt2r))
            v3L = ff.mul(h21s, hsub_m2)
            use_exc = exc | cfg.slicot_shifts
            v1 = ff.where(use_exc, v1E, v1L)
            v2 = ff.where(use_exc, v2E, v2L)
            v3 = ff.where(use_exc, v3E, v3L)
            snorm = ff.add(ff.add(ff.abs_(v1), ff.abs_(v2)), ff.abs_(v3))
            snorms = ff.where(ff.eq0(snorm), ff.full_like(snorm, 1.0), snorm)
            v0 = ff.stack([ff.div(v1, snorms), ff.div(v2, snorms),
                           ff.div(v3, snorms)], 0)

            H, ZT = chase_sweep_ff(H, ZT if want_z else None, m, i, v0,
                                   want_z=want_z, interpret=interpret)
            if not want_z:
                ZT = HZ[1]
            return H, ZT

        H, ZT = lax.cond(splitting, lambda x: x, do_chase, (H, ZT))

        # =============================================================
        # deflation branch (reference :895-1054)
        def do_deflate(HZwrwi):
            H, ZT, wr, wi = HZwrwi
            one_only = lnew == i

            def defl1(HZwrwi):
                H, ZT, wr, wi = HZwrwi
                lam = _vel(hdiag, i)
                wr = FF(lax.dynamic_update_slice(wr.hi, lam.hi[None], (i,)),
                        lax.dynamic_update_slice(wr.lo, lam.lo[None], (i,)))
                wi = FF(lax.dynamic_update_slice(
                    wi.hi, jnp.zeros((1,), jnp.float32), (i,)),
                    lax.dynamic_update_slice(
                        wi.lo, jnp.zeros((1,), jnp.float32), (i,)))
                return H, ZT, wr, wi

            def defl2(HZwrwi):
                H, ZT, wr, wi = HZwrwi
                hp22 = one
                hp12 = zero
                hp11 = one
                for f in range(1, p):
                    Hf = fac_get(H, f)
                    d1 = getel_ff(Hf, i - 1, i - 1)
                    d2 = getel_ff(Hf, i, i)
                    u = getel_ff(Hf, i - 1, i)
                    hp12 = ff.add(ff.mul(hp11, u), ff.mul(hp12, d2))
                    hp11 = ff.mul(hp11, d1)
                    hp22 = ff.mul(hp22, d2)
                H0 = fac_get(H, 0)
                a11 = getel_ff(H0, i - 1, i - 1)
                a12 = getel_ff(H0, i - 1, i)
                a21 = getel_ff(H0, i, i - 1)
                a22 = getel_ff(H0, i, i)
                bh11 = ff.mul(a11, hp11)
                bh12 = ff.add(ff.mul(a11, hp12), ff.mul(a12, hp22))
                bh21 = ff.mul(a21, hp11)
                bh22 = ff.add(ff.mul(a21, hp12), ff.mul(a22, hp22))
                (_, _, cc_, _, cs0, sn0,
                 w1r, w1i, w2r, w2i) = lanv2_ff(bh11, bh12, bh21, bh22)
                lam_real = ff.eq0(cc_)

                def put(v: FF, idx, val: FF) -> FF:
                    return FF(lax.dynamic_update_slice(v.hi, val.hi[None],
                                                       (idx,)),
                              lax.dynamic_update_slice(v.lo, val.lo[None],
                                                       (idx,)))
                wr = put(wr, i - 1, w1r)
                wi = put(wi, i - 1, w1i)
                wr = put(wr, i, w2r)
                wi = put(wi, i, w2i)

                # negligible-diagonal detection in the triangular factors
                lv = jnp.arange(p, dtype=jnp.int32)
                dm1 = jnp.abs(lax.dynamic_slice(
                    H.hi, (jnp.int32(0), i - 1, i - 1), (p, 1, 1))[:, 0, 0])
                dm0 = jnp.abs(lax.dynamic_slice(
                    H.hi, (jnp.int32(0), i, i), (p, 1, 1))[:, 0, 0])
                has_min = (dm1 <= hnorms) & (lv >= 1)
                has_max = (dm0 <= hnorms) & (lv >= 1)
                jmin = jnp.min(jnp.where(has_min, lv, p + 1))
                jmax = jnp.max(jnp.where(has_max, lv, -1))
                jmin = jnp.where(jmin > p, -1, jmin)
                both = (jmin >= 0) & (jmax >= 0)
                prefer_min = (jmin + 1 - 1) <= (p - (jmax + 1) + 1)
                jmax = jnp.where(both & prefer_min, -1, jmax)
                jmin = jnp.where(both & (~prefer_min), -1, jmin)

                def chainA(HZ):
                    H, ZT = HZ
                    for f in range(0, p - 1):
                        act = f <= jmin - 2
                        Hf = fac_get(H, f)
                        x0 = getel_ff(Hf, i, i)
                        x1 = getel_ff(Hf, i, i - 1)
                        w, tau, beta = reflector_ff(ff.stack([x0, x1], 0))
                        wv = ff.stack([FF(w.hi[1], w.lo[1]), one], 0)
                        tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (2,)),
                                       jnp.broadcast_to(tau.lo, (2,))), wv)
                        M2 = ff.sub(
                            ff.ff(jnp.eye(2, dtype=jnp.float32)),
                            ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                                   FF(wv.hi[None, :], wv.lo[None, :])))
                        Hf = setel_ff(Hf, i, i - 1, zero, active=act)
                        Hf = setel_ff(Hf, i, i, beta, active=act)
                        Hf = colsk_ff(Hf, i - 1, M2, hi=i, active=act)
                        H = fac_set(H, f, Hf)
                        Hf1 = rowsk_ff(fac_get(H, f + 1), i - 1, M2,
                                       lo=i - 1, active=act)
                        H = fac_set(H, f + 1, Hf1)
                        ZT = zup_t(ZT, f + 1, i - 1, M2, active=act)
                    return H, ZT

                def chainB(HZ):
                    H, ZT = HZ
                    a1 = ff.hypot2(w1r, w1i)
                    a2 = ff.hypot2(w2r, w2i)
                    amx = ff.maximum(a1, a2)
                    amn = ff.minimum(a1, a2)
                    prod0 = (ff.eq0(w1r) & ff.eq0(w1i)) | \
                        (ff.eq0(w2r) & ff.eq0(w2i))
                    tinyrat = ff.lt(amn, ff.mul_f(amx, jnp.float32(ulp)))
                    replace0 = ((jmax >= 1) & lam_real) | prod0 | \
                        ((~prod0) & lam_real & tinyrat)

                    def lmat_ff(c: FF, s: FF) -> FF:
                        return ff.stack(
                            [ff.stack([c, s], 0),
                             ff.stack([ff.neg(s), c], 0)], 0)

                    def rmat_adj_ff(c: FF, s: FF) -> FF:
                        return ff.stack(
                            [ff.stack([c, ff.neg(s)], 0),
                             ff.stack([s, c], 0)], 0)

                    def iter20(t, carry):
                        H, ZT, replaceG, done = carry
                        act = ~done
                        H0 = fac_get(H, 0)
                        cg, sg, _ = givens_ff(getel_ff(H0, i - 1, i - 1),
                                              getel_ff(H0, i, i - 1))
                        c = ff.where(replaceG, cg, cs0)
                        s = ff.where(replaceG, sg, sn0)
                        H0 = rowsk_ff(H0, i - 1, lmat_ff(c, s), lo=i - 1,
                                      active=act)
                        H = fac_set(H, 0, H0)
                        tgt = p - 1 if p > 1 else 0
                        Ht = colsk_ff(fac_get(H, tgt), i - 1,
                                      rmat_adj_ff(c, s), hi=i + 1,
                                      active=act)
                        H = fac_set(H, tgt, Ht)
                        ZT = zup_t(ZT, 0, i - 1, rmat_adj_ff(c, s),
                                   active=act)
                        for f in range(p - 1, 0, -1):
                            actf = act & (f >= jmax + 1)
                            Hf = fac_get(H, f)
                            x = ff.stack([getel_ff(Hf, i - 1, i - 1),
                                          getel_ff(Hf, i, i - 1)], 0)
                            w_, tau_, beta_ = reflector_ff(x)
                            M2 = refl_mat_ff(w_, tau_)
                            Hf = setel_ff(Hf, i - 1, i - 1, beta_,
                                          active=actf)
                            Hf = setel_ff(Hf, i, i - 1, zero, active=actf)
                            Hf = rowsk_ff(Hf, i - 1, M2, lo=i, active=actf)
                            H = fac_set(H, f, Hf)
                            Hf1 = colsk_ff(fac_get(H, f - 1), i - 1, M2,
                                           hi=i + 1, active=actf)
                            H = fac_set(H, f - 1, Hf1)
                            ZT = zup_t(ZT, f, i - 1, M2, active=actf)
                        sub = ff.abs_(getel_ff(fac_get(H, 0), i, i - 1))
                        conv = (~replaceG) | ff.lt(
                            sub, ff.maximum(ff.full_like(sub, smlnum),
                                            ff.mul_f(amx, jnp.float32(ulp))))
                        done = done | conv
                        return H, ZT, jnp.asarray(True), done

                    H, ZT, _, _ = lax.fori_loop(
                        0, 20, iter20, (H, ZT, replace0, jnp.asarray(False)))
                    H = fac_set(H, 0, setel_ff(
                        fac_get(H, 0), i, i - 1, zero,
                        active=(jmax >= 0) | ff.eq0(bh21)))

                    def zmax(H):
                        Hf = fac_get(H, jmax)
                        Hf = setel_ff(Hf, i, i - 1, zero)
                        return fac_set(H, jmax, Hf)
                    H = lax.cond(jmax >= 1, zmax, lambda x: x, H)
                    return H, ZT

                H, ZT = lax.cond(jmin >= 1, chainA, chainB, (H, ZT))

                # eigenvalue-order check after replacement rotations
                l1 = getel_ff(fac_get(H, 0), i - 1, i - 1)
                l2 = getel_ff(fac_get(H, 0), i, i)
                for f in range(1, p):
                    Hf = fac_get(H, f)
                    l1 = ff.mul(l1, getel_ff(Hf, i - 1, i - 1))
                    l2 = ff.mul(l2, getel_ff(Hf, i, i))
                swap = lam_real & ff.gt(ff.abs_(ff.sub(l1, w1r)),
                                        ff.abs_(ff.sub(l1, w2r)))
                wr1 = _vel(wr, i - 1)
                wr2 = _vel(wr, i)
                wr = put(wr, i - 1, ff.where(swap, wr2, wr1))
                wr = put(wr, i, ff.where(swap, wr1, wr2))
                return H, ZT, wr, wi

            return lax.cond(one_only, defl1, defl2, (H, ZT, wr, wi))

        H, ZT, wr, wi = lax.cond(
            splitting, do_deflate, lambda x: x, (H, ZT, wr, wi))

        itleft = jnp.where(splitting, itleft - its, itleft)
        i = jnp.where(splitting, lnew - 1, i)
        l = jnp.where(splitting, jnp.int32(0), lnew)
        its = jnp.where(splitting, jnp.int32(1), its + 1)
        return (H, ZT, wr, wi, i, l, its, itleft, jiter + 1)

    def cond(st):
        (H, ZT, wr, wi, i, l, its, itleft, jiter) = st
        return (i >= 0) & (jiter < maxit)

    def body_guarded(st):
        return lax.cond(st[4] >= 0, body, lambda s: s, st)

    wr0 = ff.zeros((n,))
    wi0 = ff.zeros((n,))
    st = (H, ZT, wr0, wi0, jnp.int32(n - 1), jnp.int32(0), jnp.int32(1),
          jnp.int32(maxit), jnp.int32(0))
    H, ZT, wr, wi, i, l, its, itleft, jiter = lax.while_loop(
        cond, body_guarded, st)
    ok = i < 0

    H = FF(H.hi[:, :n, :n], H.lo[:, :n, :n])
    ZTout = FF(ZT.hi[:, :n, :n], ZT.lo[:, :n, :n]) if want_z else None
    # scrub subdiagonals of real eigenvalues (reference :1066-1073)
    keep = jnp.where(wi.hi[:-1] == 0, 0.0, 1.0).astype(jnp.float32)
    sub_hi = jnp.diagonal(H.hi[0], -1) * keep
    sub_lo = jnp.diagonal(H.lo[0], -1) * keep
    H0hi = H.hi[0] - jnp.diag(jnp.diagonal(H.hi[0], -1), -1) + \
        jnp.diag(sub_hi, -1)
    H0lo = H.lo[0] - jnp.diag(jnp.diagonal(H.lo[0], -1), -1) + \
        jnp.diag(sub_lo, -1)
    Hhi_out = H.hi.at[0].set(H0hi)
    Hlo_out = H.lo.at[0].set(H0lo)
    if p > 1:
        Hhi_out = Hhi_out.at[1:].set(jnp.triu(Hhi_out[1:]))
        Hlo_out = Hlo_out.at[1:].set(jnp.triu(Hlo_out[1:]))
    if want_z:
        out = (Hhi_out, Hlo_out, ZTout.hi, ZTout.lo,
               wr.hi, wr.lo, wi.hi, wi.lo, ok)
    else:
        out = (Hhi_out, Hlo_out, None, None,
               wr.hi, wr.lo, wi.hi, wi.lo, ok)
    if debug_state:
        # raw loop scalars + the UNSCRUBBED padded state, for bisecting
        return out + ((i, l, its, jiter), (H.hi, H.lo))
    return out
