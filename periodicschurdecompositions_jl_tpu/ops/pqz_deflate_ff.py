"""Float-float fork of ops/pqz_deflate_split.py (contract-grade on-chip).

Identical algorithm and masking structure as pqz_deflate_split's cores
(reference src/generalized.jl:453-566 deflate_pos, :568-740 deflate_neg,
:356-448 controlled zero shift); every complex value is a cxff.CXF
((re, im) float-float pair), so the rotation chains run with ~2^-48
roundoff on the axon chip, where the split emulated-f64 representation
bottoms out at the x64-rewriter's weak-add floor.

Negligibility thresholds compare f32 hi components (threshold-grade
precision; the values themselves stay ds).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import cxff, ff
from .cxff import (CXF, colsk_cxff, fac_get, fac_set, fvget, fvset,
                   getel_cxff, givens_cxff, lmat_cxff, neg, rmat_adj_cxff,
                   rowsk_cxff, setel_cxff, vget, vset, where)


def make_deflate_cores_ff(*, p, n, S, want_z, ulp, smlnum):
    S_arr = jnp.asarray(S)
    zero_c = cxff.zeros(())

    def ones_ff(shape):
        return ff.ff(jnp.ones(shape, jnp.float32))

    def _habs(x: CXF):
        """f32-precision |x| for negligibility tests (hi components)."""
        return jnp.hypot(x.re.hi, x.im.hi)

    def zup(Z, l, base, c, s: CXF):
        if not want_z:
            return Z
        return fac_set(Z, jnp.int32(l),
                       colsk_cxff(fac_get(Z, jnp.int32(l)), base,
                                  rmat_adj_cxff(c, s)))

    def zup_dyn(Z, l, base, c, s: CXF):
        if not want_z:
            return Z
        Zl = fac_get(Z, l)
        Zl = colsk_cxff(Zl, base, rmat_adj_cxff(c, s))
        return fac_set(Z, l, Zl)

    def chain_right_static(M: CXF, Gc, Gs: CXF, klo, khi) -> CXF:
        def bd(k, M):
            act = (k >= klo) & (k <= khi)
            return colsk_cxff(M, k, rmat_adj_cxff(fvget(Gc, k), vget(Gs, k)),
                              active=act)
        return lax.fori_loop(0, n - 1, bd, M)

    def chain_right_desc(M: CXF, Gc, Gs: CXF, klo, khi) -> CXF:
        def bd(t, M):
            k = khi - t
            act = k >= klo
            return colsk_cxff(M, k - 1,
                              rmat_adj_cxff(fvget(Gc, k), vget(Gs, k)),
                              active=act)
        return lax.fori_loop(0, n, bd, M)

    # =====================================================================
    # DEFLATE_POS (reference src/generalized.jl:453-566)
    def pos_core(H: CXF, Z: CXF, jlo, ldef, jdef, ilast):
        Hl = fac_get(H, ldef)
        Hl = setel_cxff(Hl, jdef, jdef, zero_c)
        H = fac_set(H, ldef, Hl)

        Gc = ones_ff((n,))
        Gs = cxff.zeros((n,))

        def a1(k, carry):
            H0, Gc, Gs = carry
            act = (k >= jlo) & (k <= jdef - 1)
            c, s, r = givens_cxff(getel_cxff(H0, k, k),
                                  getel_cxff(H0, k + 1, k))
            H0 = setel_cxff(H0, k, k, r, active=act)
            H0 = setel_cxff(H0, k + 1, k, zero_c, active=act)
            H0 = rowsk_cxff(H0, k, lmat_cxff(c, s), lo=k + 1, active=act)
            Gc = fvset(Gc, k, c, act)
            Gs = vset(Gs, k, s, act)
            return H0, Gc, Gs

        H0, Gc, Gs = lax.fori_loop(0, n - 1, a1, (fac_get(H, 0), Gc, Gs))
        H = fac_set(H, 0, H0)
        if want_z:
            Z = fac_set(Z, 0, chain_right_static(fac_get(Z, 0), Gc, Gs,
                                                 jlo, jdef - 1))

        def outer1(t, carry):
            H, Z, Gc, Gs = carry
            l = jnp.int32(p - 1) - t
            ntra = jnp.where(l < ldef, jdef - 2, jdef - 1)

            def b1_pos(k, carry):
                Hl, Gc, Gs = carry
                act = (k >= jlo) & (k <= ntra)
                Hl = colsk_cxff(Hl, k,
                                rmat_adj_cxff(fvget(Gc, k), vget(Gs, k)),
                                hi=k + 2, active=act)
                c, s, r = givens_cxff(getel_cxff(Hl, k, k),
                                      getel_cxff(Hl, k + 1, k))
                Hl = setel_cxff(Hl, k, k, r, active=act)
                Hl = setel_cxff(Hl, k + 1, k, zero_c, active=act)
                Hl = rowsk_cxff(Hl, k, lmat_cxff(c, s), lo=k + 1,
                                active=act)
                Gc = fvset(Gc, k, c, act)
                Gs = vset(Gs, k, s, act)
                return Hl, Gc, Gs

            def b1_neg(k, carry):
                Hl, Gc, Gs = carry
                act = (k >= jlo) & (k <= ntra)
                Hl = rowsk_cxff(Hl, k,
                                lmat_cxff(fvget(Gc, k), vget(Gs, k)),
                                lo=k, active=act)
                c, s, r = givens_cxff(getel_cxff(Hl, k + 1, k + 1),
                                      getel_cxff(Hl, k + 1, k))
                Hl = setel_cxff(Hl, k + 1, k + 1, r, active=act)
                Hl = setel_cxff(Hl, k + 1, k, zero_c, active=act)
                Hl = colsk_cxff(Hl, k, lmat_cxff(c, s), hi=k + 1,
                                active=act)
                Gc = fvset(Gc, k, c, act)
                Gs = vset(Gs, k, neg(s), act)
                return Hl, Gc, Gs

            Hl, Gc, Gs = lax.cond(
                S_arr[jnp.clip(l, 0, p - 1)],
                lambda a: lax.fori_loop(0, n - 1, b1_pos, a),
                lambda a: lax.fori_loop(0, n - 1, b1_neg, a),
                (fac_get(H, l), Gc, Gs))
            H = fac_set(H, l, Hl)
            if want_z:
                Z = fac_set(Z, l, chain_right_static(fac_get(Z, l), Gc, Gs,
                                                     jlo, ntra))
            return H, Z, Gc, Gs

        if p > 1:
            H, Z, Gc, Gs = lax.fori_loop(0, p - 1, outer1, (H, Z, Gc, Gs))

        def c1(k, H0):
            act = (k >= jlo) & (k <= jdef - 2)
            return colsk_cxff(H0, k,
                              rmat_adj_cxff(fvget(Gc, k), vget(Gs, k)),
                              hi=k + 2, active=act)

        H = fac_set(H, 0, lax.fori_loop(0, n - 1, c1, fac_get(H, 0)))

        # ---- second unshifted half-sweep (upwards from ilast) ----------
        G2c = ones_ff((n,))
        G2s = cxff.zeros((n,))

        def a2(t, carry):
            H0, G2c, G2s = carry
            j = ilast - t
            act = j >= jdef + 1
            c, s, r = givens_cxff(getel_cxff(H0, j, j),
                                  getel_cxff(H0, j, j - 1))
            H0 = setel_cxff(H0, j, j, r, active=act)
            H0 = setel_cxff(H0, j, j - 1, zero_c, active=act)
            H0 = colsk_cxff(H0, j - 1, lmat_cxff(c, s), hi=j, active=act)
            G2c = fvset(G2c, j, c, act)
            G2s = vset(G2s, j, neg(s), act)
            return H0, G2c, G2s

        H0, G2c, G2s = lax.fori_loop(0, n, a2, (fac_get(H, 0), G2c, G2s))
        H = fac_set(H, 0, H0)
        if want_z:
            Z = fac_set(Z, 1 % p, chain_right_desc(fac_get(Z, 1 % p),
                                                   G2c, G2s,
                                                   jdef + 1, ilast))

        def outer2(t0, carry):
            H, Z, G2c, G2s = carry
            l = jnp.int32(1) + t0
            ntra = jnp.where(l > ldef, jdef + 2, jdef + 1)

            def b2_neg(t, carry):
                Hl, G2c, G2s = carry
                j = ilast - t
                act = j >= ntra
                Hl = colsk_cxff(Hl, j - 1,
                                rmat_adj_cxff(fvget(G2c, j),
                                              vget(G2s, j)),
                                hi=j + 1, active=act)
                c, s, r = givens_cxff(getel_cxff(Hl, j - 1, j - 1),
                                      getel_cxff(Hl, j, j - 1))
                Hl = setel_cxff(Hl, j - 1, j - 1, r, active=act)
                Hl = setel_cxff(Hl, j, j - 1, zero_c, active=act)
                Hl = rowsk_cxff(Hl, j - 1, lmat_cxff(c, s), lo=j,
                                active=act)
                G2c = fvset(G2c, j, c, act)
                G2s = vset(G2s, j, s, act)
                return Hl, G2c, G2s

            def b2_pos(t, carry):
                Hl, G2c, G2s = carry
                j = ilast - t
                act = j >= ntra
                Hl = rowsk_cxff(Hl, j - 1,
                                lmat_cxff(fvget(G2c, j), vget(G2s, j)),
                                lo=j - 1, active=act)
                c, s, r = givens_cxff(getel_cxff(Hl, j, j),
                                      getel_cxff(Hl, j, j - 1))
                Hl = setel_cxff(Hl, j, j, r, active=act)
                Hl = setel_cxff(Hl, j, j - 1, zero_c, active=act)
                Hl = colsk_cxff(Hl, j - 1, lmat_cxff(c, s), hi=j,
                                active=act)
                G2c = fvset(G2c, j, c, act)
                G2s = vset(G2s, j, neg(s), act)
                return Hl, G2c, G2s

            Hl, G2c, G2s = lax.cond(
                S_arr[jnp.clip(l, 0, p - 1)],
                lambda a: lax.fori_loop(0, n, b2_pos, a),
                lambda a: lax.fori_loop(0, n, b2_neg, a),
                (fac_get(H, l), G2c, G2s))
            H = fac_set(H, l, Hl)
            if want_z:
                ln = jnp.where(l + 1 >= p, 0, l + 1)
                Z = fac_set(Z, ln,
                            chain_right_desc(fac_get(Z, ln),
                                             G2c, G2s, ntra, ilast))
            return H, Z, G2c, G2s

        if p > 1:
            H, Z, G2c, G2s = lax.fori_loop(0, p - 1, outer2,
                                           (H, Z, G2c, G2s))

        def c2(t, H0):
            j = ilast - t
            act = j >= jdef + 2
            return rowsk_cxff(H0, j - 1,
                              lmat_cxff(fvget(G2c, j), vget(G2s, j)),
                              lo=j - 1, active=act)

        H = fac_set(H, 0, lax.fori_loop(0, n, c2, fac_get(H, 0)))
        return H, Z

    # =====================================================================
    # DEFLATE_NEG ring-walk branch bodies
    def hess_dn(op):
        Hln, j, c, s = op
        Hln = rowsk_cxff(Hln, j, lmat_cxff(c, s), lo=j - 1)
        cn, sn, r = givens_cxff(getel_cxff(Hln, j + 1, j),
                                getel_cxff(Hln, j + 1, j - 1))
        Hln = setel_cxff(Hln, j + 1, j, r)
        Hln = setel_cxff(Hln, j + 1, j - 1, zero_c)
        Hln = colsk_cxff(Hln, j - 1, lmat_cxff(cn, sn), hi=j + 1)
        return Hln, j - 1, cn, neg(sn)

    def pos_dn(op):
        Hln, j, c, s = op
        Hln = rowsk_cxff(Hln, j, lmat_cxff(c, s), lo=j)
        cn, sn, r = givens_cxff(getel_cxff(Hln, j + 1, j + 1),
                                getel_cxff(Hln, j + 1, j))
        Hln = setel_cxff(Hln, j + 1, j + 1, r)
        Hln = setel_cxff(Hln, j + 1, j, zero_c)
        Hln = colsk_cxff(Hln, j, lmat_cxff(cn, sn), hi=j + 1)
        return Hln, j, cn, neg(sn)

    def neg_dn(op):
        Hln, j, c, s = op
        Hln = colsk_cxff(Hln, j, rmat_adj_cxff(c, s), hi=j + 2)
        cn, sn, r = givens_cxff(getel_cxff(Hln, j, j),
                                getel_cxff(Hln, j + 1, j))
        Hln = setel_cxff(Hln, j, j, r)
        Hln = setel_cxff(Hln, j + 1, j, zero_c)
        Hln = rowsk_cxff(Hln, j, lmat_cxff(cn, sn), lo=j + 1)
        return Hln, j, cn, sn

    def hess_up(op):
        Hln, j, c, s = op
        Hln = colsk_cxff(Hln, j - 1, rmat_adj_cxff(c, s), hi=j + 2)
        cn, sn, r = givens_cxff(getel_cxff(Hln, j, j - 1),
                                getel_cxff(Hln, j + 1, j - 1))
        Hln = setel_cxff(Hln, j, j - 1, r)
        Hln = setel_cxff(Hln, j + 1, j - 1, zero_c)
        Hln = rowsk_cxff(Hln, j, lmat_cxff(cn, sn), lo=j)
        return Hln, j + 1, cn, sn

    def neg_up(op):
        Hln, j, c, s = op
        Hln = rowsk_cxff(Hln, j - 1, lmat_cxff(c, s), lo=j - 1)
        cn, sn, r = givens_cxff(getel_cxff(Hln, j, j),
                                getel_cxff(Hln, j, j - 1))
        Hln = setel_cxff(Hln, j, j, r)
        Hln = setel_cxff(Hln, j, j - 1, zero_c)
        Hln = colsk_cxff(Hln, j - 1, lmat_cxff(cn, sn), hi=j)
        return Hln, j, cn, neg(sn)

    def pos_up(op):
        Hln, j, c, s = op
        Hln = colsk_cxff(Hln, j - 1, rmat_adj_cxff(c, s), hi=j + 1)
        cn, sn, r = givens_cxff(getel_cxff(Hln, j - 1, j - 1),
                                getel_cxff(Hln, j, j - 1))
        Hln = setel_cxff(Hln, j - 1, j - 1, r)
        Hln = setel_cxff(Hln, j, j - 1, zero_c)
        Hln = rowsk_cxff(Hln, j - 1, lmat_cxff(cn, sn), lo=j)
        return Hln, j, cn, sn

    def neg_core(H: CXF, Z: CXF, jlo, ldef, jdef, ilast):
        Hl = fac_get(H, ldef)
        Hl = setel_cxff(Hl, jdef, jdef, zero_c)
        H = fac_set(H, ldef, Hl)

        bottom = (jdef + 1).astype(jnp.float32) > \
            (ilast - jlo + 1).astype(jnp.float32) / 2

        def chase_down(HZ):
            H, Z = HZ

            def outer(j1, HZ):
                H, Z = HZ

                def run(HZ):
                    H, Z = HZ
                    j = j1
                    Hl = fac_get(H, ldef)
                    c, s, r = givens_cxff(getel_cxff(Hl, j, j + 1),
                                          getel_cxff(Hl, j + 1, j + 1))
                    Hl = setel_cxff(Hl, j, j + 1, r)
                    Hl = setel_cxff(Hl, j + 1, j + 1, zero_c)
                    Hl = rowsk_cxff(Hl, j, lmat_cxff(c, s), lo=j + 2)
                    H = fac_set(H, ldef, Hl)
                    ln = (ldef + 1) % p
                    Z = zup_dyn(Z, ln, j, c, s)

                    def step(t, carry):
                        H, Z, j, c, s, ln = carry
                        Hln = fac_get(H, ln)
                        bidx = jnp.where(ln == 0, 0,
                                         jnp.where(S_arr[ln], 1, 2))
                        Hln, j, c, s = lax.switch(
                            bidx, [hess_dn, pos_dn, neg_dn], (Hln, j, c, s))
                        H = fac_set(H, ln, Hln)
                        ln = (ln + 1) % p
                        Z = zup_dyn(Z, ln, j, c, s)
                        return H, Z, j, c, s, ln

                    H, Z, j, c, s, ln = lax.fori_loop(
                        0, p - 1, step, (H, Z, j, c, s, ln))
                    Hl = fac_get(H, ldef)
                    Hl = colsk_cxff(Hl, j, rmat_adj_cxff(c, s), hi=j + 1)
                    H = fac_set(H, ldef, Hl)
                    return H, Z

                act = (j1 >= jdef) & (j1 <= ilast - 1)
                return lax.cond(act, run, lambda x: x, (H, Z))

            H, Z = lax.fori_loop(0, n, outer, (H, Z))

            j = ilast
            H0 = fac_get(H, 0)
            c, s, r = givens_cxff(getel_cxff(H0, j, j),
                                  getel_cxff(H0, j, j - 1))
            H0 = setel_cxff(H0, j, j, r)
            H0 = setel_cxff(H0, j, j - 1, zero_c)
            H0 = colsk_cxff(H0, j - 1, lmat_cxff(c, s), hi=j)
            H = fac_set(H, 0, H0)
            c2, s2 = c, neg(s)
            Z = zup(Z, 1 % p, j - 1, c2, s2)

            def tail_dn(t0, carry):
                H, Z, c2, s2 = carry
                l = jnp.int32(1) + t0
                act = l < ldef

                def run2(HZcs):
                    H, Z, c2, s2 = HZcs
                    Hl = fac_get(H, l)

                    def sneg(args):
                        Hl, c2, s2 = args
                        Hl = colsk_cxff(Hl, j - 1, rmat_adj_cxff(c2, s2),
                                        hi=j + 1)
                        cn, sn, r = givens_cxff(
                            getel_cxff(Hl, j - 1, j - 1),
                            getel_cxff(Hl, j, j - 1))
                        Hl = setel_cxff(Hl, j - 1, j - 1, r)
                        Hl = setel_cxff(Hl, j, j - 1, zero_c)
                        Hl = rowsk_cxff(Hl, j - 1, lmat_cxff(cn, sn), lo=j)
                        return Hl, cn, sn

                    def spos(args):
                        Hl, c2, s2 = args
                        Hl = rowsk_cxff(Hl, j - 1, lmat_cxff(c2, s2),
                                        lo=j - 1)
                        cn, sn, r = givens_cxff(getel_cxff(Hl, j, j),
                                                getel_cxff(Hl, j, j - 1))
                        Hl = setel_cxff(Hl, j, j, r)
                        Hl = setel_cxff(Hl, j, j - 1, zero_c)
                        Hl = colsk_cxff(Hl, j - 1, lmat_cxff(cn, sn), hi=j)
                        return Hl, cn, neg(sn)

                    Hl, cf, sf = lax.cond(S_arr[jnp.clip(l, 0, p - 1)],
                                          spos, sneg, (Hl, c2, s2))
                    H = fac_set(H, l, Hl)
                    ln = jnp.where(l + 1 >= p, 0, l + 1)
                    Z = zup_dyn(Z, ln, j - 1, cf, sf)
                    return H, Z, cf, sf

                return lax.cond(act, run2, lambda x: x, (H, Z, c2, s2))

            if p > 1:
                H, Z, c2, s2 = lax.fori_loop(0, p - 1, tail_dn,
                                             (H, Z, c2, s2))
            Hl = fac_get(H, ldef)
            Hl = colsk_cxff(Hl, j - 1, rmat_adj_cxff(c2, s2), hi=j + 1)
            H = fac_set(H, ldef, Hl)
            return H, Z

        def chase_up(HZ):
            H, Z = HZ

            def outer(t, HZ):
                H, Z = HZ
                j1 = jdef - t

                def run(HZ):
                    H, Z = HZ
                    j = j1
                    Hl = fac_get(H, ldef)
                    c, s, r = givens_cxff(getel_cxff(Hl, j - 1, j),
                                          getel_cxff(Hl, j - 1, j - 1))
                    Hl = setel_cxff(Hl, j - 1, j, r)
                    Hl = setel_cxff(Hl, j - 1, j - 1, zero_c)
                    Hl = colsk_cxff(Hl, j - 1, lmat_cxff(c, s), hi=j - 1)
                    H = fac_set(H, ldef, Hl)
                    c, s = c, neg(s)
                    Z = zup_dyn(Z, ldef, j - 1, c, s)
                    ln = (ldef - 1) % p

                    def step(t2, carry):
                        H, Z, j, c, s, ln = carry
                        Hln = fac_get(H, ln)
                        bidx = jnp.where(ln == 0, 0,
                                         jnp.where(S_arr[ln], 1, 2))
                        Hln, j, c, s = lax.switch(
                            bidx, [hess_up, pos_up, neg_up], (Hln, j, c, s))
                        H = fac_set(H, ln, Hln)
                        Z = zup_dyn(Z, ln, j - 1, c, s)
                        ln = (ln - 1) % p
                        return H, Z, j, c, s, ln

                    H, Z, j, c, s, ln = lax.fori_loop(
                        0, p - 1, step, (H, Z, j, c, s, ln))
                    Hl = fac_get(H, ldef)
                    Hl = rowsk_cxff(Hl, j - 1, lmat_cxff(c, s), lo=j)
                    H = fac_set(H, ldef, Hl)
                    return H, Z

                act = (j1 >= jlo + 1) & (j1 <= jdef)
                return lax.cond(act, run, lambda x: x, (H, Z))

            H, Z = lax.fori_loop(0, n, outer, (H, Z))

            j = jlo
            H0 = fac_get(H, 0)
            c, s, r = givens_cxff(getel_cxff(H0, j, j),
                                  getel_cxff(H0, j + 1, j))
            H0 = setel_cxff(H0, j, j, r)
            H0 = setel_cxff(H0, j + 1, j, zero_c)
            H0 = rowsk_cxff(H0, j, lmat_cxff(c, s), lo=j + 1)
            H = fac_set(H, 0, H0)
            c2, s2 = c, s
            Z = zup(Z, 0, j, c2, s2)

            def tail_up(t0, carry):
                H, Z, c2, s2 = carry
                l = jnp.int32(p - 1) - t0
                act = l > ldef

                def run2(HZcs):
                    H, Z, c2, s2 = HZcs
                    Hl = fac_get(H, l)

                    def spos(args):
                        Hl, c2, s2 = args
                        Hl = colsk_cxff(Hl, j, rmat_adj_cxff(c2, s2),
                                        hi=j + 2)
                        cn, sn, r = givens_cxff(getel_cxff(Hl, j, j),
                                                getel_cxff(Hl, j + 1, j))
                        Hl = setel_cxff(Hl, j, j, r)
                        Hl = setel_cxff(Hl, j + 1, j, zero_c)
                        Hl = rowsk_cxff(Hl, j, lmat_cxff(cn, sn), lo=j + 1)
                        return Hl, cn, sn

                    def sneg(args):
                        Hl, c2, s2 = args
                        Hl = rowsk_cxff(Hl, j, lmat_cxff(c2, s2), lo=j)
                        cn, sn, r = givens_cxff(
                            getel_cxff(Hl, j + 1, j + 1),
                            getel_cxff(Hl, j + 1, j))
                        Hl = setel_cxff(Hl, j + 1, j + 1, r)
                        Hl = setel_cxff(Hl, j + 1, j, zero_c)
                        Hl = colsk_cxff(Hl, j, lmat_cxff(cn, sn), hi=j + 1)
                        return Hl, cn, neg(sn)

                    Hl, cf, sf = lax.cond(S_arr[jnp.clip(l, 0, p - 1)],
                                          spos, sneg, (Hl, c2, s2))
                    H = fac_set(H, l, Hl)
                    Z = zup_dyn(Z, l, j, cf, sf)
                    return H, Z, cf, sf

                return lax.cond(act, run2, lambda x: x, (H, Z, c2, s2))

            if p > 1:
                H, Z, c2, s2 = lax.fori_loop(0, p - 1, tail_up,
                                             (H, Z, c2, s2))
            Hl = fac_get(H, ldef)
            Hl = rowsk_cxff(Hl, j, lmat_cxff(c2, s2), lo=j + 1)
            H = fac_set(H, ldef, Hl)
            return H, Z

        H, Z = lax.cond(bottom, chase_down, chase_up, (H, Z))
        return H, Z

    # =====================================================================
    # controlled zero shift
    def czshift_core(H: CXF, Z: CXF, jlo, ilast):
        def stage_a(k, carry):
            H0, Gc, Gs = carry
            act = (k >= jlo) & (k <= ilast - 1)
            f = getel_cxff(H0, k, k)
            g = getel_cxff(H0, k + 1, k)
            c, s, r = givens_cxff(f, g)
            H0 = setel_cxff(H0, k, k, r, active=act)
            H0 = setel_cxff(H0, k + 1, k, zero_c, active=act)
            H0 = rowsk_cxff(H0, k, lmat_cxff(c, s), lo=k + 1, active=act)
            Gc = fvset(Gc, k, c, act)
            Gs = vset(Gs, k, s, act)
            return H0, Gc, Gs

        Gc = ones_ff((n,))
        Gs = cxff.zeros((n,))
        H0, Gc, Gs = lax.fori_loop(0, n - 1, stage_a,
                                   (fac_get(H, 0), Gc, Gs))
        H = fac_set(H, 0, H0)

        def chain_right(M: CXF, Gc, Gs: CXF, klo, khi) -> CXF:
            def body(k, M):
                act = (k >= klo) & (k <= khi)
                return colsk_cxff(M, k,
                                  rmat_adj_cxff(fvget(Gc, k), vget(Gs, k)),
                                  active=act)
            return lax.fori_loop(0, n - 1, body, M)

        if want_z:
            Z = fac_set(Z, 0, chain_right(fac_get(Z, 0), Gc, Gs,
                                          jlo, ilast - 1))

        def outer_b(t, carry):
            H, Z, Gc, Gs = carry
            l = jnp.int32(p - 1) - t

            def stage_b_pos(k, carry):
                Hl, Gc, Gs = carry
                sk = vget(Gs, k)
                act = (k >= jlo) & (k <= ilast - 1) & (~cxff.is0(sk))
                Hl = colsk_cxff(Hl, k, rmat_adj_cxff(fvget(Gc, k), sk),
                                hi=k + 2, active=act)
                tol = _habs(getel_cxff(Hl, k, k)) + \
                    _habs(getel_cxff(Hl, k + 1, k + 1))
                tol = jnp.maximum(jnp.float32(ulp) * tol,
                                  jnp.float32(smlnum))
                negl = _habs(getel_cxff(Hl, k + 1, k)) <= tol
                f = getel_cxff(Hl, k, k)
                g = getel_cxff(Hl, k + 1, k)
                c, s, r = givens_cxff(f, g)
                use = act & (~negl)
                Hl = setel_cxff(Hl, k, k, r, active=use)
                Hl = setel_cxff(Hl, k + 1, k, zero_c, active=act)
                Hl = rowsk_cxff(Hl, k, lmat_cxff(c, s), lo=k + 1,
                                active=use)
                cnew = ff.where(negl, ff.ff(jnp.float32(1.0)), c)
                snew = where(negl, cxff.zeros(()), s)
                Gc = fvset(Gc, k, cnew, act)
                Gs = vset(Gs, k, snew, act)
                return Hl, Gc, Gs

            def stage_b_neg(k, carry):
                Hl, Gc, Gs = carry
                sk = vget(Gs, k)
                act = (k >= jlo) & (k <= ilast - 1) & (~cxff.is0(sk))
                Hl = rowsk_cxff(Hl, k, lmat_cxff(fvget(Gc, k), sk),
                                lo=k, active=act)
                tol = _habs(getel_cxff(Hl, k, k)) + \
                    _habs(getel_cxff(Hl, k + 1, k + 1))
                tol = jnp.maximum(jnp.float32(ulp) * tol,
                                  jnp.float32(smlnum))
                negl = _habs(getel_cxff(Hl, k + 1, k)) <= tol
                f = getel_cxff(Hl, k + 1, k + 1)
                g = getel_cxff(Hl, k + 1, k)
                c, s, r = givens_cxff(f, g)
                use = act & (~negl)
                Hl = setel_cxff(Hl, k + 1, k + 1, r, active=use)
                Hl = setel_cxff(Hl, k + 1, k, zero_c, active=act)
                Hl = colsk_cxff(Hl, k, lmat_cxff(c, s), hi=k + 1,
                                active=use)
                cnew = ff.where(negl, ff.ff(jnp.float32(1.0)), c)
                snew = where(negl, cxff.zeros(()), neg(s))
                Gc = fvset(Gc, k, cnew, act)
                Gs = vset(Gs, k, snew, act)
                return Hl, Gc, Gs

            Hl, Gc, Gs = lax.cond(
                S_arr[jnp.clip(l, 0, p - 1)],
                lambda a: lax.fori_loop(0, n - 1, stage_b_pos, a),
                lambda a: lax.fori_loop(0, n - 1, stage_b_neg, a),
                (fac_get(H, l), Gc, Gs))
            H = fac_set(H, l, Hl)
            if want_z:
                Z = fac_set(Z, l, chain_right(fac_get(Z, l), Gc, Gs,
                                              jlo, ilast - 1))
            return H, Z, Gc, Gs

        if p > 1:
            H, Z, Gc, Gs = lax.fori_loop(0, p - 1, outer_b, (H, Z, Gc, Gs))

        def stage_c(k, carry):
            H0, zflag = carry
            act = (k >= jlo) & (k <= ilast - 1)
            sk = vget(Gs, k)
            H0 = colsk_cxff(H0, k, rmat_adj_cxff(fvget(Gc, k), sk),
                            hi=k + 2, active=act)
            zflag = zflag | (act & cxff.is0(sk))
            return H0, zflag

        H0, zflag = lax.fori_loop(0, n - 1, stage_c,
                                  (fac_get(H, 0), jnp.asarray(False)))
        H = fac_set(H, 0, H0)
        return H, Z, zflag

    return pos_core, neg_core, czshift_core
