"""Singular-triangular-factor deflation for the complex periodic QZ core.

Behavioral contract from the reference's complex `pschur!` deflation cases
(src/generalized.jl:453-566 "deflate_pos" and :568-740 "deflate_neg"): when a
diagonal entry of a triangular factor is negligible, the zero is exploited
(non-inverted factor: two unshifted half-sweeps meet at the zero; inverted
factor: the zero is chased off the top or bottom of the window), splitting
the problem without a shifted iteration.

Implementation notes (all indices 0-based; ``j`` here equals reference j-1):

* Loops over *factor position in the ring relative to the deflated factor*
  use a traced factor index, so factor matrices are accessed via
  dynamic_slice on the stacked (p, n, n) array and the per-factor behavior
  (Hessenberg / direct / inverted) dispatches through ``lax.switch``.
* Loops over *absolute factor index* are unrolled (p static) with traced
  activity masks.
* Outer chase loops are ``fori_loop`` with the body wrapped in ``lax.cond``
  on the activity predicate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .rotations import colsk, getel, givens, lmat, rmat_adj, rowsk, setel


def make_deflate_cores(*, p, n, S, dt, rdt, want_z, ulp, smlnum):
    S_arr = jnp.asarray(S)
    zero_c = jnp.zeros((), dt)

    def dget(A, l):
        return lax.dynamic_slice(A, (jnp.asarray(l, jnp.int32), jnp.int32(0),
                                     jnp.int32(0)), (1,) + A.shape[1:])[0]

    def dset(A, l, M):
        return lax.dynamic_update_slice(
            A, M[None], (jnp.asarray(l, jnp.int32), jnp.int32(0), jnp.int32(0)))

    def zup(Z, l, base, c, s):
        """Z[l] <- Z[l] * G(base, base+1, c, s)'  (static l)."""
        if not want_z:
            return Z
        return Z.at[l].set(colsk(Z[l], base, rmat_adj(c, s)))

    def zup_dyn(Z, l, base, c, s):
        """Same with traced factor index l."""
        if not want_z:
            return Z
        Zl = dget(Z, l)
        Zl = colsk(Zl, base, rmat_adj(c, s))
        return dset(Z, l, Zl)

    def chain_right_static(M, Gc, Gs, klo, khi):
        """M <- M * prod_k G(k,k+1,Gc[k],Gs[k])' for k = klo..khi ascending."""
        def bd(k, M):
            act = (k >= klo) & (k <= khi)
            return colsk(M, k, rmat_adj(Gc[k], Gs[k]), active=act)
        return lax.fori_loop(0, n - 1, bd, M)

    def chain_right_desc(M, Gc, Gs, klo, khi):
        """Descending variant: k = khi..klo; rotation k acts on (k-1, k)."""
        def bd(t, M):
            k = khi - t
            act = k >= klo
            return colsk(M, k - 1, rmat_adj(Gc[k], Gs[k]), active=act)
        return lax.fori_loop(0, n, bd, M)

    # =====================================================================
    # DEFLATE_POS (reference src/generalized.jl:453-566)
    def pos_core(H, Z, jlo, ldef, jdef, ilast):
        # zero the negligible diagonal entry of the deflated factor
        Hl = dget(H, ldef)
        Hl = setel(Hl, jdef, jdef, zero_c)
        H = dset(H, ldef, Hl)

        # ---- first unshifted half-sweep (downwards from jlo) -----------
        Gc = jnp.ones((n,), rdt)
        Gs = jnp.zeros((n,), dt)

        def a1(k, carry):
            H0, Gc, Gs = carry
            act = (k >= jlo) & (k <= jdef - 1)
            c, s, r = givens(getel(H0, k, k), getel(H0, k + 1, k))
            H0 = setel(H0, k, k, r, active=act)
            H0 = setel(H0, k + 1, k, zero_c, active=act)
            H0 = rowsk(H0, k, lmat(c, s), lo=k + 1, active=act)
            Gc = Gc.at[k].set(jnp.where(act, c, Gc[k]))
            Gs = Gs.at[k].set(jnp.where(act, s, Gs[k]))
            return H0, Gc, Gs

        H0, Gc, Gs = lax.fori_loop(0, n - 1, a1, (H[0], Gc, Gs))
        H = H.at[0].set(H0)
        if want_z:
            Z = Z.at[0].set(chain_right_static(Z[0], Gc, Gs, jlo, jdef - 1))

        for l in range(p - 1, 0, -1):
            ntra = jnp.where(l < ldef, jdef - 2, jdef - 1)
            if S[l]:
                def b1(k, carry, l=l, ntra=ntra):
                    Hl, Gc, Gs = carry
                    act = (k >= jlo) & (k <= ntra)
                    Hl = colsk(Hl, k, rmat_adj(Gc[k], Gs[k]), hi=k + 2, active=act)
                    c, s, r = givens(getel(Hl, k, k), getel(Hl, k + 1, k))
                    Hl = setel(Hl, k, k, r, active=act)
                    Hl = setel(Hl, k + 1, k, zero_c, active=act)
                    Hl = rowsk(Hl, k, lmat(c, s), lo=k + 1, active=act)
                    Gc = Gc.at[k].set(jnp.where(act, c, Gc[k]))
                    Gs = Gs.at[k].set(jnp.where(act, s, Gs[k]))
                    return Hl, Gc, Gs
            else:
                def b1(k, carry, l=l, ntra=ntra):
                    Hl, Gc, Gs = carry
                    act = (k >= jlo) & (k <= ntra)
                    Hl = rowsk(Hl, k, lmat(Gc[k], Gs[k]), lo=k, active=act)
                    c, s, r = givens(getel(Hl, k + 1, k + 1),
                                             getel(Hl, k + 1, k))
                    Hl = setel(Hl, k + 1, k + 1, r, active=act)
                    Hl = setel(Hl, k + 1, k, zero_c, active=act)
                    Hl = colsk(Hl, k, lmat(c, s), hi=k + 1, active=act)
                    Gc = Gc.at[k].set(jnp.where(act, c, Gc[k]))
                    Gs = Gs.at[k].set(jnp.where(act, -s, Gs[k]))
                    return Hl, Gc, Gs

            Hl, Gc, Gs = lax.fori_loop(0, n - 1, b1, (H[l], Gc, Gs))
            H = H.at[l].set(Hl)
            if want_z:
                Z = Z.at[l].set(chain_right_static(Z[l], Gc, Gs, jlo, ntra))

        def c1(k, H0):
            act = (k >= jlo) & (k <= jdef - 2)
            return colsk(H0, k, rmat_adj(Gc[k], Gs[k]), hi=k + 2, active=act)

        H = H.at[0].set(lax.fori_loop(0, n - 1, c1, H[0]))

        # ---- second unshifted half-sweep (upwards from ilast) ----------
        G2c = jnp.ones((n,), rdt)
        G2s = jnp.zeros((n,), dt)

        def a2(t, carry):
            H0, G2c, G2s = carry
            j = ilast - t
            act = j >= jdef + 1
            c, s, r = givens(getel(H0, j, j), getel(H0, j, j - 1))
            H0 = setel(H0, j, j, r, active=act)
            H0 = setel(H0, j, j - 1, zero_c, active=act)
            H0 = colsk(H0, j - 1, lmat(c, s), hi=j, active=act)
            G2c = G2c.at[j].set(jnp.where(act, c, G2c[j]))
            G2s = G2s.at[j].set(jnp.where(act, -s, G2s[j]))
            return H0, G2c, G2s

        H0, G2c, G2s = lax.fori_loop(0, n, a2, (H[0], G2c, G2s))
        H = H.at[0].set(H0)
        if want_z:
            Z = Z.at[1 % p].set(
                chain_right_desc(Z[1 % p], G2c, G2s, jdef + 1, ilast))

        for l in range(1, p):
            ntra = jnp.where(l > ldef, jdef + 2, jdef + 1)
            if not S[l]:
                def b2(t, carry, l=l, ntra=ntra):
                    Hl, G2c, G2s = carry
                    j = ilast - t
                    act = j >= ntra
                    Hl = colsk(Hl, j - 1, rmat_adj(G2c[j], G2s[j]), hi=j + 1,
                               active=act)
                    c, s, r = givens(getel(Hl, j - 1, j - 1),
                                             getel(Hl, j, j - 1))
                    Hl = setel(Hl, j - 1, j - 1, r, active=act)
                    Hl = setel(Hl, j, j - 1, zero_c, active=act)
                    Hl = rowsk(Hl, j - 1, lmat(c, s), lo=j, active=act)
                    G2c = G2c.at[j].set(jnp.where(act, c, G2c[j]))
                    G2s = G2s.at[j].set(jnp.where(act, s, G2s[j]))
                    return Hl, G2c, G2s
            else:
                def b2(t, carry, l=l, ntra=ntra):
                    Hl, G2c, G2s = carry
                    j = ilast - t
                    act = j >= ntra
                    Hl = rowsk(Hl, j - 1, lmat(G2c[j], G2s[j]), lo=j - 1,
                               active=act)
                    c, s, r = givens(getel(Hl, j, j), getel(Hl, j, j - 1))
                    Hl = setel(Hl, j, j, r, active=act)
                    Hl = setel(Hl, j, j - 1, zero_c, active=act)
                    Hl = colsk(Hl, j - 1, lmat(c, s), hi=j, active=act)
                    G2c = G2c.at[j].set(jnp.where(act, c, G2c[j]))
                    G2s = G2s.at[j].set(jnp.where(act, -s, G2s[j]))
                    return Hl, G2c, G2s

            Hl, G2c, G2s = lax.fori_loop(0, n, b2, (H[l], G2c, G2s))
            H = H.at[l].set(Hl)
            if want_z:
                Z = Z.at[(l + 1) % p].set(
                    chain_right_desc(Z[(l + 1) % p], G2c, G2s, ntra, ilast))

        def c2(t, H0):
            j = ilast - t
            act = j >= jdef + 2
            return rowsk(H0, j - 1, lmat(G2c[j], G2s[j]), lo=j - 1, active=act)

        H = H.at[0].set(lax.fori_loop(0, n, c2, H[0]))
        return H, Z

    # =====================================================================
    # DEFLATE_NEG (reference src/generalized.jl:568-740)

    # ring-walk branch bodies; operand = (Hln, j, c, s), return same shape.
    # chase-down variants:
    def hess_dn(op):
        Hln, j, c, s = op
        Hln = rowsk(Hln, j, lmat(c, s), lo=j - 1)
        cn, sn, r = givens(getel(Hln, j + 1, j), getel(Hln, j + 1, j - 1))
        Hln = setel(Hln, j + 1, j, r)
        Hln = setel(Hln, j + 1, j - 1, zero_c)
        Hln = colsk(Hln, j - 1, lmat(cn, sn), hi=j + 1)
        return Hln, j - 1, cn, -sn

    def pos_dn(op):
        Hln, j, c, s = op
        Hln = rowsk(Hln, j, lmat(c, s), lo=j)
        cn, sn, r = givens(getel(Hln, j + 1, j + 1), getel(Hln, j + 1, j))
        Hln = setel(Hln, j + 1, j + 1, r)
        Hln = setel(Hln, j + 1, j, zero_c)
        Hln = colsk(Hln, j, lmat(cn, sn), hi=j + 1)
        return Hln, j, cn, -sn

    def neg_dn(op):
        Hln, j, c, s = op
        Hln = colsk(Hln, j, rmat_adj(c, s), hi=j + 2)
        cn, sn, r = givens(getel(Hln, j, j), getel(Hln, j + 1, j))
        Hln = setel(Hln, j, j, r)
        Hln = setel(Hln, j + 1, j, zero_c)
        Hln = rowsk(Hln, j, lmat(cn, sn), lo=j + 1)
        return Hln, j, cn, sn

    # chase-up variants:
    def hess_up(op):
        Hln, j, c, s = op
        Hln = colsk(Hln, j - 1, rmat_adj(c, s), hi=j + 2)
        cn, sn, r = givens(getel(Hln, j, j - 1), getel(Hln, j + 1, j - 1))
        Hln = setel(Hln, j, j - 1, r)
        Hln = setel(Hln, j + 1, j - 1, zero_c)
        Hln = rowsk(Hln, j, lmat(cn, sn), lo=j)
        return Hln, j + 1, cn, sn

    def neg_up(op):
        Hln, j, c, s = op
        Hln = rowsk(Hln, j - 1, lmat(c, s), lo=j - 1)
        cn, sn, r = givens(getel(Hln, j, j), getel(Hln, j, j - 1))
        Hln = setel(Hln, j, j, r)
        Hln = setel(Hln, j, j - 1, zero_c)
        Hln = colsk(Hln, j - 1, lmat(cn, sn), hi=j)
        return Hln, j, cn, -sn

    def pos_up(op):
        Hln, j, c, s = op
        Hln = colsk(Hln, j - 1, rmat_adj(c, s), hi=j + 1)
        cn, sn, r = givens(getel(Hln, j - 1, j - 1), getel(Hln, j, j - 1))
        Hln = setel(Hln, j - 1, j - 1, r)
        Hln = setel(Hln, j, j - 1, zero_c)
        Hln = rowsk(Hln, j - 1, lmat(cn, sn), lo=j)
        return Hln, j, cn, sn

    def neg_core(H, Z, jlo, ldef, jdef, ilast):
        Hl = dget(H, ldef)
        Hl = setel(Hl, jdef, jdef, zero_c)
        H = dset(H, ldef, Hl)

        bottom = (jdef + 1).astype(rdt) > (ilast - jlo + 1).astype(rdt) / 2

        # ------------------------------------------------ chase down ----
        def chase_down(HZ):
            H, Z = HZ

            def outer(j1, HZ):
                H, Z = HZ

                def run(HZ):
                    H, Z = HZ
                    j = j1
                    Hl = dget(H, ldef)
                    c, s, r = givens(getel(Hl, j, j + 1),
                                             getel(Hl, j + 1, j + 1))
                    Hl = setel(Hl, j, j + 1, r)
                    Hl = setel(Hl, j + 1, j + 1, zero_c)
                    Hl = rowsk(Hl, j, lmat(c, s), lo=j + 2)
                    H = dset(H, ldef, Hl)
                    ln = (ldef + 1) % p
                    Z = zup_dyn(Z, ln, j, c, s)

                    def step(t, carry):
                        H, Z, j, c, s, ln = carry
                        Hln = dget(H, ln)
                        bidx = jnp.where(ln == 0, 0,
                                         jnp.where(S_arr[ln], 1, 2))
                        Hln, j, c, s = lax.switch(
                            bidx, [hess_dn, pos_dn, neg_dn], (Hln, j, c, s))
                        H = dset(H, ln, Hln)
                        ln = (ln + 1) % p
                        Z = zup_dyn(Z, ln, j, c, s)
                        return H, Z, j, c, s, ln

                    H, Z, j, c, s, ln = lax.fori_loop(
                        0, p - 1, step, (H, Z, j, c, s, ln))
                    Hl = dget(H, ldef)
                    Hl = colsk(Hl, j, rmat_adj(c, s), hi=j + 1)
                    H = dset(H, ldef, Hl)
                    return H, Z

                act = (j1 >= jdef) & (j1 <= ilast - 1)
                return lax.cond(act, run, lambda x: x, (H, Z))

            H, Z = lax.fori_loop(0, n, outer, (H, Z))

            # deflate the last element of the Hessenberg factor
            j = ilast
            H0 = H[0]
            c, s, r = givens(getel(H0, j, j), getel(H0, j, j - 1))
            H0 = setel(H0, j, j, r)
            H0 = setel(H0, j, j - 1, zero_c)
            H0 = colsk(H0, j - 1, lmat(c, s), hi=j)
            H = H.at[0].set(H0)
            c2, s2 = c, -s
            Z = zup(Z, 1 % p, j - 1, c2, s2)
            for l in range(1, p):
                act = l < ldef

                def run2(HZcs, l=l):
                    H, Z, c2, s2 = HZcs
                    Hl = H[l]
                    if not S[l]:
                        Hl = colsk(Hl, j - 1, rmat_adj(c2, s2), hi=j + 1)
                        cn, sn, r = givens(getel(Hl, j - 1, j - 1),
                                                   getel(Hl, j, j - 1))
                        Hl = setel(Hl, j - 1, j - 1, r)
                        Hl = setel(Hl, j, j - 1, zero_c)
                        Hl = rowsk(Hl, j - 1, lmat(cn, sn), lo=j)
                        cf, sf = cn, sn
                    else:
                        Hl = rowsk(Hl, j - 1, lmat(c2, s2), lo=j - 1)
                        cn, sn, r = givens(getel(Hl, j, j),
                                                   getel(Hl, j, j - 1))
                        Hl = setel(Hl, j, j, r)
                        Hl = setel(Hl, j, j - 1, zero_c)
                        Hl = colsk(Hl, j - 1, lmat(cn, sn), hi=j)
                        cf, sf = cn, -sn
                    H = H.at[l].set(Hl)
                    Z = zup(Z, (l + 1) % p, j - 1, cf, sf)
                    return H, Z, cf, sf

                H, Z, c2, s2 = lax.cond(act, run2, lambda x: x, (H, Z, c2, s2))
            Hl = dget(H, ldef)
            Hl = colsk(Hl, j - 1, rmat_adj(c2, s2), hi=j + 1)
            H = dset(H, ldef, Hl)
            return H, Z

        # ------------------------------------------------ chase up ------
        def chase_up(HZ):
            H, Z = HZ

            def outer(t, HZ):
                H, Z = HZ
                j1 = jdef - t

                def run(HZ):
                    H, Z = HZ
                    j = j1
                    Hl = dget(H, ldef)
                    c, s, r = givens(getel(Hl, j - 1, j),
                                             getel(Hl, j - 1, j - 1))
                    Hl = setel(Hl, j - 1, j, r)
                    Hl = setel(Hl, j - 1, j - 1, zero_c)
                    Hl = colsk(Hl, j - 1, lmat(c, s), hi=j - 1)
                    H = dset(H, ldef, Hl)
                    c, s = c, -s
                    Z = zup_dyn(Z, ldef, j - 1, c, s)
                    ln = (ldef - 1) % p

                    def step(t2, carry):
                        H, Z, j, c, s, ln = carry
                        Hln = dget(H, ln)
                        bidx = jnp.where(ln == 0, 0,
                                         jnp.where(S_arr[ln], 1, 2))
                        Hln, j, c, s = lax.switch(
                            bidx, [hess_up, pos_up, neg_up], (Hln, j, c, s))
                        H = dset(H, ln, Hln)
                        Z = zup_dyn(Z, ln, j - 1, c, s)
                        ln = (ln - 1) % p
                        return H, Z, j, c, s, ln

                    H, Z, j, c, s, ln = lax.fori_loop(
                        0, p - 1, step, (H, Z, j, c, s, ln))
                    Hl = dget(H, ldef)
                    Hl = rowsk(Hl, j - 1, lmat(c, s), lo=j)
                    H = dset(H, ldef, Hl)
                    return H, Z

                act = (j1 >= jlo + 1) & (j1 <= jdef)
                return lax.cond(act, run, lambda x: x, (H, Z))

            H, Z = lax.fori_loop(0, n, outer, (H, Z))

            # deflate the first element of the Hessenberg factor
            j = jlo
            H0 = H[0]
            c, s, r = givens(getel(H0, j, j), getel(H0, j + 1, j))
            H0 = setel(H0, j, j, r)
            H0 = setel(H0, j + 1, j, zero_c)
            H0 = rowsk(H0, j, lmat(c, s), lo=j + 1)
            H = H.at[0].set(H0)
            c2, s2 = c, s
            Z = zup(Z, 0, j, c2, s2)
            for l in range(p - 1, 0, -1):
                act = l > ldef

                def run2(HZcs, l=l):
                    H, Z, c2, s2 = HZcs
                    Hl = H[l]
                    if S[l]:
                        Hl = colsk(Hl, j, rmat_adj(c2, s2), hi=j + 2)
                        cn, sn, r = givens(getel(Hl, j, j),
                                                   getel(Hl, j + 1, j))
                        Hl = setel(Hl, j, j, r)
                        Hl = setel(Hl, j + 1, j, zero_c)
                        Hl = rowsk(Hl, j, lmat(cn, sn), lo=j + 1)
                        cf, sf = cn, sn
                    else:
                        Hl = rowsk(Hl, j, lmat(c2, s2), lo=j)
                        cn, sn, r = givens(getel(Hl, j + 1, j + 1),
                                                   getel(Hl, j + 1, j))
                        Hl = setel(Hl, j + 1, j + 1, r)
                        Hl = setel(Hl, j + 1, j, zero_c)
                        Hl = colsk(Hl, j, lmat(cn, sn), hi=j + 1)
                        cf, sf = cn, -sn
                    H = H.at[l].set(Hl)
                    Z = zup(Z, l, j, cf, sf)
                    return H, Z, cf, sf

                H, Z, c2, s2 = lax.cond(act, run2, lambda x: x, (H, Z, c2, s2))
            Hl = dget(H, ldef)
            Hl = rowsk(Hl, j, lmat(c2, s2), lo=j + 1)
            H = dset(H, ldef, Hl)
            return H, Z

        H, Z = lax.cond(bottom, chase_down, chase_up, (H, Z))
        return H, Z

    # =====================================================================
    # ------------------------------------------------------------------
    # controlled zero shift (reference src/generalized.jl:356-448; identical
    # structure in the real core, src/rgeneralized.jl:229-324)
    def czshift_core(H, Z, jlo, ilast):

        # stage A: triangularize the Hessenberg factor on [jlo, ilast]
        def stage_a(k, carry):
            H0, Gc, Gs = carry
            act = (k >= jlo) & (k <= ilast - 1)
            f = getel(H0, k, k)
            g = getel(H0, k + 1, k)
            c, s, r = givens(f, g)
            H0 = setel(H0, k, k, r, active=act)
            H0 = setel(H0, k + 1, k, jnp.zeros((), dt), active=act)
            H0 = rowsk(H0, k, lmat(c, s), lo=k + 1, active=act)
            Gc = Gc.at[k].set(jnp.where(act, c, Gc[k]))
            Gs = Gs.at[k].set(jnp.where(act, s, Gs[k]))
            return H0, Gc, Gs

        Gc = jnp.ones((n,), rdt)
        Gs = jnp.zeros((n,), dt)
        H0, Gc, Gs = lax.fori_loop(0, n - 1, stage_a, (H[0], Gc, Gs))
        H = H.at[0].set(H0)

        def chain_right(M, Gc, Gs, klo, khi):
            """Apply the stored chain to columns of M (full row range)."""
            def body(k, M):
                act = (k >= klo) & (k <= khi)
                return colsk(M, k, rmat_adj(Gc[k], Gs[k]), active=act)
            return lax.fori_loop(0, n - 1, body, M)

        if want_z:
            Z = Z.at[0].set(chain_right(Z[0], Gc, Gs, jlo, ilast - 1))

        # stage B: propagate backwards through the triangular factors
        for l in range(p - 1, 0, -1):
            if S[l]:
                def stage_b_pos(k, carry):
                    Hl, Gc, Gs = carry
                    act = (k >= jlo) & (k <= ilast - 1) & (Gs[k] != 0)
                    Hl = colsk(Hl, k, rmat_adj(Gc[k], Gs[k]), hi=k + 2, active=act)
                    tol = jnp.abs(getel(Hl, k, k)) + jnp.abs(getel(Hl, k + 1, k + 1))
                    tol = jnp.maximum(ulp * tol, smlnum)
                    negl = jnp.abs(getel(Hl, k + 1, k)) <= tol
                    f = getel(Hl, k, k)
                    g = getel(Hl, k + 1, k)
                    c, s, r = givens(f, g)
                    use = act & (~negl)
                    Hl = setel(Hl, k, k, r, active=use)
                    Hl = setel(Hl, k + 1, k, jnp.zeros((), dt), active=act)
                    Hl = rowsk(Hl, k, lmat(c, s), lo=k + 1, active=use)
                    cnew = jnp.where(negl, jnp.ones((), rdt), c)
                    snew = jnp.where(negl, jnp.zeros((), dt), s)
                    Gc = Gc.at[k].set(jnp.where(act, cnew, Gc[k]))
                    Gs = Gs.at[k].set(jnp.where(act, snew, Gs[k]))
                    return Hl, Gc, Gs

                Hl, Gc, Gs = lax.fori_loop(0, n - 1, stage_b_pos, (H[l], Gc, Gs))
            else:
                def stage_b_neg(k, carry):
                    Hl, Gc, Gs = carry
                    act = (k >= jlo) & (k <= ilast - 1) & (Gs[k] != 0)
                    Hl = rowsk(Hl, k, lmat(Gc[k], Gs[k]), lo=k, active=act)
                    tol = jnp.abs(getel(Hl, k, k)) + jnp.abs(getel(Hl, k + 1, k + 1))
                    tol = jnp.maximum(ulp * tol, smlnum)
                    negl = jnp.abs(getel(Hl, k + 1, k)) <= tol
                    f = getel(Hl, k + 1, k + 1)
                    g = getel(Hl, k + 1, k)
                    c, s, r = givens(f, g)
                    use = act & (~negl)
                    Hl = setel(Hl, k + 1, k + 1, r, active=use)
                    Hl = setel(Hl, k + 1, k, jnp.zeros((), dt), active=act)
                    # rmul!(view(Hl, 1:j, :), Givens(j+1, j, c, s')') == right
                    # multiply pair (k, k+1) by lmat(c, s) on rows [0, k]
                    Hl = colsk(Hl, k, lmat(c, s), hi=k + 1, active=use)
                    cnew = jnp.where(negl, jnp.ones((), rdt), c)
                    snew = jnp.where(negl, jnp.zeros((), dt), -s)
                    Gc = Gc.at[k].set(jnp.where(act, cnew, Gc[k]))
                    Gs = Gs.at[k].set(jnp.where(act, snew, Gs[k]))
                    return Hl, Gc, Gs

                Hl, Gc, Gs = lax.fori_loop(0, n - 1, stage_b_neg, (H[l], Gc, Gs))
            H = H.at[l].set(Hl)
            if want_z:
                Z = Z.at[l].set(chain_right(Z[l], Gc, Gs, jlo, ilast - 1))

        # stage C: apply final chain to the right side of the Hessenberg
        def stage_c(k, carry):
            H0, zflag = carry
            act = (k >= jlo) & (k <= ilast - 1)
            H0 = colsk(H0, k, rmat_adj(Gc[k], Gs[k]), hi=k + 2, active=act)
            zflag = zflag | (act & (Gs[k] == 0))
            return H0, zflag

        H0, zflag = lax.fori_loop(0, n - 1, stage_c, (H[0], jnp.asarray(False)))
        H = H.at[0].set(H0)
        return H, Z, zflag


    return pos_core, neg_core, czshift_core
