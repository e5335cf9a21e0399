"""Float-float real generalized periodic QZ core: the contract-grade TPU path.

Same algorithm as :mod:`.pqz_real` (MB03BD semantics, reference
src/rgeneralized.jl:49-1083) with every matrix entry carried as an
``ff.FF`` (hi, lo) float-float pair: exact EFT arithmetic at f32 hardware
speed, ~2^-48 roundoff — which is what meets the <=1e-12 backward-error
contract ON the axon chip.  The plain-f64 core of pqz_real.py runs
on-chip only at the x64-rewriter's emulated-f64 floor (weak add under
cancellation, ~7e-11), so it remains the exact CPU path while this core
is the production off-CPU route.

Precision policy (mirrors ops/pqr_ff.py / ops/pqz_complex_ff.py):

* rotation generation and every H/Z update run in ds (ffkern.givens_ff,
  ffslab slab ops);
* PRODUCT-level quantities — shifts (opening rotations from scaled
  window-block products), 2x2 block eigenvalues, decomposed
  (alpha, beta, scale) eigenvalue accumulation — run in emulated f64 on
  hi+lo views (threshold/shift-grade accuracy is all they need, and the
  scaled-product machinery of pqz_real.py needs f64's exponent range);
* negligibility thresholds compare f32 hi components at the ds ulp.

The singular-factor deflation framework (deflate_pos / deflate_neg /
controlled zero shift) is REUSED from the split-complex ds fork
(ops/pqz_deflate_ff.py) through a zero-imaginary CXF shim: on real data
every complex Givens the chains generate is exactly real (the imaginary
components are exact zeros under the EFTs), so the shim is value-exact,
and XLA dead-code-eliminates most of the discarded imaginary dataflow.
This mirrors how pqz_real.py shares pqz_deflate.make_deflate_cores with
the complex f64 core.

Chunked execution: the axon runtime kills any single device execute
after ~60 s; ``pqz_real_gen_core_ff_chunked`` runs the while_loop in
resumable it_cap segments (same device as pqr_real_core_ff_chunked).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.safeprod import safeprod_signed
from . import ff
from .cxff import CXF
from .ff import FF
from .ffkern import givens_ff
from .ffslab import (at_set, colsk_ff, getcol_ff, getel_ff, getrow_ff,
                     rowsk_ff, setcol_ff, setel_ff, setrow_ff)
from .pqz_real import _opening_rotations, eig2x2_product, rp2x2ssr


def _rg_ladder_auto(p: int, n: int, want_z: bool,
                    interpret: bool) -> bool:
    """Routing for the fused rg opening/closing ladders (pallas_rgopen).

    ON on the chip when the padded state fits the bisected Mosaic VMEM
    ceiling; OFF on CPU (glue is exact there; the kernels are
    interpret-tested via PSD_RG_KERNEL=1).  Mirrors _deflate_kernel_auto.
    """
    import os as _os

    from .pallas_rgopen import rg_kernel_fits
    Np = n if n <= 128 else ((n + 16 + 7) // 8) * 8
    env = _os.environ.get("PSD_RG_KERNEL", "")
    if env == "0":
        return False
    if env == "1":
        return rg_kernel_fits(p, Np, want_z)
    if interpret:
        return False
    dev = jax.config.jax_default_device
    plat = dev.platform if dev is not None else jax.default_backend()
    if plat == "cpu":
        return False
    return rg_kernel_fits(p, Np, want_z)


def _d64(x: FF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def _split64(x):
    hi = x.astype(jnp.float32)
    return FF(hi, (x - hi.astype(jnp.float64)).astype(jnp.float32))


def _lmat_ff(c: FF, s: FF) -> FF:
    return ff.stack([ff.stack([c, s], 0),
                     ff.stack([ff.neg(s), c], 0)], 0)


def _rmat_adj_ff(c: FF, s: FF) -> FF:
    return ff.stack([ff.stack([c, ff.neg(s)], 0),
                     ff.stack([s, c], 0)], 0)


@partial(jax.jit, static_argnames=("S", "want_z", "maxitfac", "with_info",
                                   "aggressive", "want_t", "return_state",
                                   "pallas_sweep", "interpret",
                                   "defer_deflate"))
def pqz_real_gen_core_ff(
    Hhi: jax.Array,
    Hlo: jax.Array,
    S: Tuple[bool, ...],
    Z2: Optional[Tuple[jax.Array, jax.Array]] = None,
    want_z: bool = True,
    maxitfac: int = 120,
    seed: int = 1234,
    with_info: bool = False,
    aggressive: bool = False,
    want_t: bool = True,
    it_cap: Optional[jax.Array] = None,
    resume_state=None,
    return_state: bool = False,
    pallas_sweep: bool = False,
    interpret: bool = False,
    defer_deflate: bool = False,
):
    """Run the ds real generalized periodic QZ iteration.

    ``defer_deflate``: the singular-factor deflation branches EXIT the
    while loop as a request (dreq field of the loop carry); the chunked
    driver fulfils them through lazily-jitted functions
    (:func:`_deferred_fns_rg`) — they dominate the compile time, and
    their cases are rare.

    Args:
      Hhi, Hlo: (p, n, n) f32 pair; H[0] Hessenberg, H[1:] triangular.  On
        RESUME calls pass the ORIGINAL inputs unchanged.
      S: static signature, S[0] True, p >= 2.
      Z2: optional initial orthogonal stack as an (hi, lo) pair.
      pallas_sweep / interpret: run the double-shift chase as the fused
        Pallas kernel triple of ops/pallas_sweep_rg.py (off-CPU default;
        interpret=True for CPU tests of that path).

    Returns (Thi, Tlo, Zhi, Zlo, alpha_r, alpha_i, beta, alphascale, ok
    [, czbail when aggressive]) — alpha in (emulated) f64, beta f32.
    """
    p, n, _ = Hhi.shape
    assert S[0], "signature entry S[0] must be True"
    assert p >= 2, "use pqr_real_core_ff for p == 1"
    ulp = float(ff.EPS)
    unfl = 1.175494e-38
    smlnum = unfl * (n / ulp)
    maxit = maxitfac * n
    f64 = jnp.float64
    ziter0 = -1 if p >= math.log2(2.2250738585072014e-308) / \
        math.log2(2.220446049250313e-16) else 0

    H = FF(Hhi, Hlo)
    if want_z:
        if Z2 is None:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
            Z = FF(eye, jnp.zeros((p, n, n), jnp.float32))
        else:
            Z = FF(Z2[0], Z2[1])
    else:
        Z = FF(jnp.zeros((p, 1, 1), jnp.float32),
               jnp.zeros((p, 1, 1), jnp.float32))

    if n == 1:
        a, b, s = safeprod_signed(_d64(FF(Hhi[:, 0, 0], Hlo[:, 0, 0])), S)
        zout = (Z.hi, Z.lo) if want_z else (None, None)
        return (Hhi, Hlo) + zout + (a[None], jnp.zeros((1,), f64),
                                    b.astype(jnp.float32)[None], s[None],
                                    jnp.asarray(True))

    # aggressive deflation: fixed per-factor thresholds (pqz_real.py note)
    safmin = unfl
    hnorms_in = jnp.max(jnp.sum(jnp.abs(Hhi), axis=1), axis=1)
    agg_tol = jnp.maximum(jnp.float32(safmin),
                          hnorms_in * jnp.float32(ulp))

    # deflation cores through the zero-imaginary CXF shim (module doc)
    from .pqz_deflate_ff import make_deflate_cores_ff
    pos_cx, neg_cx, cz_cx = make_deflate_cores_ff(
        p=p, n=n, S=S, want_z=want_z, ulp=ulp, smlnum=smlnum)

    use_rg_ladders = bool(pallas_sweep) and _rg_ladder_auto(
        p, n, want_z, interpret)

    def _to_cx(X: FF) -> CXF:
        zi = jnp.zeros_like(X.hi)
        return CXF(X, FF(zi, zi))

    iv = jnp.arange(n, dtype=jnp.int32)
    zero = ff.zeros(())
    key0 = jax.random.PRNGKey(seed)

    def zup(Z, l, k, M: FF, active=None):
        if not want_z:
            return Z
        return at_set(Z, l, colsk_ff(FF(Z.hi[l], Z.lo[l]), k, M,
                                     active=active))

    # --- shared "510" single-rotation chain (pqz_real.chain510, ds) ------
    def chain510_ff(H, Z, j, c1: FF, s1: FF, wlo=None, whi=None):
        H = at_set(H, 0, rowsk_ff(FF(H.hi[0], H.lo[0]), j,
                                  _lmat_ff(c1, s1), lo=j, hi=whi))
        Z = zup(Z, 0, j, _rmat_adj_ff(c1, s1))
        for l in range(p - 1, 0, -1):
            Hl = FF(H.hi[l], H.lo[l])
            if S[l]:
                Hl = colsk_ff(Hl, j, _rmat_adj_ff(c1, s1), lo=wlo, hi=j + 2)
                c1, s1, r = givens_ff(getel_ff(Hl, j, j),
                                      getel_ff(Hl, j + 1, j))
                Hl = setel_ff(Hl, j, j, r)
                Hl = setel_ff(Hl, j + 1, j, zero)
                Hl = rowsk_ff(Hl, j, _lmat_ff(c1, s1), lo=j + 1, hi=whi)
            else:
                Hl = rowsk_ff(Hl, j, _lmat_ff(c1, s1), lo=j, hi=whi)
                c1, s1, r = givens_ff(getel_ff(Hl, j + 1, j + 1),
                                      ff.neg(getel_ff(Hl, j + 1, j)))
                Hl = setel_ff(Hl, j + 1, j + 1, r)
                Hl = setel_ff(Hl, j + 1, j, zero)
                Hl = colsk_ff(Hl, j, _rmat_adj_ff(c1, s1), lo=wlo, hi=j + 1)
            H = at_set(H, l, Hl)
            Z = zup(Z, l, j, _rmat_adj_ff(c1, s1))
        H = at_set(H, 0, colsk_ff(FF(H.hi[0], H.lo[0]), j,
                                  _rmat_adj_ff(c1, s1), lo=wlo))
        return H, Z

    # ------------------------------------------------------------------
    def act_split(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        ilc = jnp.clip(ilast, 0, n - 1)
        dh = lax.dynamic_slice(H.hi, (jnp.int32(0), ilc, ilc),
                               (p, 1, 1))[:, 0, 0]
        dl = lax.dynamic_slice(H.lo, (jnp.int32(0), ilc, ilc),
                               (p, 1, 1))[:, 0, 0]
        a, b, s = safeprod_signed(_d64(FF(dh, dl)), S)
        alr = alr.at[ilc].set(a)
        ali = ali.at[ilc].set(0.0)
        be = be.at[ilc].set(b.astype(jnp.float32))
        sc = sc.at[ilc].set(s)
        ilast = ilast - 1
        iiter = jnp.int32(0)
        ziter = jnp.where(ziter != -1, jnp.int32(0), ziter)
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    def act_pos(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        Hc, Zc = pos_cx(_to_cx(H), _to_cx(Z), info["jlo"], info["ldef"],
                        info["jdef"], ilast)
        return (Hc.re, Zc.re if want_z else Z, alr, ali, be, sc, ilast,
                iiter, ziter, key)

    def act_neg(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        Hc, Zc = neg_cx(_to_cx(H), _to_cx(Z), info["jlo"], info["ldef"],
                        info["jdef"], ilast)
        return (Hc.re, Zc.re if want_z else Z, alr, ali, be, sc, ilast,
                iiter, ziter, key)

    def act_czshift(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        if aggressive:
            # reference NotImplements this combination
            # (src/rgeneralized.jl:245-247)
            return (H, Z, alr, ali, be, sc, jnp.int32(-5), iiter, ziter,
                    key)
        Hc, Zc, zflag = cz_cx(_to_cx(H), _to_cx(Z), info["jlo"], ilast)
        ziter = jnp.where(zflag, jnp.int32(1), jnp.int32(0))
        return (Hc.re, Zc.re if want_z else Z, alr, ali, be, sc, ilast,
                iiter, ziter, key)

    # --- trailing 2x2 block attack (pqz_real.act_attack; windows f64) ----
    def act_attack(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        j = ilast - 1

        def win2(l):
            wh = lax.dynamic_slice(H.hi[l], (j, j), (2, 2))
            wl = lax.dynamic_slice(H.lo[l], (j, j), (2, 2))
            return wh.astype(f64) + wl.astype(f64)

        W = jnp.stack([win2(l) for l in range(p)])
        B = jnp.stack([W[(t + 1) % p] for t in range(p)])
        S2 = tuple(S[(t + 1) % p] for t in range(p))
        B, done2 = rp2x2ssr(B, S2)

        def real_pair(HZ):
            H, Z = HZ
            # perfect-shift cascade (reference :695-709) at shift grade
            # in f64; the chain itself runs in ds
            from .rotations import givens_real
            one = jnp.ones((), f64)
            c1, s1 = one, one
            for l in range(p - 1, 0, -1):
                r = B[l - 1][1, 1]
                hjj = _d64(getel_ff(FF(H.hi[l], H.lo[l]), j, j))
                if S[l]:
                    c1, s1, _ = givens_real(c1 * hjj, s1 * r)
                else:
                    c1, s1, _ = givens_real(c1 * r, s1 * hjj)
            r = B[p - 1][1, 1]
            H0f = FF(H.hi[0], H.lo[0])
            c1f, s1f, _ = givens_real(
                c1 * _d64(getel_ff(H0f, j, j)) - r * s1,
                c1 * _d64(getel_ff(H0f, j + 1, j)))
            wlo = None if want_t else info["jlo"]
            whi = None if want_t else ilast + 1
            if use_rg_ladders:
                # fused chain510 (pallas_rgopen mode "chain"): the 2x2
                # attack fires per converged pair and its ds ladder is
                # another ~1.9k-barrier launch storm (round-5 census)
                from .pallas_rgopen import rg_chain510_ff
                return rg_chain510_ff(H, Z, j, _split64(c1f),
                                      _split64(s1f), S, rhi=whi,
                                      clo=wlo, want_z=want_z,
                                      interpret=interpret)
            return chain510_ff(H, Z, j, _split64(c1f), _split64(s1f),
                               wlo=wlo, whi=whi)

        H, Z = lax.cond(done2, real_pair, lambda x: x, (H, Z))

        w1r, w1i, w2r, w2i, s1c, s2c, bflag = eig2x2_product(W, S)
        wi_abs = jnp.abs(w1i)
        upd = ~done2
        alr = jnp.where(upd, alr.at[j].set(w1r).at[j + 1].set(w1r), alr)
        ali = jnp.where(upd, ali.at[j].set(wi_abs).at[j + 1].set(-wi_abs),
                        ali)
        bef = bflag.astype(jnp.float32)
        be = jnp.where(upd, be.at[j].set(bef).at[j + 1].set(bef), be)
        sc = jnp.where(upd, sc.at[j].set(s1c).at[j + 1].set(s2c), sc)
        ilast = jnp.where(upd, ilast - 2, ilast)
        iiter = jnp.where(upd, jnp.int32(0), iiter)
        ziter = jnp.where(upd & (ziter != -1), jnp.int32(0), ziter)
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    # --- double-implicit-shift sweep (pqz_real.act_sweep, ds) ------------
    def act_sweep(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        ifirst = info["jlo"]
        iiter = iiter + 1
        ziter = ziter + 1
        # shift-level opening rotations from f64 views of hi+lo (scaled
        # window-block products need f64's exponent range; pqz_real doc)
        H64 = H.hi.astype(f64) + H.lo.astype(f64)
        c1d, s1d, c2d, s2d, key = _opening_rotations(H64, S, ifirst, ilast,
                                                     key, iiter)
        c1, s1 = _split64(c1d), _split64(s1d)
        c2, s2 = _split64(c2d), _split64(s2d)
        rhi = None if want_t else ilast + 1
        clo = None if want_t else ifirst

        if use_rg_ladders:
            # fused opening/closing ladders (ops/pallas_rgopen.py): the
            # two XLA-glue rotation chains around the Pallas chase are
            # ~5.8k barrier layers per sweep iteration — the rg core's
            # dominant fixed cost (round-5 census).  Bitwise-equal
            # (tests/test_pallas_rgopen.py); PSD_RG_KERNEL=0/1 overrides.
            from .pallas_rgopen import rg_closing_ff, rg_opening_ff
            from .pallas_sweep_rg import rg_chase_sweep_ff
            H, Z = rg_opening_ff(H, Z, ifirst, ilast, c1, s1, c2, s2, S,
                                 rhi=rhi, clo=clo, want_z=want_z,
                                 interpret=interpret)
            Zq = Z if want_z else None
            H, Zq = rg_chase_sweep_ff(H, Zq, ifirst + 1, ilast, S=S,
                                      want_z=want_z, interpret=interpret)
            if want_z:
                Z = Zq
            H, Z = rg_closing_ff(H, Z, ilast - 1, ilast, S, rhi=rhi,
                                 clo=clo, want_z=want_z,
                                 interpret=interpret)
            return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

        # opening (reference :890-943); j = ifirst
        j = ifirst
        H0 = colsk_ff(FF(H.hi[0], H.lo[0]), j + 1, _rmat_adj_ff(c2, s2),
                      lo=clo, hi=ilast + 1)
        H0 = colsk_ff(H0, j, _rmat_adj_ff(c1, s1), lo=clo, hi=ilast + 1)
        H = at_set(H, 0, H0)
        Z = zup(Z, 1 % p, j + 1, _rmat_adj_ff(c2, s2))
        Z = zup(Z, 1 % p, j, _rmat_adj_ff(c1, s1))
        for l in range(1, p):
            Hl = FF(H.hi[l], H.lo[l])
            if S[l]:
                Hl = rowsk_ff(Hl, j + 1, _lmat_ff(c2, s2), lo=j, hi=rhi)
                c2, s2, r = givens_ff(getel_ff(Hl, j + 2, j + 2),
                                      ff.neg(getel_ff(Hl, j + 2, j + 1)))
                Hl = setel_ff(Hl, j + 2, j + 2, r)
                Hl = setel_ff(Hl, j + 2, j + 1, zero)
                Hl = colsk_ff(Hl, j + 1, _rmat_adj_ff(c2, s2), lo=clo,
                              hi=j + 2)
                Hl = rowsk_ff(Hl, j, _lmat_ff(c1, s1), lo=j, hi=rhi)
                c1, s1, r = givens_ff(getel_ff(Hl, j + 1, j + 1),
                                      ff.neg(getel_ff(Hl, j + 1, j)))
                Hl = setel_ff(Hl, j + 1, j + 1, r)
                Hl = setel_ff(Hl, j + 1, j, zero)
                Hl = colsk_ff(Hl, j, _rmat_adj_ff(c1, s1), lo=clo, hi=j + 1)
            else:
                Hl = colsk_ff(Hl, j + 1, _rmat_adj_ff(c2, s2), lo=clo,
                              hi=j + 3)
                c2, s2, r = givens_ff(getel_ff(Hl, j + 1, j + 1),
                                      getel_ff(Hl, j + 2, j + 1))
                Hl = setel_ff(Hl, j + 1, j + 1, r)
                Hl = setel_ff(Hl, j + 2, j + 1, zero)
                Hl = rowsk_ff(Hl, j + 1, _lmat_ff(c2, s2), lo=j + 2, hi=rhi)
                Hl = colsk_ff(Hl, j, _rmat_adj_ff(c1, s1), lo=clo, hi=j + 2)
                c1, s1, r = givens_ff(getel_ff(Hl, j, j),
                                      getel_ff(Hl, j + 1, j))
                Hl = setel_ff(Hl, j, j, r)
                Hl = setel_ff(Hl, j + 1, j, zero)
                Hl = rowsk_ff(Hl, j, _lmat_ff(c1, s1), lo=j + 1, hi=rhi)
            H = at_set(H, l, Hl)
            ln = (l + 1) % p
            Z = zup(Z, ln, j + 1, _rmat_adj_ff(c2, s2))
            Z = zup(Z, ln, j, _rmat_adj_ff(c1, s1))
        H = at_set(H, 0, rowsk_ff(FF(H.hi[0], H.lo[0]), j + 1,
                                  _lmat_ff(c2, s2), lo=j, hi=rhi))
        H = at_set(H, 0, rowsk_ff(FF(H.hi[0], H.lo[0]), j,
                                  _lmat_ff(c1, s1), lo=j, hi=rhi))

        # chase (reference :953-1014)
        if pallas_sweep:
            from .pallas_sweep_rg import rg_chase_sweep_ff
            Zq = Z if want_z else None
            H, Zq = rg_chase_sweep_ff(H, Zq, ifirst + 1, ilast, S=S,
                                      want_z=want_z, interpret=interpret)
            if want_z:
                Z = Zq
        else:
            def chase_step(j1, carry):
                H, Z = carry
                act = (j1 >= ifirst + 1) & (j1 <= ilast - 2)

                def run(HZ):
                    H, Z = HZ
                    j = j1
                    col3 = getcol_ff(FF(H.hi[0], H.lo[0]), j, j - 1, 3)

                    def cel(t):
                        return FF(col3.hi[t], col3.lo[t])

                    c2, s2, r2 = givens_ff(cel(1), cel(2))
                    c1, s1, r1 = givens_ff(cel(0), r2)
                    H0 = setcol_ff(FF(H.hi[0], H.lo[0]), j, j - 1,
                                   ff.stack([r1, zero, zero], 0))
                    H0 = rowsk_ff(H0, j + 1, _lmat_ff(c2, s2), lo=j, hi=rhi)
                    H0 = rowsk_ff(H0, j, _lmat_ff(c1, s1), lo=j, hi=rhi)
                    H = at_set(H, 0, H0)
                    Z = zup(Z, 0, j + 1, _rmat_adj_ff(c2, s2))
                    Z = zup(Z, 0, j, _rmat_adj_ff(c1, s1))
                    for l in range(p - 1, 0, -1):
                        Hl = FF(H.hi[l], H.lo[l])
                        if S[l]:
                            Hl = colsk_ff(Hl, j + 1, _rmat_adj_ff(c2, s2),
                                          lo=clo, hi=j + 3)
                            fg = getcol_ff(Hl, j + 1, j + 1, 2)
                            c2, s2, r = givens_ff(FF(fg.hi[0], fg.lo[0]),
                                                  FF(fg.hi[1], fg.lo[1]))
                            Hl = setcol_ff(Hl, j + 1, j + 1,
                                           ff.stack([r, zero], 0))
                            Hl = rowsk_ff(Hl, j + 1, _lmat_ff(c2, s2),
                                          lo=j + 2, hi=rhi)
                            Hl = colsk_ff(Hl, j, _rmat_adj_ff(c1, s1),
                                          lo=clo, hi=j + 2)
                            fg = getcol_ff(Hl, j, j, 2)
                            c1, s1, r = givens_ff(FF(fg.hi[0], fg.lo[0]),
                                                  FF(fg.hi[1], fg.lo[1]))
                            Hl = setcol_ff(Hl, j, j, ff.stack([r, zero], 0))
                            Hl = rowsk_ff(Hl, j, _lmat_ff(c1, s1),
                                          lo=j + 1, hi=rhi)
                        else:
                            Hl = rowsk_ff(Hl, j + 1, _lmat_ff(c2, s2),
                                          lo=j, hi=rhi)
                            fg = getrow_ff(Hl, j + 2, j + 1, 2)
                            c2, s2, r = givens_ff(
                                FF(fg.hi[1], fg.lo[1]),
                                ff.neg(FF(fg.hi[0], fg.lo[0])))
                            Hl = setrow_ff(Hl, j + 2, j + 1,
                                           ff.stack([zero, r], 0))
                            Hl = colsk_ff(Hl, j + 1, _rmat_adj_ff(c2, s2),
                                          lo=clo, hi=j + 2)
                            Hl = rowsk_ff(Hl, j, _lmat_ff(c1, s1), lo=j,
                                          hi=rhi)
                            fg = getrow_ff(Hl, j + 1, j, 2)
                            c1, s1, r = givens_ff(
                                FF(fg.hi[1], fg.lo[1]),
                                ff.neg(FF(fg.hi[0], fg.lo[0])))
                            Hl = setrow_ff(Hl, j + 1, j,
                                           ff.stack([zero, r], 0))
                            Hl = colsk_ff(Hl, j, _rmat_adj_ff(c1, s1),
                                          lo=clo, hi=j + 1)
                        H = at_set(H, l, Hl)
                        Z = zup(Z, l, j + 1, _rmat_adj_ff(c2, s2))
                        Z = zup(Z, l, j, _rmat_adj_ff(c1, s1))
                    lm = jnp.minimum(j + 3, n - 1)
                    H0 = colsk_ff(FF(H.hi[0], H.lo[0]), j + 1,
                                  _rmat_adj_ff(c2, s2), lo=clo, hi=lm + 1)
                    H0 = colsk_ff(H0, j, _rmat_adj_ff(c1, s1), lo=clo,
                                  hi=lm + 1)
                    H = at_set(H, 0, H0)
                    return H, Z

                return lax.cond(act, run, lambda x: x, (H, Z))

            H, Z = lax.fori_loop(0, n, chase_step, (H, Z))

        # closing rotation at j = ilast-1 (reference :1015-1048)
        j = ilast - 1
        H0f = FF(H.hi[0], H.lo[0])
        c1, s1, r1 = givens_ff(getel_ff(H0f, j, j - 1),
                               getel_ff(H0f, j + 1, j - 1))
        H0 = setel_ff(H0f, j, j - 1, r1)
        H0 = setel_ff(H0, j + 1, j - 1, zero)
        H = at_set(H, 0, H0)
        H, Z = chain510_ff(H, Z, j, c1, s1, wlo=clo, whi=rhi)
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    # ------------------------------------------------------------------
    def body(full):
        st, jiter, _ = full
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st

        # Test 1 (f32 hi magnitudes: threshold-grade)
        d0 = jnp.abs(jnp.diagonal(H.hi[0]))
        z1 = jnp.zeros((1,), jnp.float32)
        sub0 = jnp.abs(jnp.concatenate([z1, jnp.diagonal(H.hi[0], -1)]))
        if aggressive:
            tol1 = jnp.broadcast_to(agg_tol[0], (n,))
        else:
            d0m = jnp.concatenate([z1, d0[:-1]])
            tol1 = jnp.maximum(jnp.float32(ulp) * (d0m + d0),
                               jnp.float32(smlnum))
        neg1 = (sub0 <= tol1) & (iv >= 1) & (iv <= ilast)
        any1 = jnp.any(neg1)
        jstar = jnp.max(jnp.where(neg1, iv, -1))
        jlo = jnp.where(any1, jstar, 0)
        split1 = (ilast == 0) | (any1 & (jstar == ilast))
        H = at_set(H, 0, setel_ff(FF(H.hi[0], H.lo[0]), jstar, jstar - 1,
                                  zero, active=any1))

        # Tests 2/3 (triangular diagonals; 4x ulp — ds-reduced factors
        # carry ~1-2 ulp_ds of junk in exactly singular diagonals, see
        # ops/pqz_complex_ff.py)
        dl = jnp.abs(jnp.diagonal(H.hi, axis1=1, axis2=2))
        zp1 = jnp.zeros((p, 1), jnp.float32)
        sup = jnp.abs(jnp.concatenate([jnp.diagonal(H.hi, 1, 1, 2), zp1],
                                      axis=1))
        supm1 = jnp.concatenate([zp1, sup[:, :-1]], axis=1)
        toltr = jnp.where(
            iv[None, :] == ilast, supm1,
            jnp.where(iv[None, :] == jlo, sup, supm1 + sup))
        if aggressive:
            toltr = jnp.broadcast_to(agg_tol[:, None], (p, n))
        else:
            toltr = jnp.maximum(jnp.float32(4 * ulp) * toltr,
                                jnp.float32(smlnum))
        lv = jnp.arange(p, dtype=jnp.int32)
        negtr = (dl <= toltr) & (iv[None, :] >= jlo) & \
            (iv[None, :] <= ilast) & (lv[:, None] >= 1)
        bestj = jnp.max(jnp.where(negtr, iv[None, :], -1), axis=1)
        s_arr = jnp.asarray(S)
        pos_l = jnp.min(jnp.where(s_arr & (bestj >= 0) & (lv >= 1), lv,
                                  p + 1))
        neg_l = jnp.min(jnp.where((~s_arr) & (bestj >= 0) & (lv >= 1), lv,
                                  p + 1))
        has_pos = pos_l <= p
        has_neg = neg_l <= p
        ldef = jnp.where(has_pos, pos_l, neg_l).astype(jnp.int32)
        jdef = bestj[jnp.clip(ldef, 0, p - 1)]

        attack = jlo == ilast - 1
        action = jnp.where(
            split1, 0,
            jnp.where(has_pos, 1,
                      jnp.where(has_neg, 2,
                                jnp.where((ziter >= 7) | (ziter < 0), 3,
                                          jnp.where(attack, 5, 4)))))

        info = {"jlo": jlo, "ldef": ldef, "jdef": jdef}
        st = (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)
        sweep_fn = act_attack if n == 2 else act_sweep
        if defer_deflate:
            def act_stub(st, info):
                return st

            st = lax.switch(action, [act_split, act_stub, act_stub,
                                     act_stub, sweep_fn, act_attack],
                            st, info)
            deferred = (action >= 1) & (action <= 3)
            dreq = jnp.where(deferred,
                             jnp.stack([action, jlo, ldef, jdef]),
                             jnp.zeros((4,), jnp.int32))
        else:
            st = lax.switch(action, [act_split, act_pos, act_neg,
                                     act_czshift, sweep_fn, act_attack],
                            st, info)
            dreq = jnp.zeros((4,), jnp.int32)
        return st, jiter + 1, dreq

    def cond(full):
        st, jiter, dreq = full
        go = (st[6] >= 0) & (jiter < maxit) & (dreq[0] == 0)
        if it_cap is not None:
            go = go & (jiter < it_cap)
        return go

    def body_guarded(full):
        st, jiter, dreq = full
        return lax.cond(st[6] >= 0, body, lambda f: (f[0], f[1] + 1, f[2]),
                        full)

    dreq0 = jnp.zeros((4,), jnp.int32)
    if resume_state is not None:
        st0, jiter0, _ = resume_state
    else:
        st0 = (H, Z, jnp.zeros((n,), f64), jnp.zeros((n,), f64),
               jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.int32),
               jnp.int32(n - 1), jnp.int32(0), jnp.int32(ziter0), key0)
        jiter0 = jnp.int32(0)
    fullst, jiter, dreq = lax.while_loop(cond, body_guarded,
                                         (st0, jiter0, dreq0))
    (H, Z, alr, ali, be, sc, ilast, _, _, _) = fullst
    final_state = (fullst, jiter, dreq)
    czbail = ilast == -5
    ok = (ilast < 0) & (~czbail)
    done = (ilast < 0) | (jiter >= maxit)

    # scrub: zero subdiagonals under real eigenvalues; triangularize rest
    keep = jnp.where(ali[:-1] == 0, 0.0, 1.0).astype(jnp.float32)
    sub_hi = jnp.diagonal(H.hi[0], -1) * keep
    sub_lo = jnp.diagonal(H.lo[0], -1) * keep
    H0hi = H.hi[0] - jnp.diag(jnp.diagonal(H.hi[0], -1), -1) + \
        jnp.diag(sub_hi, -1)
    H0lo = H.lo[0] - jnp.diag(jnp.diagonal(H.lo[0], -1), -1) + \
        jnp.diag(sub_lo, -1)
    Hhi_out = H.hi.at[0].set(jnp.triu(H0hi, -1)).at[1:].set(
        jnp.triu(H.hi[1:]))
    Hlo_out = H.lo.at[0].set(jnp.triu(H0lo, -1)).at[1:].set(
        jnp.triu(H.lo[1:]))
    zout = (Z.hi, Z.lo) if want_z else (None, None)
    out = (Hhi_out, Hlo_out) + zout + (alr, ali, be, sc, ok)
    if aggressive:
        out = out + (czbail,)
    if with_info:
        out = out + ({"niter": jiter, "maxit": jnp.int32(maxit)},)
    if return_state:
        out = out + (final_state, done)
    return out


import functools


@functools.lru_cache(maxsize=16)
def _deferred_fns_rg(p: int, n: int, S, want_z: bool):
    """Lazily-jitted deflation actions for the rg DEFERRED chunked
    protocol (zero-imaginary CXF shim; see pqz_complex_ff's counterpart)."""
    ulp = float(ff.EPS)
    unfl = 1.175494e-38
    smlnum = unfl * (n / ulp)
    from .pqz_deflate_ff import make_deflate_cores_ff
    pos_cx, neg_cx, cz_cx = make_deflate_cores_ff(
        p=p, n=n, S=S, want_z=want_z, ulp=ulp, smlnum=smlnum)

    def _cx(Hhi, Hlo):
        zi = jnp.zeros_like(Hhi)
        return CXF(FF(Hhi, Hlo), FF(zi, zi))

    @jax.jit
    def run_pos(Hhi, Hlo, Zhi, Zlo, jlo, ldef, jdef, ilast):
        Hc, Zc = pos_cx(_cx(Hhi, Hlo), _cx(Zhi, Zlo), jlo, ldef, jdef,
                        ilast)
        return Hc.re.hi, Hc.re.lo, Zc.re.hi, Zc.re.lo

    @jax.jit
    def run_neg(Hhi, Hlo, Zhi, Zlo, jlo, ldef, jdef, ilast):
        Hc, Zc = neg_cx(_cx(Hhi, Hlo), _cx(Zhi, Zlo), jlo, ldef, jdef,
                        ilast)
        return Hc.re.hi, Hc.re.lo, Zc.re.hi, Zc.re.lo

    @jax.jit
    def run_cz(Hhi, Hlo, Zhi, Zlo, jlo, ilast):
        Hc, Zc, zflag = cz_cx(_cx(Hhi, Hlo), _cx(Zhi, Zlo), jlo, ilast)
        return Hc.re.hi, Hc.re.lo, Zc.re.hi, Zc.re.lo, zflag

    return run_pos, run_neg, run_cz


def pqz_real_gen_core_ff_chunked(
    Hhi, Hlo, S, Z2=None, want_z=True, want_t=True, maxitfac=120,
    seed=1234, aggressive=False, chunk_iters=None, cfg=None,
    pallas_sweep=False, interpret=False,
):
    """Host-chunked ds real generalized QZ (axon ~60 s execute kill timer).

    Same returns as :func:`pqz_real_gen_core_ff` (without with_info); the
    loop state stays on-device between chunk calls and every chunk reuses
    the ONE resume trace of the core.
    """
    from ..config import default_config, verbosity
    if cfg is None:
        cfg = default_config
    p, n, _ = Hhi.shape
    if n == 1:
        return pqz_real_gen_core_ff(Hhi, Hlo, S, Z2, want_z=want_z,
                                    want_t=want_t, maxitfac=maxitfac,
                                    seed=seed, aggressive=aggressive)
    maxit = maxitfac * n
    if chunk_iters is None:
        if pallas_sweep:
            per_iter = 4.0 * p * n * n * 1e-8
            chunk_iters = min(256, max(16, int(20.0 / max(per_iter, 1e-9))))
        else:
            per_iter = 4.0 * p * n * max(n * 1e-8, 1.2e-5)
            chunk_iters = max(16, int(10.0 / max(per_iter, 1e-9)))

    import math as _math
    ziter0 = -1 if p >= _math.log2(2.2250738585072014e-308) / \
        _math.log2(2.220446049250313e-16) else 0

    @jax.jit
    def _init(Hhi, Hlo, Z2):
        H = FF(Hhi, Hlo)
        if want_z:
            if Z2 is None:
                eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                       (p, n, n))
                Z = FF(eye, jnp.zeros((p, n, n), jnp.float32))
            else:
                Z = FF(Z2[0], Z2[1])
        else:
            Z = FF(jnp.zeros((p, 1, 1), jnp.float32),
                   jnp.zeros((p, 1, 1), jnp.float32))
        st0 = (H, Z, jnp.zeros((n,), jnp.float64),
               jnp.zeros((n,), jnp.float64), jnp.zeros((n,), jnp.float32),
               jnp.zeros((n,), jnp.int32), jnp.int32(n - 1), jnp.int32(0),
               jnp.int32(ziter0), jax.random.PRNGKey(seed))
        return (st0, jnp.int32(0), jnp.zeros((4,), jnp.int32))

    # ---- aggressive early deflation plumbing (ops/aed.py, rg-ff) --------
    import numpy as _np
    aed_w = cfg.aed_window if cfg.aed_window else min(48, max(16, n // 10))
    aed_itv = cfg.aed_interval if cfg.aed_interval else max(24, n // 6)
    aed_on = bool(cfg.aed) and aed_w >= 4 and n >= aed_w + 4 \
        and (n >= cfg.aed_min_n or cfg.aed_window > 0)
    from .aed import status_pull_cx
    if aed_on:
        from .aed import aed_analyze_rg, aed_apply_rg_ff, aed_pull_rgff
        ulp = float(ff.EPS)
        h0 = _np.asarray(Hhi[0], _np.float64) + _np.asarray(Hlo[0],
                                                            _np.float64)
        # max-norm contract scale at the ds ulp (see ops/pqr_ff.py note)
        aed_tol = ulp * float(n) ** 0.5 * float(_np.abs(h0).max())
        seg = min(chunk_iters, aed_itv)
        misses = 0
    else:
        seg = chunk_iters

    def _try_aed(full, i_cur, Hwin, bcp):
        nonlocal misses, seg
        st, jiter, dreq = full
        (Hst, Zst, alre, alim, be, sc, ilast, iiter, ziter, key) = st
        w = aed_w
        if i_cur + 1 < w + 2:
            return full
        s = i_cur - w + 1
        try:
            res = aed_analyze_rg(Hwin, S, bcp, aed_tol,
                                 max_moves=None if cfg.aed_max_moves < 0 else cfg.aed_max_moves)
        except Exception as e:  # pragma: no cover - defensive host path
            if verbosity("main") >= 1:
                print(f"[pqz_rg_ff aed] analysis failed ({e!r}); skipping")
            res = None
        if res is None:
            misses += 1
            if misses >= 2:
                seg = min(seg * 2, chunk_iters)
            return full
        misses = 0
        seg = min(chunk_iters, aed_itv)
        d, Wf, Zt, arw, aiw, bew, scw, sph = res
        u = w - d
        Hh, Hl, Zh, Zl, arr, aii, ben, scn = aed_apply_rg_ff(
            Hst.hi, Hst.lo, Zst.hi, Zst.lo, jnp.asarray(Zt),
            jnp.asarray(Wf), jnp.asarray(sph), jnp.int32(s), S,
            want_z=want_z, alre=alre, alim=alim, be=be, scv=sc,
            lam_re=jnp.asarray(arw), lam_im=jnp.asarray(aiw),
            lam_be=jnp.asarray(_np.asarray(bew, _np.float64)),
            lam_sc=jnp.asarray(_np.asarray(scw, _np.int32)),
            u=jnp.int32(u), nlam=jnp.int32(w))
        if verbosity("main") >= 1:
            print(f"[pqz_rg_ff aed] deflated {d} at ilast={i_cur} "
                  f"(window {w})")
        ziter_n = jnp.where(jnp.int32(ziter) != -1, jnp.int32(0),
                            jnp.int32(ziter))
        st = (FF(Hh, Hl), FF(Zh, Zl), arr, aii, ben, scn,
              jnp.int32(i_cur - d), jnp.int32(0), ziter_n, key)
        return (st, jiter, dreq)

    state = _init(Hhi, Hlo, Z2)
    cap = 0
    first = True
    while True:
        cap = min(cap + seg, maxit)
        if verbosity("main") >= 1 and first:
            print("[pqz_rg_ff chunk] compiling/launching first chunk "
                  f"(cap={cap})", flush=True)
        out = pqz_real_gen_core_ff(
            Hhi, Hlo, S, Z2, want_z=want_z, want_t=want_t,
            maxitfac=maxitfac, seed=seed, aggressive=aggressive,
            it_cap=jnp.int32(cap), resume_state=state, return_state=True,
            pallas_sweep=pallas_sweep, interpret=interpret,
            defer_deflate=True)
        *outs, state, done = out
        # ONE blocking transfer per segment boundary (see ops/pqr_ff.py)
        st0b = state[0]
        aed_win = aed_bcp = None
        if aed_on:
            packed = _np.asarray(aed_pull_rgff(
                st0b[0].hi, st0b[0].lo, st0b[6], state[1], state[2], done,
                w=aed_w))
            jiter_c, ilast_c = int(packed[0]), int(packed[1])
            code = int(packed[2])
            done_b = bool(packed[6] != 0.0)
            aed_bcp = float(packed[7]) + float(packed[8])
            nw = p * aed_w * aed_w
            aed_win = (packed[9:9 + nw].astype(_np.float64) +
                       packed[9 + nw:9 + 2 * nw].astype(_np.float64)
                       ).reshape(p, aed_w, aed_w)
        else:
            st7 = _np.asarray(status_pull_cx(st0b[6], state[1], state[2],
                                             done))
            jiter_c, ilast_c = int(st7[0]), int(st7[1])
            code = int(st7[2])
            done_b = bool(st7[6] != 0.0)
        if verbosity("main") >= 1:
            print(f"[pqz_rg_ff chunk] jiter={jiter_c} "
                  f"ilast={ilast_c} dreq={code} "
                  f"done={done_b}", flush=True)
        first = False
        if code != 0:
            st, jiter, dreq = state
            (Hst, Zst, alre, alim, be, sc, ilast, iiter, ziter, key) = st
            if code == 3 and aggressive:
                # the reference NotImplements this combination
                # (src/rgeneralized.jl:245-247): bail with the sentinel
                st = (Hst, Zst, alre, alim, be, sc, jnp.int32(-5), iiter,
                      ziter, key)
                state = (st, jiter, jnp.zeros((4,), jnp.int32))
                continue
            run_pos, run_neg, run_cz = _deferred_fns_rg(p, n, S, want_z)
            if code == 1:
                Hh, Hl, Zh, Zl = run_pos(Hst.hi, Hst.lo, Zst.hi, Zst.lo,
                                         dreq[1], dreq[2], dreq[3], ilast)
            elif code == 2:
                Hh, Hl, Zh, Zl = run_neg(Hst.hi, Hst.lo, Zst.hi, Zst.lo,
                                         dreq[1], dreq[2], dreq[3], ilast)
            else:
                Hh, Hl, Zh, Zl, zflag = run_cz(Hst.hi, Hst.lo, Zst.hi,
                                               Zst.lo, dreq[1], ilast)
                ziter = jnp.where(zflag, jnp.int32(1), jnp.int32(0))
            Znew = FF(Zh, Zl) if want_z else Zst
            st = (FF(Hh, Hl), Znew, alre, alim, be, sc, ilast, iiter,
                  ziter, key)
            state = (st, jiter, jnp.zeros((4,), jnp.int32))
            continue
        if done_b or cap >= maxit:
            return tuple(outs)
        if aed_on:
            state = _try_aed(state, ilast_c, aed_win, aed_bcp)


def pschur_real_gen_pipeline_ff(A, S, orient, want_t=True, want_z=True,
                                maxitfac=120, aggressive=False,
                                chunked=True, chunk_iters=None,
                                pallas=None, interpret=False):
    """Full ds real GPSD: ds reduction + ds iteration + packaging.

    The contract-grade TPU route for mixed-signature REAL cycles (the
    plain-f64 pipeline of pqz_real.pschur_real_gen_pipeline runs on-chip
    at the emulated-f64 floor; on-chip record for THIS pipeline: backerr
    2.909e-13 / orth 1.756e-13 / 9.78 s at p=6 n=128 mixed S, 2026-08-20).
    All-positive S reduces via the ds Householder reduction
    (ops/hessenberg_ff); mixed signatures via the split-complex ds signed
    reduction on zero-imaginary data (value-exact on reals; see module
    docstring).

    ``pallas=None`` (default) resolves to the fused Pallas rg chase
    kernels off-CPU and the XLA-glue sweep on the CPU backend (where
    Mosaic kernels would need the slow interpreter).
    """
    import numpy as _np

    from ..types import ConvergenceFailure, GeneralizedPeriodicSchur
    from ..utils.circshift import rev_alias
    from .hessenberg_ff import phessenberg_core_ff

    if pallas is None:
        dev = jax.config.jax_default_device
        plat = dev.platform if dev is not None else jax.default_backend()
        pallas = plat != "cpu"
    p = A.shape[0]
    if orient == "L":
        A = A[::-1]
        S = tuple(reversed(S))
    if not S[0]:
        raise ValueError("the leftmost signature entry must be +1 (True)")
    Anp = _np.asarray(A, _np.float64)
    Aff = ff.from_f64(jnp.asarray(Anp))
    if all(S):
        out = phessenberg_core_ff(Aff.hi, Aff.lo, want_q=want_z)
        Hhi, Hlo = out[0], out[1]
        Z2 = (out[2], out[3]) if want_z else None
    else:
        from .pqz_complex_ff import (phessenberg_signed_core_cxff,
                                     phessenberg_signed_core_cxff_chunked)
        zi = jnp.zeros_like(Aff.hi)
        dev0 = jax.config.jax_default_device
        plat0 = dev0.platform if dev0 is not None else jax.default_backend()
        red = (phessenberg_signed_core_cxff_chunked if plat0 != "cpu"
               else phessenberg_signed_core_cxff)
        out = red(Aff.hi, Aff.lo, zi, zi, S, want_q=want_z)
        Hhi, Hlo = out[0], out[1]
        Z2 = (out[4], out[5]) if want_z else None

    kw = dict(want_z=want_z, want_t=want_t, maxitfac=maxitfac,
              aggressive=aggressive, pallas_sweep=pallas,
              interpret=interpret)
    if chunked:
        out = pqz_real_gen_core_ff_chunked(Hhi, Hlo, S, Z2,
                                           chunk_iters=chunk_iters, **kw)
    else:
        out = pqz_real_gen_core_ff(Hhi, Hlo, S, Z2, **kw)
    if aggressive:
        (Thi, Tlo, Zhi, Zlo, alr, ali, be, sc, ok, czbail) = out
        if bool(czbail):
            from ..types import PSDNotImplemented
            raise PSDNotImplemented(
                "controlled zero shift with aggressive deflation "
                "(reference src/rgeneralized.jl:245-247)")
    else:
        (Thi, Tlo, Zhi, Zlo, alr, ali, be, sc, ok) = out
    if not bool(ok):
        raise ConvergenceFailure(-1)
    cpu = jax.devices("cpu")[0]

    def _c(hi, lo):
        return jnp.asarray(
            _np.asarray(hi, _np.float64) + _np.asarray(lo, _np.float64),
            device=cpu)

    T = _c(Thi, Tlo)
    Zout = _c(Zhi, Zlo) if want_z else None
    alpha = jnp.asarray(_np.asarray(alr) + 1j * _np.asarray(ali),
                        device=cpu)
    P = GeneralizedPeriodicSchur(
        S=S, schurindex=0, Ts=T, Zs=Zout, alpha=alpha,
        beta=jnp.asarray(_np.asarray(be, _np.float64), device=cpu),
        alphascale=sc, orientation="R")
    return rev_alias(P) if orient == "L" else P
