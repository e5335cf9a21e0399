"""Float-float split-complex periodic QZ core: the contract-grade TPU path.

Same algorithm as ops/pqz_complex.py / ops/pqz_complex_split.py (MB03BZ
semantics, reference src/generalized.jl:166-931) with every complex value
carried as a cxff.CXF ((re, im) float-float pair): exact EFT arithmetic at
f32 hardware speed, ~2^-48 roundoff, which is what meets the <=1e-12
backward-error contract ON the axon chip — the split emulated-f64
representation (ops/pqz_complex_split.py) bottoms out at the x64-rewriter's
weak-add floor there.

Precision policy (mirrors ops/pqr_ff.py):

* rotation generation and every H/Z update run in ds (cxff);
* PRODUCT-level quantities — the decomposed (alpha, beta, scale)
  eigenvalues — are accumulated through ``safeprod_signed_split`` on
  emulated-f64 values of the ds diagonals (per-factor power-of-two renorm
  handles the f32 exponent range of the chip's emulated f64);
* negligibility thresholds compare f32 hi components (threshold-grade).

Chunked execution: the axon runtime kills any single device execute after
~60 s, so ``pqz_complex_core_ff_chunked`` runs the while_loop in resumable
it_cap segments with the state left on-device between calls (same device
as ops/pqr_ff.pqr_real_core_ff_chunked).

Also provides ``phessenberg_core_cxff``: the ds split-complex periodic
Hessenberg reduction (reference src/PeriodicSchurDecompositions.jl:213-259
column sweep with complex ds reflectors).
"""
from __future__ import annotations

import functools
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.safeprod import safeprod_signed_split
from . import cxff, ff
from .cxff import (CXF, at_set, colsk_cxff, conj, getcol_cxff, getel_cxff,
                   getrow_cxff, givens_cxff, lmat_cxff, mul, neg,
                   refl_left_cxff, refl_right_cxff, reflector_masked_cxff,
                   rmat_adj_cxff, rowsk_cxff, setcol_cxff, setel_cxff,
                   setrow_cxff, where)
from .ff import FF


def _fget(X: CXF, j) -> CXF:
    return CXF(FF(X.re.hi[j], X.re.lo[j]), FF(X.im.hi[j], X.im.lo[j]))


def _scale4(x: CXF, s) -> CXF:
    return CXF(FF(x.re.hi * s, x.re.lo * s), FF(x.im.hi * s, x.im.lo * s))


# ---------------------------------------------------------------------------
# ds split-complex periodic Hessenberg reduction


def _fix_column_cxff(M: CXF, i, beta: FF, zero_below) -> CXF:
    n = M.re.hi.shape[0]
    i = jnp.asarray(i, jnp.int32)
    col = getcol_cxff(M, 0, i, n)
    rows = lax.iota(jnp.int32, n)
    piv = zero_below - 1
    bcol = CXF(FF(jnp.broadcast_to(beta.hi, (n,)),
                  jnp.broadcast_to(beta.lo, (n,))), ff.zeros((n,)))
    nc = where(rows < piv, col, where(rows == piv, bcol, cxff.zeros((n,))))
    return setcol_cxff(M, 0, i, nc)


@partial(jax.jit, static_argnames=("want_q",))
def phessenberg_core_cxff(Arehi, Arelo, Aimhi, Aimlo, want_q: bool = True):
    """ds split-complex periodic Hessenberg reduction.

    Args: (p, n, n) f32 hi/lo pairs of the real and imaginary parts.
    Returns (H: 4 arrays, Q: 4 arrays or Nones) with
    Q[j]^H A[j] Q[(j+1)%p] = H[j].
    """
    p, n, _ = Arehi.shape
    A = CXF(FF(Arehi, Arelo), FF(Aimhi, Aimlo))
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
    zf = jnp.zeros((p, n, n), jnp.float32)
    if n <= 1:
        q = (eye, zf, zf, zf) if want_q else (None, None, None, None)
        return (Arehi, Arelo, Aimhi, Aimlo) + q
    Q = CXF(FF(eye, zf), FF(zf, zf)) if want_q else None

    def fset(X: CXF, j, M: CXF) -> CXF:
        return at_set(X, j, M)

    def column_step(i, carry):
        A, Q = carry

        # factor loop as fori with dynamic access: the python-unrolled
        # version blows the XLA:TPU graph up p-fold (remote compiler dies
        # at p >= ~6)
        def fac_step(t, AQ):
            A, Q = AQ
            j = jnp.int32(p - 1) - t
            Aj = cxff.fac_get(A, j)
            col = getcol_cxff(Aj, 0, i, n)
            w, tau, beta = reflector_masked_cxff(col, i)
            Aj = refl_left_cxff(Aj, w, conj(tau))
            Aj = _fix_column_cxff(Aj, i, beta, i + 1)
            A = cxff.fac_set(A, j, Aj)
            A = cxff.fac_set(
                A, j - 1, refl_right_cxff(cxff.fac_get(A, j - 1), w, tau))
            if want_q:
                Q = cxff.fac_set(
                    Q, j, refl_right_cxff(cxff.fac_get(Q, j), w, tau))
            return A, Q

        if p > 1:
            A, Q = lax.fori_loop(0, p - 1, fac_step, (A, Q))
        col = getcol_cxff(_fget(A, 0), 0, i, n)
        w, tau, beta = reflector_masked_cxff(col, i + 1)
        A0 = refl_left_cxff(_fget(A, 0), w, conj(tau))
        A0 = _fix_column_cxff(A0, i, beta, i + 2)
        A = fset(A, 0, A0)
        jr = p - 1 if p > 1 else 0
        A = fset(A, jr, refl_right_cxff(_fget(A, jr), w, tau))
        if want_q:
            Q = fset(Q, 0, refl_right_cxff(_fget(Q, 0), w, tau))
        return A, Q

    A, Q = lax.fori_loop(0, n - 1, column_step, (A, Q))

    def _triu(X: CXF) -> CXF:
        t0 = lambda x: jnp.concatenate(  # noqa: E731
            [jnp.triu(x[:1], -1)] + ([jnp.triu(x[1:])] if p > 1 else []),
            axis=0)
        return CXF(FF(t0(X.re.hi), t0(X.re.lo)),
                   FF(t0(X.im.hi), t0(X.im.lo)))

    H = _triu(A)
    out = (H.re.hi, H.re.lo, H.im.hi, H.im.lo)
    if want_q:
        return out + (Q.re.hi, Q.re.lo, Q.im.hi, Q.im.lo)
    return out + (None, None, None, None)


# ---------------------------------------------------------------------------
# ds split-complex periodic QZ core


def _cx_shift_auto(interpret: bool) -> bool:
    """Routing for the fused cx shift-chain kernel (kernel S).

    ON on the chip (the two tiny row slabs always fit VMEM), OFF on CPU
    (glue exact there; interpret tests opt in via PSD_CX_KERNEL=1).
    """
    import os as _os
    env = _os.environ.get("PSD_CX_KERNEL", "")
    if env == "0":
        return False
    if env == "1":
        return True
    if interpret:
        return False
    dev = jax.config.jax_default_device
    plat = dev.platform if dev is not None else jax.default_backend()
    return plat != "cpu"


@partial(jax.jit, static_argnames=("S", "want_z", "want_t", "maxitfac",
                                   "with_info", "return_state",
                                   "pallas_sweep", "interpret",
                                   "skip_post", "defer_deflate"))
def pqz_complex_core_ff(
    Hrehi: jax.Array,
    Hrelo: jax.Array,
    Himhi: jax.Array,
    Himlo: jax.Array,
    S: Tuple[bool, ...],
    Z4: Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]] = None,
    want_z: bool = True,
    want_t: bool = True,
    maxitfac: int = 30,
    seed: int = 1234,
    with_info: bool = False,
    it_cap: Optional[jax.Array] = None,
    resume_state=None,
    return_state: bool = False,
    pallas_sweep: bool = False,
    interpret: bool = False,
    skip_post: bool = False,
    defer_deflate: bool = False,
):
    """Run the ds split-complex periodic QZ iteration.

    ``defer_deflate``: the singular-factor deflation branches EXIT the
    while loop (request code in the state's dreq field) instead of being
    traced into it — the chunked driver performs them through the
    lazily-jitted functions of :func:`_deferred_fns_cx`, which cuts the
    chunked core's compile time severalfold.  ``skip_post``: leave the
    exit postprocess to the driver (run once on completion).

    Args:
      Hrehi..Himlo: (p, n, n) f32 hi/lo pairs; H[0] Hessenberg, rest upper
        triangular.  On RESUME calls pass the ORIGINAL inputs unchanged.
      S: static signature, S[0] True.
      Z4: optional initial unitary stack as 4 f32 arrays.
      it_cap / resume_state / return_state: chunked execution hooks (the
        axon worker kills single device executes after ~60 s).

    Returns (Trehi, Trelo, Timhi, Timlo, Zrehi, Zrelo, Zimhi, Zimlo,
    alpha_re, alpha_im, beta, alphascale, ok) — alpha in (emulated) f64.
    """
    p, n, _ = Hrehi.shape
    assert S[0], "signature entry S[0] must be True"
    ulp = float(ff.EPS)
    unfl = 1.175494e-38
    smlnum = unfl * (n / ulp)
    maxit = maxitfac * n
    f64 = jnp.float64
    # controlled-zero-shift trigger: product-level quantities go through
    # safeprod's per-factor renorm, so the reference's f64-based long-cycle
    # threshold applies (src/generalized.jl:199), not the f32 range
    ziter0 = -1 if p >= math.log2(2.2250738585072014e-308) / \
        math.log2(2.220446049250313e-16) else 0

    use_cx_shift = _cx_shift_auto(interpret)

    H = CXF(FF(Hrehi, Hrelo), FF(Himhi, Himlo))
    if want_z:
        if Z4 is None:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
            zf = jnp.zeros((p, n, n), jnp.float32)
            Z = CXF(FF(eye, zf), FF(zf, zf))
        else:
            Z = CXF(FF(Z4[0], Z4[1]), FF(Z4[2], Z4[3]))
    else:
        Z = cxff.zeros((p, 1, 1))

    def _d64(x: FF):
        return x.hi.astype(f64) + x.lo.astype(f64)

    if n == 1:
        dre = _d64(FF(Hrehi[:, 0, 0], Hrelo[:, 0, 0]))
        dim = _d64(FF(Himhi[:, 0, 0], Himlo[:, 0, 0]))
        ar, ai, b, s = safeprod_signed_split(dre, dim, S)
        zout = (Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo) if want_z else (None,) * 4
        return (Hrehi, Hrelo, Himhi, Himlo) + zout + (
            ar[None], ai[None], b.astype(jnp.float32)[None], s[None],
            jnp.asarray(True))

    alr0 = jnp.zeros((n,), f64)
    ali0 = jnp.zeros((n,), f64)
    beta0 = jnp.zeros((n,), jnp.float32)
    scal0 = jnp.zeros((n,), jnp.int32)
    key0 = jax.random.PRNGKey(seed)
    iv = jnp.arange(n, dtype=jnp.int32)

    def zup(Z, l, k, M: CXF, active=None):
        if not want_z:
            return Z
        return at_set(Z, l, colsk_cxff(_fget(Z, l), k, M, active=active))

    def zup_dyn(Z, l, k, M: CXF, active=None):
        if not want_z:
            return Z
        Zl = cxff.fac_get(Z, l)
        Zl = colsk_cxff(Zl, k, M, active=active)
        return cxff.fac_set(Z, l, Zl)

    # ------------------------------------------------------------------
    def act_split(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        ilc = jnp.clip(ilast, 0, n - 1)

        def dslice(x):
            return lax.dynamic_slice(x, (jnp.int32(0), ilc, ilc),
                                     (p, 1, 1))[:, 0, 0]

        dre = dslice(H.re.hi).astype(f64) + dslice(H.re.lo).astype(f64)
        dim = dslice(H.im.hi).astype(f64) + dslice(H.im.lo).astype(f64)
        ar, ai, b, s = safeprod_signed_split(dre, dim, S)
        alr = alr.at[ilc].set(ar)
        ali = ali.at[ilc].set(ai)
        be = be.at[ilc].set(b.astype(jnp.float32))
        sc = sc.at[ilc].set(s)
        ilast = ilast - 1
        iiter = jnp.int32(0)
        ziter = jnp.where(ziter != -1, jnp.int32(0), ziter)
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    def act_czshift(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        H, Z, zflag = czshift_core(H, Z, info["jlo"], ilast)
        ziter = jnp.where(zflag, jnp.int32(1), jnp.int32(0))
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    def act_sweep(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        jlo = info["jlo"]
        ifirst = jlo
        iiter = iiter + 1
        ziter = ziter + 1

        if use_cx_shift and pallas_sweep:
            # kernel S (pallas_sweep_cx.qz_shift_cxff): the whole shift
            # chain in ONE Mosaic launch — the XLA-glue chain below is
            # ~2.7k barrier layers per sweep iteration (round-5 census).
            # Bitwise-equal (test_pallas_cx.py); PSD_CX_KERNEL=0/1
            # overrides.
            from .pallas_sweep_cx import qz_shift_cxff
            c, s = qz_shift_cxff(H, ifirst, ilast, S=S,
                                 interpret=interpret)
        else:
            # shift rotation: fori + sign-cond with dynamic factor access
            # (the python-unrolled loops of the split core blow the
            # XLA:TPU graph up p-fold; the remote compiler dies at p >= 6)
            one_c = cxff.cxf(jnp.float32(1.0))
            c, s, _ = givens_cxff(one_c, one_c)
            S_arr = jnp.asarray(S)

            def shift_fac(t, cs):
                c, s = cs
                l = jnp.int32(p - 1) - t
                Hl = cxff.fac_get(H, l)
                hf = getel_cxff(Hl, ifirst, ifirst)
                hl = getel_cxff(Hl, ilast, ilast)

                def pos(cs):
                    c, s = cs
                    c2, s2, _ = givens_cxff(cxff.mul_ff(hf, c),
                                            mul(hl, conj(s)))
                    return c2, s2

                def neg_(cs):
                    c, s = cs
                    c2, s2, _ = givens_cxff(cxff.mul_ff(hl, c),
                                            neg(mul(hf, conj(s))))
                    return c2, neg(s2)

                return lax.cond(S_arr[l], pos, neg_, (c, s))

            if p > 1:
                c, s = lax.fori_loop(0, p - 1, shift_fac, (c, s))
            H0 = _fget(H, 0)
            h0f = getel_cxff(H0, ifirst, ifirst)
            h0l = getel_cxff(H0, ilast, ilast)
            h0sub = getel_cxff(H0, ifirst + 1, ifirst)
            c, s, _ = givens_cxff(
                cxff.sub(cxff.mul_ff(h0f, c), mul(h0l, conj(s))),
                cxff.mul_ff(h0sub, c))

        key, subk = jax.random.split(key)
        fg = jax.random.normal(subk, (4,), jnp.float32)
        ce, se, _ = givens_cxff(cxff.cxf(fg[0], fg[1]),
                                cxff.cxf(fg[2], fg[3]))
        exc = (iiter % 10) == 0
        c = ff.where(exc, ce, c)
        s = where(exc, se, s)

        if pallas_sweep:
            # fused Pallas sweep (ops/pallas_sweep_cx.py): three kernels
            # replace the ~30-slab-op-per-(step, factor) glue below — the
            # XLA graph stays small (the remote TPU compile of the glue
            # sweep wedges the axon worker at p >= 6) and the per-dispatch
            # cost disappears.  Always maintains the full T (want_t
            # windowing stays a glue-path device).
            from .pallas_sweep_cx import qz_sweep_cxff
            Zq = Z if want_z else None
            H, Zq = qz_sweep_cxff(H, Zq, ifirst, ilast, c, s, S=S,
                                  want_z=want_z, interpret=interpret)
            if want_z:
                Z = Zq
            return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

        rhi = None if want_t else ilast + 1
        clo = None if want_t else jlo

        def sweep_step(k, carry):
            H, Z, c, s = carry
            act = (k >= ifirst) & (k <= ilast - 1)
            regen = act & (k > ifirst)
            H0 = _fget(H, 0)
            fg = getcol_cxff(H0, k, k - 1, 2)
            cn, sn, r = givens_cxff(
                CXF(FF(fg.re.hi[0], fg.re.lo[0]), FF(fg.im.hi[0],
                                                     fg.im.lo[0])),
                CXF(FF(fg.re.hi[1], fg.re.lo[1]), FF(fg.im.hi[1],
                                                     fg.im.lo[1])))
            zf32 = jnp.float32(0.0)
            H0 = setcol_cxff(
                H0, k, k - 1,
                CXF(FF(jnp.stack([r.re.hi, zf32]),
                       jnp.stack([r.re.lo, zf32])),
                    FF(jnp.stack([r.im.hi, zf32]),
                       jnp.stack([r.im.lo, zf32]))), active=regen)
            c = ff.where(regen, cn, c)
            s = where(regen, sn, s)
            H0 = rowsk_cxff(H0, k, lmat_cxff(c, s), lo=k, hi=rhi,
                            active=act)
            H = at_set(H, 0, H0)
            Z = zup(Z, 0, k, rmat_adj_cxff(c, s), active=act)

            def fac_body(t, carry):
                H, Z, c, s = carry
                l = jnp.int32(p - 1) - t
                Hl = cxff.fac_get(H, l)

                def pos(args):
                    Hl, c, s = args
                    Hl = colsk_cxff(Hl, k, rmat_adj_cxff(c, s), lo=clo,
                                    hi=k + 2, active=act)
                    fg = getcol_cxff(Hl, k, k, 2)
                    cn, sn, r = givens_cxff(
                        CXF(FF(fg.re.hi[0], fg.re.lo[0]),
                            FF(fg.im.hi[0], fg.im.lo[0])),
                        CXF(FF(fg.re.hi[1], fg.re.lo[1]),
                            FF(fg.im.hi[1], fg.im.lo[1])))
                    Hl = setcol_cxff(
                        Hl, k, k,
                        CXF(FF(jnp.stack([r.re.hi, zf32]),
                               jnp.stack([r.re.lo, zf32])),
                            FF(jnp.stack([r.im.hi, zf32]),
                               jnp.stack([r.im.lo, zf32]))), active=act)
                    Hl = rowsk_cxff(Hl, k, lmat_cxff(cn, sn), lo=k + 1,
                                    hi=rhi, active=act)
                    return Hl, cn, sn

                def neg_(args):
                    Hl, c, s = args
                    Hl = rowsk_cxff(Hl, k, lmat_cxff(c, s), lo=k, hi=rhi,
                                    active=act)
                    fg = getrow_cxff(Hl, k + 1, k, 2)
                    cn, sn, r = givens_cxff(
                        CXF(FF(fg.re.hi[1], fg.re.lo[1]),
                            FF(fg.im.hi[1], fg.im.lo[1])),
                        CXF(FF(fg.re.hi[0], fg.re.lo[0]),
                            FF(fg.im.hi[0], fg.im.lo[0])))
                    Hl = setrow_cxff(
                        Hl, k + 1, k,
                        CXF(FF(jnp.stack([zf32, r.re.hi]),
                               jnp.stack([zf32, r.re.lo])),
                            FF(jnp.stack([zf32, r.im.hi]),
                               jnp.stack([zf32, r.im.lo]))), active=act)
                    Hl = colsk_cxff(Hl, k, lmat_cxff(cn, sn), lo=clo,
                                    hi=k + 1, active=act)
                    return Hl, cn, neg(sn)

                Hl, cn, sn = lax.cond(S_arr[l], pos, neg_, (Hl, c, s))
                H = cxff.fac_set(H, l, Hl)
                c = ff.where(act, cn, c)
                s = where(act, sn, s)
                Z = zup_dyn(Z, l, k, rmat_adj_cxff(c, s), active=act)
                return H, Z, c, s

            if p > 1:
                H, Z, c, s = lax.fori_loop(0, p - 1, fac_body,
                                           (H, Z, c, s))
            H0 = colsk_cxff(_fget(H, 0), k, rmat_adj_cxff(c, s), lo=clo,
                            hi=jnp.minimum(k + 3, n), active=act)
            H = at_set(H, 0, H0)
            return H, Z, c, s

        H, Z, c, s = lax.fori_loop(0, n - 1, sweep_step, (H, Z, c, s))
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    from .pqz_deflate_ff import make_deflate_cores_ff
    pos_core, neg_core, czshift_core = make_deflate_cores_ff(
        p=p, n=n, S=S, want_z=want_z, ulp=ulp, smlnum=smlnum)

    def act_pos(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        H, Z = pos_core(H, Z, info["jlo"], info["ldef"], info["jdef"], ilast)
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    def act_neg(st, info):
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st
        H, Z = neg_core(H, Z, info["jlo"], info["ldef"], info["jdef"], ilast)
        return (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)

    # ------------------------------------------------------------------
    def body(full):
        st, jiter, _ = full
        H, Z, alr, ali, be, sc, ilast, iiter, ziter, key = st

        # f32 hi-component magnitudes: threshold-grade (policy in module
        # docstring)
        def habs2(rehi, imhi):
            return jnp.hypot(rehi, imhi)

        d0 = habs2(jnp.diagonal(H.re.hi[0]), jnp.diagonal(H.im.hi[0]))
        z1 = jnp.zeros((1,), jnp.float32)
        sub0 = habs2(jnp.concatenate([z1, jnp.diagonal(H.re.hi[0], -1)]),
                     jnp.concatenate([z1, jnp.diagonal(H.im.hi[0], -1)]))
        d0m = jnp.concatenate([z1, d0[:-1]])
        tol1 = jnp.maximum(jnp.float32(ulp) * (d0m + d0),
                           jnp.float32(smlnum))
        neg1 = (sub0 <= tol1) & (iv >= 1) & (iv <= ilast)
        any1 = jnp.any(neg1)
        jstar = jnp.max(jnp.where(neg1, iv, -1))
        jlo = jnp.where(any1, jstar, 0)
        split1 = (ilast == 0) | (any1 & (jstar == ilast))
        H = at_set(H, 0, setel_cxff(_fget(H, 0), jstar, jstar - 1,
                                    cxff.zeros(()), active=any1))

        dl = habs2(jnp.diagonal(H.re.hi, axis1=1, axis2=2),
                   jnp.diagonal(H.im.hi, axis1=1, axis2=2))
        zp1 = jnp.zeros((p, 1), jnp.float32)
        sup = habs2(jnp.concatenate([jnp.diagonal(H.re.hi, 1, 1, 2), zp1],
                                    axis=1),
                    jnp.concatenate([jnp.diagonal(H.im.hi, 1, 1, 2), zp1],
                                    axis=1))
        supm1 = jnp.concatenate([zp1, sup[:, :-1]], axis=1)
        toltr = jnp.where(
            iv[None, :] == ilast, supm1,
            jnp.where(iv[None, :] == jlo, sup, supm1 + sup))
        # 4x ulp: ds-REDUCED factors carry ~1-2 ulp_ds of junk in exactly
        # singular diagonals (measured 1.2 ulp at a planted zero), so the
        # 1-ulp threshold of the exact-f64 core (reference
        # src/generalized.jl:323-353) would marginally miss them here
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

        action = jnp.where(
            split1, 0,
            jnp.where(has_pos, 1,
                      jnp.where(has_neg, 2,
                                jnp.where((ziter >= 7) | (ziter < 0), 3,
                                          4))))

        info = {"jlo": jlo, "ldef": ldef, "jdef": jdef}
        st = (H, Z, alr, ali, be, sc, ilast, iiter, ziter, key)
        if defer_deflate:
            # singular-factor deflations + controlled zero shift EXIT the
            # loop as a request (dreq) the chunked driver fulfils through
            # lazily-jitted functions — their traces dominate compile time
            def act_stub(st, info):
                return st

            st = lax.switch(action, [act_split, act_stub, act_stub,
                                     act_stub, act_sweep], st, info)
            deferred = (action >= 1) & (action <= 3)
            dreq = jnp.where(deferred,
                             jnp.stack([action, jlo, ldef, jdef]),
                             jnp.zeros((4,), jnp.int32))
        else:
            st = lax.switch(action, [act_split, act_pos, act_neg,
                                     act_czshift, act_sweep], st, info)
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
        st0 = (H, Z, alr0, ali0, beta0, scal0, jnp.int32(n - 1),
               jnp.int32(0), jnp.int32(ziter0), key0)
        jiter0 = jnp.int32(0)
    (st, jiter, dreq) = lax.while_loop(cond, body_guarded,
                                       (st0, jiter0, dreq0))
    (H, Z, alr, ali, be, sc, ilast, _, _, _) = st
    ok = ilast < 0
    done = (ilast < 0) | (jiter >= maxit)
    final_state = (st, jiter, dreq)

    if not skip_post:
        H, Z = _postprocess_cx(H, Z, S, want_z)

    zout = (Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo) if want_z else (None,) * 4
    out = (H.re.hi, H.re.lo, H.im.hi, H.im.lo) + zout + (alr, ali, be, sc,
                                                         ok)
    if with_info:
        out = out + ({"niter": jiter, "maxit": jnp.int32(maxit)},)
    if return_state:
        return out + (final_state, done)
    return out


def _postprocess_cx(H: CXF, Z, S, want_z: bool):
    """Exit postprocess of the ds complex core: triu structural scrub +
    real-nonneg triangular diagonals with phases pushed into Z/neighbor
    (reference src/generalized.jl:860-908) — ds throughout."""
    p, n, _ = H.re.hi.shape
    safmin = 1.175494e-38
    S_arr2 = jnp.asarray(S)

    # structural enforcement: on exit every factor is upper triangular;
    # sub-triangular ds junk (lo-component differences the masked updates
    # cannot cancel exactly) is provably below the diagonal
    H = CXF(FF(jnp.triu(H.re.hi), jnp.triu(H.re.lo)),
            FF(jnp.triu(H.im.hi), jnp.triu(H.im.lo)))

    def cmul_bc(X: CXF, ph: CXF, col: bool) -> CXF:
        ax = (slice(None), None) if not col else (None, slice(None))
        pr = FF(ph.re.hi[ax], ph.re.lo[ax])
        pi = FF(ph.im.hi[ax], ph.im.lo[ax])
        return CXF(ff.sub(ff.mul(pr, X.re), ff.mul(pi, X.im)),
                   ff.add(ff.mul(pr, X.im), ff.mul(pi, X.re)))

    def post_body(t, HZ):
        H, Z = HZ
        l = jnp.int32(p - 1) - t
        Hl = cxff.fac_get(H, l)
        dg = CXF(FF(jnp.diagonal(Hl.re.hi), jnp.diagonal(Hl.re.lo)),
                 FF(jnp.diagonal(Hl.im.hi), jnp.diagonal(Hl.im.lo)))
        absd = cxff.cabs(dg)
        big = absd.hi > safmin
        safe = ff.where(ff.eq0(absd), ff.full_like(absd, 1.0), absd)
        zph = where(big, CXF(ff.div(dg.re, safe), ff.neg(ff.div(dg.im,
                                                                safe))),
                    CXF(ff.ff(jnp.ones_like(absd.hi)),
                        ff.zeros(absd.hi.shape)))
        newdiag = where(big, CXF(absd, ff.zeros(absd.hi.shape)), dg)
        sl = S_arr2[jnp.clip(l, 0, p - 1)]
        Hl = where(sl, cmul_bc(Hl, zph, col=False),
                   cmul_bc(Hl, zph, col=True))
        sf = where(sl, zph, conj(zph))
        rr = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cc = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        Hl = where(rr == cc,
                   CXF(FF(jnp.diag(newdiag.re.hi), jnp.diag(newdiag.re.lo)),
                       FF(jnp.diag(newdiag.im.hi), jnp.diag(newdiag.im.lo))),
                   Hl)
        H = cxff.fac_set(H, l, Hl)
        if want_z:
            Zl = cmul_bc(cxff.fac_get(Z, l), conj(sf), col=True)
            Z = cxff.fac_set(Z, l, Zl)
        lm = l - 1
        Hm = cxff.fac_get(H, lm)
        sm = S_arr2[jnp.clip(lm, 0, p - 1)]
        Hm = where(sm, cmul_bc(Hm, conj(sf), col=True),
                   cmul_bc(Hm, sf, col=False))
        H = cxff.fac_set(H, lm, Hm)
        return H, Z

    if p > 1:
        H, Z = lax.fori_loop(0, p - 1, post_body, (H, Z))
    return H, Z


@functools.lru_cache(maxsize=16)
def _deferred_fns_cx(p: int, n: int, S: Tuple[bool, ...], want_z: bool):
    """Separately-jitted deflation actions + exit postprocess for the
    DEFERRED chunked protocol: the rarely-taken singular-factor branches
    dominate the chunked core's (remote) compile time, so the while-loop
    exits when one is requested and the host runs these lazily-compiled
    functions instead (each compiles only if its case actually occurs)."""
    ulp = float(ff.EPS)
    unfl = 1.175494e-38
    smlnum = unfl * (n / ulp)
    from .pqz_deflate_ff import make_deflate_cores_ff
    pos_core, neg_core, czshift_core = make_deflate_cores_ff(
        p=p, n=n, S=S, want_z=want_z, ulp=ulp, smlnum=smlnum)

    def _wrap(H8, fn):
        H = CXF(FF(H8[0], H8[1]), FF(H8[2], H8[3]))
        Z = CXF(FF(H8[4], H8[5]), FF(H8[6], H8[7]))
        return H, Z

    @jax.jit
    def run_pos(H8, jlo, ldef, jdef, ilast):
        H, Z = _wrap(H8, None)
        H, Z = pos_core(H, Z, jlo, ldef, jdef, ilast)
        return (H.re.hi, H.re.lo, H.im.hi, H.im.lo,
                Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo)

    @jax.jit
    def run_neg(H8, jlo, ldef, jdef, ilast):
        H, Z = _wrap(H8, None)
        H, Z = neg_core(H, Z, jlo, ldef, jdef, ilast)
        return (H.re.hi, H.re.lo, H.im.hi, H.im.lo,
                Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo)

    @jax.jit
    def run_cz(H8, jlo, ilast):
        H, Z = _wrap(H8, None)
        H, Z, zflag = czshift_core(H, Z, jlo, ilast)
        return (H.re.hi, H.re.lo, H.im.hi, H.im.lo,
                Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo, zflag)

    @jax.jit
    def run_post(H8):
        H, Z = _wrap(H8, None)
        H, Z = _postprocess_cx(H, Z, S, want_z)
        return (H.re.hi, H.re.lo, H.im.hi, H.im.lo,
                Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo)

    return run_pos, run_neg, run_cz, run_post


def pqz_complex_core_ff_chunked(
    Hrehi, Hrelo, Himhi, Himlo, S, Z4=None, want_z=True, want_t=True,
    maxitfac=30, seed=1234, chunk_iters=None, cfg=None,
    pallas_sweep=False, interpret=False,
):
    """Host-chunked ds split-complex QZ (axon ~60 s execute kill timer).

    Same returns as :func:`pqz_complex_core_ff`; the loop state stays
    on-device between chunk calls and every chunk reuses the ONE resume
    trace of the core.  Between chunks the host runs aggressive early
    deflation (ops/aed.py complex/generalized variant, ``cfg.aed``):
    converged trailing eigenvalues are harvested from the window spike
    without further single-shift sweeps.
    """
    from ..config import default_config
    if cfg is None:
        cfg = default_config
    p, n, _ = Hrehi.shape
    if n == 1:
        return pqz_complex_core_ff(Hrehi, Hrelo, Himhi, Himlo, S, Z4,
                                   want_z=want_z, want_t=want_t,
                                   maxitfac=maxitfac, seed=seed)
    maxit = maxitfac * n
    if chunk_iters is None:
        if pallas_sweep:
            # fused-kernel sweep: per-step cost tracks the real core's
            # (~0.5 ms/step device at p=16 n=256); size chunks like
            # pqr_real_core_ff_chunked
            per_iter = 4.0 * p * n * n * 1e-8
            chunk_iters = min(256, max(16, int(20.0 / max(per_iter, 1e-9))))
        else:
            # XLA-glue core: per-iteration cost is dominated by the ~30
            # slab-op dispatches per (sweep step, factor) at ~1-2 us device
            # latency, not by bandwidth — floor the per-element estimate
            # accordingly.  Target <= ~10 s per execute (axon kills single
            # executes ~60 s).
            per_iter = 4.0 * p * n * max(n * 1e-8, 1.2e-5)
            chunk_iters = max(16, int(10.0 / max(per_iter, 1e-9)))

    # Build the initial loop state here (MUST mirror the core's setup) so
    # every chunk call uses the ONE resume trace of the core (same device
    # as pqr_real_core_ff_chunked).
    import math as _math
    ziter0 = -1 if p >= _math.log2(2.2250738585072014e-308) / \
        _math.log2(2.220446049250313e-16) else 0

    @jax.jit
    def _init(Hrehi, Hrelo, Himhi, Himlo, Z4):
        H = CXF(FF(Hrehi, Hrelo), FF(Himhi, Himlo))
        if want_z:
            if Z4 is None:
                eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                       (p, n, n))
                zf = jnp.zeros((p, n, n), jnp.float32)
                Z = CXF(FF(eye, zf), FF(zf, zf))
            else:
                Z = CXF(FF(Z4[0], Z4[1]), FF(Z4[2], Z4[3]))
        else:
            Z = cxff.zeros((p, 1, 1))
        st0 = (H, Z, jnp.zeros((n,), jnp.float64),
               jnp.zeros((n,), jnp.float64), jnp.zeros((n,), jnp.float32),
               jnp.zeros((n,), jnp.int32), jnp.int32(n - 1), jnp.int32(0),
               jnp.int32(ziter0), jax.random.PRNGKey(seed))
        return (st0, jnp.int32(0), jnp.zeros((4,), jnp.int32))

    # ---- aggressive early deflation plumbing (ops/aed.py, cx variant) ---
    import numpy as _np
    aed_w = cfg.aed_window if cfg.aed_window else min(48, max(16, n // 10))
    aed_itv = cfg.aed_interval if cfg.aed_interval else max(24, n // 6)
    aed_on = bool(cfg.aed) and aed_w >= 4 and n >= aed_w + 4 \
        and (n >= cfg.aed_min_n or cfg.aed_window > 0)
    from . import ff as _ff
    from .aed import status_pull_cx
    _ulp_cx = float(_ff.EPS)
    if aed_on:
        from .aed import aed_analyze_cx, aed_apply_cxff, aed_pull_cxff
        h0 = (_np.asarray(Hrehi[0], _np.float64) +
              _np.asarray(Hrelo[0], _np.float64)) + 1j * (
            _np.asarray(Himhi[0], _np.float64) +
            _np.asarray(Himlo[0], _np.float64))
        # max-norm contract scale (see ops/pqr_ff.py note)
        aed_tol = _ulp_cx * float(n) ** 0.5 * float(_np.abs(h0).max())
        seg = min(chunk_iters, aed_itv)
        misses = 0
    else:
        seg = chunk_iters

    # ---- host-tail finish plumbing (cfg.host_tail; see ops/pqr_ff.py) ---
    if cfg.host_tail >= 0:
        from .. import native as _native
        if cfg.host_tail > 0:
            tail_n = min(cfg.host_tail, n)
        else:
            tail_n = min(64, n // 8) if _native.available() else 0
    else:
        tail_n = 0
    if tail_n >= 2:
        from .aed import aed_analyze_cx as _tail_an_cx
        from .aed import aed_apply_cxff as _tail_ap_cx
        h0t = (_np.asarray(Hrehi[0], _np.float64) +
               _np.asarray(Hrelo[0], _np.float64)) + 1j * (
            _np.asarray(Himhi[0], _np.float64) +
            _np.asarray(Himlo[0], _np.float64))
        tail_tol = _ulp_cx * float(n) ** 0.5 * float(_np.abs(h0t).max())

    def _try_tail(full, ilast_c):
        """Finish the leading window [0, ilast] on the host (beta = 0:
        everything deflates through one native cx window pQZ; fixed-shape
        embedding as in ops/pqr_ff._try_tail)."""
        st, jiter, dreq = full
        (H, Z, alre, alim, be, sc, ilast, iiter, ziter, key) = st
        m = ilast_c + 1
        wfix = tail_n
        from ..config import verbosity

        def f64w(X):
            return (_np.asarray(X.hi[:, :wfix, :wfix], _np.float64) +
                    _np.asarray(X.lo[:, :wfix, :wfix], _np.float64))

        Hbig = f64w(H.re) + 1j * f64w(H.im)
        try:
            res = _tail_an_cx(Hbig[:, :m, :m], S, 0.0, tail_tol)
        except Exception as e:  # pragma: no cover - defensive host path
            if verbosity("main") >= 1:
                print(f"[pqz_ff tail] analysis failed ({e!r}); skipping")
            res = None
        if res is None or res[0] != m:
            return full, False
        d, Wf, Zt, alw, bew, scw, _sph = res
        Vp = _np.broadcast_to(_np.eye(wfix, dtype=complex),
                              (p, wfix, wfix)).copy()
        Wp = Hbig.copy()
        for l in range(p):
            ln = (l + 1) % p
            Vp[l][:m, :m] = Zt[l]
            Wp[l][:m, :m] = Wf[l]
            Vleft = Zt[l] if S[l] else Zt[ln]
            Wp[l][:m, m:] = Vleft.conj().T @ Hbig[l][:m, m:]
        zsp = _np.zeros(wfix)
        lre = _np.zeros(wfix)
        lim = _np.zeros(wfix)
        lbe = _np.zeros(wfix)
        lsc = _np.zeros(wfix, _np.int32)
        lre[:m] = alw[:m].real
        lim[:m] = alw[:m].imag
        lbe[:m] = bew[:m]
        lsc[:m] = scw[:m]
        Hn = _tail_ap_cx(
            H.re.hi, H.re.lo, H.im.hi, H.im.lo,
            Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo,
            jnp.asarray(Vp.real), jnp.asarray(Vp.imag),
            jnp.asarray(Wp.real), jnp.asarray(Wp.imag),
            jnp.asarray(zsp), jnp.asarray(zsp),
            jnp.int32(0), S, want_z=want_z,
            alre=alre, alim=alim, be=be, sc=sc,
            lam_re=jnp.asarray(lre), lam_im=jnp.asarray(lim),
            lam_be=jnp.asarray(lbe), lam_sc=jnp.asarray(lsc),
            u=jnp.int32(0), nlam=jnp.int32(m))
        Hq = CXF(FF(Hn[0], Hn[1]), FF(Hn[2], Hn[3]))
        Zq = CXF(FF(Hn[4], Hn[5]), FF(Hn[6], Hn[7]))
        if verbosity("main") >= 1:
            print(f"[pqz_ff tail] host-finished the leading {m}-window")
        ziter_n = jnp.where(jnp.int32(ziter) != -1, jnp.int32(0),
                            jnp.int32(ziter))
        st = (Hq, Zq, Hn[8], Hn[9], Hn[10], Hn[11],
              jnp.int32(-1), jnp.int32(0), ziter_n, key)
        return (st, jiter, dreq), True

    def _try_aed(full, i_cur, Hwin, beta):
        nonlocal misses, seg
        st, jiter, dreq = full
        (H, Z, alre, alim, be, sc, ilast, iiter, ziter, key) = st
        w = aed_w
        if i_cur + 1 < w + 2:
            return full
        s = i_cur - w + 1
        from ..config import verbosity
        try:
            res = aed_analyze_cx(Hwin, S, beta, aed_tol,
                                 max_moves=None if cfg.aed_max_moves < 0 else cfg.aed_max_moves)
        except Exception as e:  # pragma: no cover - defensive host path
            if verbosity("main") >= 1:
                print(f"[pqz_ff aed] analysis failed ({e!r}); skipping")
            res = None
        if res is None:
            misses += 1
            if misses >= 2:
                seg = min(seg * 2, chunk_iters)
            return full
        misses = 0
        seg = min(chunk_iters, aed_itv)
        d, Wf, Zt, alw, bew, scw, sph = res
        u = w - d
        Hn = aed_apply_cxff(
            H.re.hi, H.re.lo, H.im.hi, H.im.lo,
            Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo,
            jnp.asarray(Zt.real), jnp.asarray(Zt.imag),
            jnp.asarray(Wf.real), jnp.asarray(Wf.imag),
            jnp.asarray(sph.real), jnp.asarray(sph.imag),
            jnp.int32(s), S, want_z=want_z,
            alre=alre, alim=alim, be=be, sc=sc,
            lam_re=jnp.asarray(alw.real), lam_im=jnp.asarray(alw.imag),
            lam_be=jnp.asarray(_np.asarray(bew, _np.float64)),
            lam_sc=jnp.asarray(_np.asarray(scw, _np.int32)),
            u=jnp.int32(u), nlam=jnp.int32(w))
        Hq = CXF(FF(Hn[0], Hn[1]), FF(Hn[2], Hn[3]))
        Zq = CXF(FF(Hn[4], Hn[5]), FF(Hn[6], Hn[7]))
        if verbosity("main") >= 1:
            print(f"[pqz_ff aed] deflated {d} at ilast={i_cur} "
                  f"(window {w})")
        ziter_n = jnp.where(jnp.int32(ziter) != -1, jnp.int32(0),
                            jnp.int32(ziter))
        st = (Hq, Zq, Hn[8], Hn[9], Hn[10], Hn[11],
              jnp.int32(i_cur - d), jnp.int32(0), ziter_n, key)
        return (st, jiter, dreq)

    def _fulfil_deferred(state, code):
        """Run the requested deflation through the lazily-jitted cores.
        ``code`` comes from the packed boundary pull (no extra blocking
        scalar transfer)."""
        st, jiter, dreq = state
        (H, Z, alre, alim, be, sc, ilast, iiter, ziter, key) = st
        run_pos, run_neg, run_cz, _ = _deferred_fns_cx(p, n, S, want_z)
        H8 = (H.re.hi, H.re.lo, H.im.hi, H.im.lo,
              Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo)
        if code == 1:
            out8 = run_pos(H8, dreq[1], dreq[2], dreq[3], ilast)
        elif code == 2:
            out8 = run_neg(H8, dreq[1], dreq[2], dreq[3], ilast)
        else:
            *out8, zflag = run_cz(H8, dreq[1], ilast)
            ziter = jnp.where(zflag, jnp.int32(1), jnp.int32(0))
        Hq = CXF(FF(out8[0], out8[1]), FF(out8[2], out8[3]))
        Zq = CXF(FF(out8[4], out8[5]), FF(out8[6], out8[7])) if want_z \
            else Z
        st = (Hq, Zq, alre, alim, be, sc, ilast, iiter, ziter, key)
        return (st, jiter, jnp.zeros((4,), jnp.int32))

    from ..config import verbosity
    state = _init(Hrehi, Hrelo, Himhi, Himlo, Z4)
    cap = 0
    first = True
    while True:
        cap = min(cap + seg, maxit)
        if verbosity("main") >= 1 and first:
            print("[pqz_ff chunk] compiling/launching first chunk "
                  f"(cap={cap})", flush=True)
        out = pqz_complex_core_ff(
            Hrehi, Hrelo, Himhi, Himlo, S, Z4, want_z=want_z,
            want_t=want_t, maxitfac=maxitfac, seed=seed,
            it_cap=jnp.int32(cap), resume_state=state, return_state=True,
            pallas_sweep=pallas_sweep, interpret=interpret,
            skip_post=True, defer_deflate=True)
        *outs, state, done = out
        # ONE blocking transfer per segment boundary (packed status, plus
        # the trailing AED window when AED is on) — the former int()/
        # bool() scalar pulls each paid a full tunnel round trip per
        # deferred-deflation crossing (see ops/pqr_ff.py boundary note)
        st0b = state[0]
        aed_win = aed_beta = None
        if aed_on:
            packed = _np.asarray(aed_pull_cxff(
                st0b[0].re.hi, st0b[0].re.lo, st0b[0].im.hi, st0b[0].im.lo,
                st0b[6], state[1], state[2], done, w=aed_w))
            jiter_c, ilast_c = int(packed[0]), int(packed[1])
            dreq0 = int(packed[2])
            done_b = bool(packed[6] != 0.0)
            aed_beta = complex(float(packed[7]) + float(packed[8]),
                               float(packed[9]) + float(packed[10]))
            nw = p * aed_w * aed_w
            wre = (packed[11:11 + nw].astype(_np.float64) +
                   packed[11 + nw:11 + 2 * nw].astype(_np.float64))
            wim = (packed[11 + 2 * nw:11 + 3 * nw].astype(_np.float64) +
                   packed[11 + 3 * nw:11 + 4 * nw].astype(_np.float64))
            aed_win = (wre + 1j * wim).reshape(p, aed_w, aed_w)
        else:
            st7 = _np.asarray(status_pull_cx(st0b[6], state[1], state[2],
                                             done))
            jiter_c, ilast_c = int(st7[0]), int(st7[1])
            dreq0 = int(st7[2])
            done_b = bool(st7[6] != 0.0)
        if verbosity("main") >= 1:
            print(f"[pqz_ff chunk] jiter={jiter_c} "
                  f"ilast={ilast_c} dreq={dreq0} "
                  f"done={done_b}", flush=True)
        first = False
        if dreq0 != 0:
            state = _fulfil_deferred(state, dreq0)
            continue
        if done_b or cap >= maxit:
            # exit postprocess (the chunk calls skip it)
            st = state[0]
            H, Z = st[0], st[1]
            _, _, _, run_post = _deferred_fns_cx(p, n, S, want_z)
            out8 = run_post((H.re.hi, H.re.lo, H.im.hi, H.im.lo,
                             Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo))
            zout = tuple(out8[4:]) if want_z else (None,) * 4
            return tuple(out8[:4]) + zout + tuple(outs[8:])
        if tail_n >= 2 and 2 <= ilast_c + 1 <= tail_n:
            state, finished = _try_tail(state, ilast_c)
            if finished:
                continue
        if aed_on:
            state = _try_aed(state, ilast_c, aed_win, aed_beta)


# ---------------------------------------------------------------------------
# ds split-complex SIGNED Hessenberg-triangular reduction (mixed signature)
# — removes the complex128 host staging from the complex pipeline
# (reference src/generalized.jl:988-1082 Kressner two-stage scheme)


def _qr_cxff(A: CXF, Q: Optional[CXF] = None):
    """Householder QR on a CXF matrix: returns (Q_acc, R).

    ``Q`` (optional) is right-multiplied by the accumulated unitary
    (Q <- Q @ Qf), so callers can fold the factor directly into their
    unitary stack; when None a fresh identity accumulates Qf itself.
    """
    n = A.re.hi.shape[0]
    if Q is None:
        eye = jnp.eye(n, dtype=jnp.float32)
        zf = jnp.zeros((n, n), jnp.float32)
        Q = CXF(FF(eye, zf), FF(zf, zf))

    def col(i, carry):
        A, Q = carry
        c = getcol_cxff(A, 0, i, n)
        w, tau, beta = reflector_masked_cxff(c, i)
        A2 = refl_left_cxff(A, w, conj(tau))
        A2 = _fix_column_cxff(A2, i, beta, i + 1)
        Q2 = refl_right_cxff(Q, w, tau)
        return A2, Q2

    A, Q = lax.fori_loop(0, n - 1, col, (A, Q))

    def _triu2(X: FF) -> FF:
        return FF(jnp.triu(X.hi), jnp.triu(X.lo))

    return Q, CXF(_triu2(A.re), _triu2(A.im))


def _flip_ud(X: CXF) -> CXF:
    return CXF(FF(X.re.hi[::-1, :], X.re.lo[::-1, :]),
               FF(X.im.hi[::-1, :], X.im.lo[::-1, :]))


def _flip_lr(X: CXF) -> CXF:
    return CXF(FF(X.re.hi[:, ::-1], X.re.lo[:, ::-1]),
               FF(X.im.hi[:, ::-1], X.im.lo[:, ::-1]))


def _ctrans(X: CXF) -> CXF:
    return CXF(FF(X.re.hi.T, X.re.lo.T), FF(-X.im.hi.T, -X.im.lo.T))


def _rq_cxff(A: CXF):
    """RQ decomposition A = R @ Q via a flipped QR (see hessenberg._rq)."""
    B = _ctrans(_flip_ud(A))             # B = A^H J
    Q1, R1 = _qr_cxff(B)
    R = _flip_lr(_flip_ud(_ctrans(R1)))  # J R1^H J
    Q = _flip_ud(_ctrans(Q1))            # J Q1^H
    return R, Q


def _cmatmul(A: CXF, B: CXF) -> CXF:
    """Dense CXF matmul via 4 ds matmuls (ff.dot rows x cols is O(n^3)
    HLO; use the f64-emulated... no — keep ds exactness with mul+tree-sum
    over the contraction axis)."""
    # (n, k) @ (k, m): contract axis 1 of A with axis 0 of B
    Ar = FF(A.re.hi[:, :, None], A.re.lo[:, :, None])
    Ai = FF(A.im.hi[:, :, None], A.im.lo[:, :, None])
    Br = FF(B.re.hi[None, :, :], B.re.lo[None, :, :])
    Bi = FF(B.im.hi[None, :, :], B.im.lo[None, :, :])
    re = ff.sum_(ff.sub(ff.mul(Ar, Br), ff.mul(Ai, Bi)), 1)
    im = ff.sum_(ff.add(ff.mul(Ar, Bi), ff.mul(Ai, Br)), 1)
    return CXF(re, im)


@partial(jax.jit, static_argnames=("S", "want_q", "grouped", "final",
                                   "init_q"))
def phessenberg_signed_core_cxff(Arehi, Arelo, Aimhi, Aimlo,
                                 S: Tuple[bool, ...], want_q: bool = True,
                                 grouped: bool = True, Qin=None,
                                 s0=None, s1=None, j0=None, j1=None,
                                 final: bool = True, init_q: bool = True):
    """ds split-complex generalized Hessenberg-triangular reduction.

    Mirrors ops/hessenberg.phessenberg_signed_core (reference
    src/generalized.jl:988-1179): stage 1 QR/RQ triangularization with
    sign-dependent neighbor propagation, stage 2 Givens Hessenberg
    reduction of factor 0 with per-factor re-triangularization — all in
    complex float-float arithmetic, so the mixed-signature complex
    pipeline no longer stages through the complex128 host path.

    ``grouped=True`` (default) runs stage 2 through the grouped-chain
    rewrite (ops/hess_grouped.py): bitwise-identical rotation generation
    in narrow-band scans plus composed-group slab applications — ~an
    order of magnitude fewer sequential device dispatches (the
    rotation-at-a-time stage 2 measured 15.45 s of the 16.59 s complex
    on-chip record; BASELINE.md).  ``grouped=False`` keeps the
    rotation-at-a-time reference path.

    Chunk-resume hooks (used by
    :func:`phessenberg_signed_core_cxff_chunked` so each device execute
    stays under the axon ~60 s kill): ``s0``/``s1`` bound the stage-1
    factor loop, ``j0``/``j1`` the stage-2 column loop (traced int32;
    None = the full range), ``init_q`` builds Q as identity vs resuming
    from ``Qin`` (4 arrays), ``final=False`` returns the RAW carried
    state (no structural packing) for the next chunk.

    Returns (H 4-arrays, Q 4-arrays-or-Nones).
    """
    p, n, _ = Arehi.shape
    assert S[0], "signature entry S[0] must be True"
    A = CXF(FF(Arehi, Arelo), FF(Aimhi, Aimlo))
    if not want_q:
        Q = None
    elif init_q:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
        zf = jnp.zeros((p, n, n), jnp.float32)
        Q = CXF(FF(eye, zf), FF(zf, zf))
    else:
        Q = CXF(FF(Qin[0], Qin[1]), FF(Qin[2], Qin[3]))

    def fset(X: CXF, j, M: CXF) -> CXF:
        return at_set(X, j, M)

    # ---- stage 1: QR / RQ triangularization -------------------------
    # fori + cond with dynamic factor access (not python-unrolled: the
    # per-factor QR graph is large and the remote TPU compiler dies on
    # the p-fold unrolled version at p >= ~6)
    S_arr = jnp.asarray(S)

    def stage1(t, AQ):
        A, Q = AQ
        l = jnp.int32(p - 1) - t
        lm = jnp.clip(l - 1, 0, p - 1)
        Al = cxff.fac_get(A, l)

        def qr_branch(args):
            A, Q, Al = args
            Qf, R = _qr_cxff(Al)
            A = cxff.fac_set(A, l, R)
            Am = cxff.fac_get(A, lm)
            Am = lax.cond(S_arr[lm],
                          lambda x: _cmatmul(x, Qf),
                          lambda x: _cmatmul(_ctrans(Qf), x), Am)
            A = cxff.fac_set(A, lm, Am)
            if want_q:
                Q = cxff.fac_set(Q, l,
                                 _cmatmul(cxff.fac_get(Q, l), Qf))
            return A, Q

        def rq_branch(args):
            A, Q, Al = args
            R, Qf = _rq_cxff(Al)
            A = cxff.fac_set(A, l, R)
            Am = cxff.fac_get(A, lm)
            Am = lax.cond(S_arr[lm],
                          lambda x: _cmatmul(x, _ctrans(Qf)),
                          lambda x: _cmatmul(Qf, x), Am)
            A = cxff.fac_set(A, lm, Am)
            if want_q:
                Q = cxff.fac_set(Q, l,
                                 _cmatmul(cxff.fac_get(Q, l), _ctrans(Qf)))
            return A, Q

        return lax.cond(S_arr[jnp.clip(l, 0, p - 1)], qr_branch, rq_branch,
                        (A, Q, Al))

    sa = jnp.int32(0) if s0 is None else jnp.asarray(s0, jnp.int32)
    sb = jnp.int32(p - 1) if s1 is None else jnp.asarray(s1, jnp.int32)
    if p > 1:
        A, Q = lax.fori_loop(sa, sb, stage1, (A, Q))

    def _pack(A, Q):
        def t0(x, k):
            return jnp.concatenate(
                [jnp.triu(x[:1], k)] + ([jnp.triu(x[1:])] if p > 1 else []),
                axis=0)
        H = CXF(FF(t0(A.re.hi, -1), t0(A.re.lo, -1)),
                FF(t0(A.im.hi, -1), t0(A.im.lo, -1)))
        out = (H.re.hi, H.re.lo, H.im.hi, H.im.lo)
        if want_q:
            return out + (Q.re.hi, Q.re.lo, Q.im.hi, Q.im.lo)
        return out + (None, None, None, None)

    def _raw(A, Q):
        out = (A.re.hi, A.re.lo, A.im.hi, A.im.lo)
        if want_q:
            return out + (Q.re.hi, Q.re.lo, Q.im.hi, Q.im.lo)
        return out + (None, None, None, None)

    def _out(A, Q):
        return _pack(A, Q) if final else _raw(A, Q)

    if n <= 2:
        return _out(A, Q)

    if grouped:
        from .hess_grouped import stage2_grouped
        Qg = Q if want_q else cxff.zeros((p, 1, 1))
        A, Qg = stage2_grouped(A, Qg, S_arr, want_q, j0=j0, j1=j1)
        return _out(A, Qg if want_q else None)

    # ---- stage 2: Givens Hessenberg reduction of factor 0 -----------
    zero_c = cxff.zeros(())

    def col_step(j, carry):
        A, Q = carry
        Gc0 = ff.ff(jnp.ones((n,), jnp.float32))
        Gs0 = cxff.zeros((n,))

        def chain_desc(M: CXF, Gc: FF, Gs: CXF, lo_i) -> CXF:
            def bd(t, M):
                i = n - 1 - t
                act = i >= lo_i
                from .cxff import fvget, vget
                return colsk_cxff(M, i - 1,
                                  rmat_adj_cxff(fvget(Gc, i), vget(Gs, i)),
                                  active=act)
            return lax.fori_loop(0, n, bd, M)

        from .cxff import fvget, fvset, vget, vset

        def a_step(t, carry):
            A0, Gc, Gs = carry
            i = n - 1 - t
            act = i >= j + 2
            c, s, r = givens_cxff(getel_cxff(A0, i - 1, j),
                                  getel_cxff(A0, i, j))
            A0 = setel_cxff(A0, i - 1, j, r, active=act)
            A0 = setel_cxff(A0, i, j, zero_c, active=act)
            A0 = rowsk_cxff(A0, i - 1, lmat_cxff(c, s), lo=j + 1,
                            active=act)
            Gc = fvset(Gc, i, c, act)
            Gs = vset(Gs, i, s, act)
            return A0, Gc, Gs

        A0, Gc, Gs = lax.fori_loop(0, n, a_step, (_fget(A, 0), Gc0, Gs0))
        A = fset(A, 0, A0)
        if want_q:
            Q = fset(Q, 0, chain_desc(_fget(Q, 0), Gc, Gs, j + 2))

        def b_outer(t0, carry):
            A, Q, Gc, Gs = carry
            l = jnp.int32(p - 1) - t0

            def b_pos(t, carry):
                Al, Gc, Gs = carry
                i = n - 1 - t
                act = i >= j + 2
                Al = colsk_cxff(Al, i - 1,
                                rmat_adj_cxff(fvget(Gc, i),
                                              vget(Gs, i)),
                                hi=i + 1, active=act)
                c, s, r = givens_cxff(getel_cxff(Al, i - 1, i - 1),
                                      getel_cxff(Al, i, i - 1))
                Al = setel_cxff(Al, i - 1, i - 1, r, active=act)
                Al = setel_cxff(Al, i, i - 1, zero_c, active=act)
                Al = rowsk_cxff(Al, i - 1, lmat_cxff(c, s), lo=i,
                                active=act)
                Gc = fvset(Gc, i, c, act)
                Gs = vset(Gs, i, s, act)
                return Al, Gc, Gs

            def b_neg(t, carry):
                Al, Gc, Gs = carry
                i = n - 1 - t
                act = i >= j + 2
                Al = rowsk_cxff(Al, i - 1,
                                lmat_cxff(fvget(Gc, i), vget(Gs, i)),
                                lo=i - 1, active=act)
                c, s, r = givens_cxff(getel_cxff(Al, i, i),
                                      getel_cxff(Al, i, i - 1))
                Al = setel_cxff(Al, i, i, r, active=act)
                Al = setel_cxff(Al, i, i - 1, zero_c, active=act)
                Al = colsk_cxff(Al, i - 1, lmat_cxff(c, s), hi=i,
                                active=act)
                Gc = fvset(Gc, i, c, act)
                Gs = vset(Gs, i, neg(s), act)
                return Al, Gc, Gs

            Al, Gc, Gs = lax.cond(
                S_arr[jnp.clip(l, 0, p - 1)],
                lambda a: lax.fori_loop(0, n, b_pos, a),
                lambda a: lax.fori_loop(0, n, b_neg, a),
                (cxff.fac_get(A, l), Gc, Gs))
            A = cxff.fac_set(A, l, Al)
            if want_q:
                Q = cxff.fac_set(
                    Q, l, chain_desc(cxff.fac_get(Q, l), Gc, Gs, j + 2))
            return A, Q, Gc, Gs

        if p > 1:
            A, Q, Gc, Gs = lax.fori_loop(0, p - 1, b_outer, (A, Q, Gc, Gs))

        def c_step(t, A0):
            i = n - 1 - t
            act = i >= j + 2
            return colsk_cxff(A0, i - 1,
                              rmat_adj_cxff(fvget(Gc, i), vget(Gs, i)),
                              active=act)

        A = fset(A, 0, lax.fori_loop(0, n, c_step, _fget(A, 0)))
        return A, Q

    ja = jnp.int32(0) if j0 is None else jnp.asarray(j0, jnp.int32)
    jb = jnp.int32(n - 2) if j1 is None else jnp.asarray(j1, jnp.int32)
    A, Q = lax.fori_loop(ja, jb, col_step, (A, Q))
    return _out(A, Q)


def phessenberg_signed_core_cxff_chunked(Arehi, Arelo, Aimhi, Aimlo,
                                         S: Tuple[bool, ...],
                                         want_q: bool = True,
                                         grouped: bool = True,
                                         stage1_factors: int = None,
                                         chunk_cols: int = None):
    """Host-chunked ds signed reduction (bitwise = the single-shot core).

    The un-chunked reduction's single device execute measured 33 s at
    p=6 n=128 (BASELINE.md) — borderline against the axon runtime's
    ~60 s execute kill and a guaranteed kill at larger sizes.  This
    driver splits the SAME core (:func:`phessenberg_signed_core_cxff`)
    into bounded executes via its fori-range hooks: stage 1 in
    ``stage1_factors``-factor chunks, stage 2 in ``chunk_cols``-column
    chunks, raw state carried on-device between calls.  Chunk boundaries
    only split fori ranges, so the result is bitwise identical to the
    single-shot run (tested).  Three trace keys total (first / middle /
    final), independent of the chunk counts.
    """
    p, n, _ = Arehi.shape
    if chunk_cols is None:
        # stage-2 cost/col ~ c*p*n^2 with c ~ 1.2e-6 s (15.45 s for the
        # whole p=6 n=128 stage 2 on-chip); target <= ~20 s per execute
        chunk_cols = max(1, min(n, int(20.0 / (1.2e-6 * p * n * n + 1e-12))))
    if stage1_factors is None:
        # stage-1 cost/factor ~ one ds QR ~ 2e-8 * n^3 s
        stage1_factors = max(1, min(max(p - 1, 1),
                                    int(20.0 / (2e-8 * n ** 3 + 1e-12))))
    n1 = max(p - 1, 0)
    n2 = max(n - 2, 0)
    # (s-range, j-range) schedule; the final entry carries final=True
    sched = []
    t = 0
    while t < n1:
        t2 = min(t + stage1_factors, n1)
        sched.append(((t, t2), (0, 0)))
        t = t2
    j = 0
    while j < n2:
        j2 = min(j + chunk_cols, n2)
        sched.append(((n1, n1), (j, j2)))
        j = j2
    if not sched:
        sched = [((0, n1), (0, n2))]
    state = (Arehi, Arelo, Aimhi, Aimlo)
    Qst = None
    for k, ((a, b), (c, d)) in enumerate(sched):
        last = k == len(sched) - 1
        out = phessenberg_signed_core_cxff(
            state[0], state[1], state[2], state[3], S, want_q=want_q,
            grouped=grouped, Qin=Qst,
            s0=jnp.int32(a), s1=jnp.int32(b),
            j0=jnp.int32(c), j1=jnp.int32(d),
            final=last, init_q=(Qst is None))
        state = out[:4]
        if want_q:
            Qst = out[4:8]
    return state + (tuple(Qst) if want_q else (None,) * 4)
