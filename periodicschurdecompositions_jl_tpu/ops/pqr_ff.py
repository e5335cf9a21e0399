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

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import AlgoConfig, default_config
from . import ff
from .ff import FF
from .ffkern import givens_ff, refl_mat_ff, reflector_ff
from .lanv2 import lanv2
from .ffslab import (colsk_ff, fac_get, fac_set, getel_ff,
                     rowsk_ff, setel_ff)
from .pallas_sweep import chase_sweep_ff, chase_sweep_ff_mb
from .smallschur import hess_eigs_small


def _band_products_scaled(H: FF, n):
    """Band entries of the cycle product with a GLOBAL power-of-two scale.

    The axon device emulates float64 on f32 pairs, so even "f64" has f32's
    exponent range (~1e38): unscaled p-long products (measured 2.9e21 at
    p=16, n=512) survive, but their squares in the shift formulas do not
    (sE^2 ~ 7e43 -> inf -> NaN at the first exceptional shift).  The
    recurrence therefore renormalizes by one global 2^-e after every factor;
    the deflation tests and both shift variants are degree-homogeneous in
    the band entries, so they run UNCHANGED on the scaled values, and only
    the 1x1 eigenvalue readout multiplies 2^e back (giving the core a
    |lambda| < ~1e38 representable range on-chip; the generalized cores'
    decomposed (alpha, 2^scale) form covers anything beyond).

    Takes the padded (hi, lo) stack DIRECTLY and extracts only the three
    needed diagonals per factor before converting to emulated f64 — the
    full-matrix f64 conversion this replaced was ~270 MB of per-iteration
    traffic at the N=512 headline (measured 4.1 ms/iter fixed cost).

    Returns (hdiag, hsub, hsup, e, scs) with true values = scaled * 2^e;
    scs is the (p,) f32 per-factor scale schedule (scs[l] = the 2^-ex_l
    applied after factor l's multiply; scs[0] = 1, prod scs = 2^-e) —
    the multi-bulge kernel re-derives in-window leading products under
    the same schedule so its shifted columns share the band scale.
    """
    p = H.hi.shape[0]
    f64 = jnp.float64

    def diag64(l, off, cnt):
        dh = jnp.diagonal(H.hi[l], off)[:cnt]
        dl = jnp.diagonal(H.lo[l], off)[:cnt]
        return dh.astype(f64) + dl.astype(f64)

    P1 = jnp.ones((n,), f64)
    P2 = jnp.zeros((n,), f64)
    P3 = jnp.zeros((n,), f64)
    e = jnp.int32(0)
    scs = [jnp.float32(1.0)]
    z1 = jnp.zeros((1,), f64)
    z2 = jnp.zeros((2,), f64)
    for l in range(1, p):
        D = diag64(l, 0, n)
        U = jnp.concatenate([diag64(l, 1, n - 1), z1])
        V = jnp.concatenate([diag64(l, 2, n - 2), z2])
        D1 = jnp.concatenate([D[1:], z1])
        U1 = jnp.concatenate([U[1:], z1])
        D2 = jnp.concatenate([D[2:], z2])
        P3 = P1 * V + P2 * U1 + P3 * D2
        P2 = P1 * U + P2 * D1
        P1 = P1 * D
        m = jnp.max(jnp.maximum(jnp.abs(P1),
                                jnp.maximum(jnp.abs(P2), jnp.abs(P3))))
        ex = jnp.where(m > 0,
                       jnp.floor(jnp.log2(jnp.maximum(m, 1e-30))),
                       0.0).astype(jnp.int32)
        sc = jnp.exp2(-ex.astype(f64))      # exact power of two
        P1 = P1 * sc
        P2 = P2 * sc
        P3 = P3 * sc
        e = e + ex
        scs.append(sc.astype(jnp.float32))
    scs = jnp.stack(scs)
    d0 = diag64(0, 0, n)
    u0 = jnp.concatenate([diag64(0, 1, n - 1), z1])
    s0 = jnp.concatenate([z1, diag64(0, -1, n - 1)])
    P1m = jnp.concatenate([jnp.ones((1,), f64), P1[:-1]])
    P2m = jnp.concatenate([z1, P2[:-1]])
    P3m = jnp.concatenate([z1, P3[:-1]])
    hsub = s0 * P1m
    hdiag = s0 * P2m + d0 * P1
    P11 = jnp.concatenate([P1[1:], z1])
    hsup = s0 * P3m + d0 * P2 + u0 * P11
    return hdiag, hsub, hsup, e, scs


def pqr_real_core_ff_chunked(
    Hhi: jax.Array,
    Hlo: jax.Array,
    ZThi: Optional[jax.Array] = None,
    ZTlo: Optional[jax.Array] = None,
    want_z: bool = True,
    maxitfac: int = 30,
    cfg: AlgoConfig = default_config,
    interpret: bool = False,
    chunk_iters: Optional[int] = None,
    with_info: bool = False,
    sweep_fn=None,
):
    """Host-chunked ds real periodic QR: the axon TPU worker kills any
    single device execute after ~60 s (measured: a slow-converging
    p=16, n=512 cycle crashed at 62 s while a fast one ran 14 s), so the
    while_loop runs in resumable segments with the state left on-device
    between calls.  Same returns as :func:`pqr_real_core_ff`."""
    import numpy as _np
    p, n, _ = Hhi.shape
    if n == 1:
        out1 = pqr_real_core_ff(Hhi, Hlo, ZThi, ZTlo, want_z=want_z,
                                maxitfac=maxitfac, cfg=cfg,
                                interpret=interpret, sweep_fn=sweep_fn)
        return out1 + ({"niter": 0, "aed_deflated": 0,
                        "host_tail_finished": 0},) if with_info \
            else out1
    maxit = maxitfac * n
    if chunk_iters is None:
        # ~10 ns per (p*n^2) state element per iteration (measured 40 ms/
        # iteration on full windows at p=16, n=512); target <= ~20 s per
        # execute, comfortably under the ~60 s worker kill
        per_iter = p * n * n * 1e-8
        # floor for dispatch amortization, but never past the ~60 s worker
        # kill the chunking exists to dodge (256 iterations at p=32,
        # n=1024 would be ~86 s)
        floor = min(256, max(16, int(45.0 / max(per_iter, 1e-9))))
        chunk_iters = max(floor, int(20.0 / max(per_iter, 1e-9)))

    # Build the initial loop state here (MUST mirror the core's setup: same
    # padding rule and state tuple) so every chunk call uses the ONE resume
    # trace of the core — otherwise the first chunk compiles a second,
    # fresh-start variant of the whole program (~8 extra minutes at the
    # N=512 headline).
    if n + 1 <= 128:
        N = n + 1
    else:
        N = ((n + 16 + 7) // 8) * 8

    @jax.jit
    def _init(Hhi, Hlo, ZThi, ZTlo):
        def _pad(x):
            return jnp.zeros((p, N, N), jnp.float32).at[:, :n, :n].set(x)
        H = FF(_pad(Hhi), _pad(Hlo))
        if want_z:
            if ZThi is None:
                eyep = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                                        (p, n, n))
                ZT = FF(_pad(eyep), jnp.zeros((p, N, N), jnp.float32))
            else:
                ZT = FF(_pad(ZThi), _pad(ZTlo))
        else:
            ZT = FF(jnp.zeros((p, 1, 1), jnp.float32),
                    jnp.zeros((p, 1, 1), jnp.float32))
        return (H, ZT, jnp.zeros((n,), jnp.float64),
                jnp.zeros((n,), jnp.float64), jnp.int32(n - 1), jnp.int32(0),
                jnp.int32(1), jnp.int32(maxit), jnp.int32(0))

    from ..config import verbosity

    # ---- aggressive early deflation plumbing (ops/aed.py) ---------------
    # Host AED runs between device segments: converged-but-hidden trailing
    # eigenvalues are harvested from the window spike without the sweeps
    # the subdiagonal test would still need.  Segment length shrinks to
    # the AED interval (adaptively backed off on misses) so the analysis
    # sees fresh windows often enough to pay.
    # Round-5 retune note: itv=40/win=96 at n=512 cuts niter 640 -> 240
    # (backerr 1.55e-13, results_r5.log 21:35) and is the right setting
    # when the HOST is fast relative to the chip — but the w=96 native
    # window Schur costs 148 ms/event on this 1-vCPU box (16 ms at
    # w=48) and the same-window bench A/B lost 7.45 -> 8.21 s, so the
    # shipping auto stays at the round-4 formulas.  Deployments with a
    # real host CPU should set aed_interval=40, aed_window=96.
    aed_w = cfg.aed_window if cfg.aed_window else min(48, max(16, n // 10))
    # auto interval n//4: the round-3 on-chip interval sweep (itv 24 /
    # 40 / 85 / 120 -> 12.65 / 12.75 / 12.07 / 10.43 s at the headline,
    # all contract-grade) showed the ~0.3-0.5 s host cost per event
    # outweighs the extra device iterations a denser harvest saves
    aed_itv = cfg.aed_interval if cfg.aed_interval else max(24, n // 4)
    aed_on = bool(cfg.aed) and aed_w >= 4 and n >= aed_w + 4 \
        and (n >= cfg.aed_min_n or cfg.aed_window > 0)
    from .aed import status_pull
    if aed_on:
        from .aed import aed_analyze, aed_apply_ff, aed_pull_ff
        ulp = float(ff.EPS)
        # spike-negligibility scale: zeroing a spike entry perturbs H0 by
        # exactly that entry, and the library's contract is a MAX-norm
        # relative backward error <= 1e-12 — the classical opnorm1-based
        # scale (ulp * n * ||H0||_1 ~ 4e-10 relative at n=512) would breach
        # it.  Converged spike entries sit at ~u_ds * |entry| ~ 1e-14, so
        # ulp * sqrt(n) * max|H0| (~1.6e-13 relative at the headline)
        # both preserves the contract and harvests everything converged.
        h0 = _np.asarray(Hhi[0], _np.float64) + _np.asarray(Hlo[0],
                                                            _np.float64)
        aed_tol = ulp * float(n) ** 0.5 * float(_np.abs(h0).max())
        seg = min(chunk_iters, aed_itv)
        misses = 0
    else:
        seg = chunk_iters
    aed_total = 0
    tail_total = 0  # host-tail finishes, reported separately from AED

    # ---- host-tail finish plumbing (cfg.host_tail; ops/aed.py) ----------
    if cfg.host_tail >= 0:
        from .. import native as _native
        if cfg.host_tail > 0:
            tail_n = min(cfg.host_tail, n)
        else:
            tail_n = min(64, n // 8) if _native.available() else 0
    else:
        tail_n = 0
    if tail_n >= 2:
        from .aed import aed_analyze as _tail_analyze
        from .aed import aed_apply_ff as _tail_apply
        ulp_t = float(ff.EPS)
        h0t = _np.asarray(Hhi[0], _np.float64) + _np.asarray(Hlo[0],
                                                             _np.float64)
        tail_tol = ulp_t * float(n) ** 0.5 * float(_np.abs(h0t).max())

    def _try_tail(state, i_cur):
        """Finish the leading window [0, i] on the host (beta = 0: the
        whole remaining problem deflates through one native window Schur).

        The window transforms are EMBEDDED block-diagonally in the fixed
        (p, tail_n) shape so every tail size reuses ONE compiled apply
        (aed_apply_ff is shape-keyed on w); rows [m, tail_n) get an exact
        identity.  Failures degrade to continuing the ds iteration."""
        nonlocal tail_total
        m = i_cur + 1
        wfix = tail_n
        H = state[0]
        Hbig = (_np.asarray(H.hi[:, :wfix, :wfix], _np.float64) +
                _np.asarray(H.lo[:, :wfix, :wfix], _np.float64))
        try:
            res = _tail_analyze(Hbig[:, :m, :m], 0.0, tail_tol)
        except Exception as e:  # pragma: no cover - defensive host path
            if verbosity("main") >= 1:
                print(f"[pqr_ff tail] analysis failed ({e!r}); skipping")
            res = None
        if res is None or res[0] != m:
            return state, False
        d, Wf, Zt, lams, _sph = res
        # embed: V = blockdiag(Zt_l, I), window block transformed in f64
        Vp = _np.broadcast_to(_np.eye(wfix), (p, wfix, wfix)).copy()
        Wp = Hbig.copy()
        for l in range(p):
            Vp[l][:m, :m] = Zt[l]
            Wp[l][:m, :m] = Wf[l]
            # right-block columns [m, wfix) of the transformed rows, f64
            Wp[l][:m, m:] = Zt[l].T @ Hbig[l][:m, m:]
        ZT = state[1]
        lr = _np.zeros(wfix)
        li = _np.zeros(wfix)
        lr[:m] = lams.real
        li[:m] = lams.imag
        Hh, Hl, Zh, Zl, wr, wi = _tail_apply(
            H.hi, H.lo, ZT.hi, ZT.lo, jnp.asarray(Vp), jnp.asarray(Wp),
            jnp.zeros((wfix,)), jnp.int32(0), want_z=want_z,
            wr=state[2], wi=state[3], lam_re=jnp.asarray(lr),
            lam_im=jnp.asarray(li), u=jnp.int32(0), nlam=jnp.int32(m))
        tail_total += d
        if verbosity("main") >= 1:
            print(f"[pqr_ff tail] host-finished the leading {m}-window")
        return (FF(Hh, Hl), FF(Zh, Zl), wr, wi,
                jnp.int32(-1), jnp.int32(0), jnp.int32(1),
                state[7], state[8]), True

    def _try_aed(state, i_cur, Hwin, beta):
        nonlocal misses, seg, aed_total
        w = aed_w
        if i_cur + 1 < w + 2:
            return state
        s = i_cur - w + 1
        H = state[0]
        try:
            res = aed_analyze(Hwin, beta, aed_tol,
                              max_moves=None if cfg.aed_max_moves < 0 else cfg.aed_max_moves)
        except Exception as e:  # pragma: no cover - defensive host path
            if verbosity("main") >= 1:
                print(f"[pqr_ff aed] analysis failed ({e!r}); skipping")
            res = None
        if res is None:
            misses += 1
            if misses >= 2:
                seg = min(seg * 2, chunk_iters)
            return state
        misses = 0
        seg = min(chunk_iters, aed_itv)
        d, Wf, Zt, lams, sph = res
        aed_total += d
        u = w - d
        ZT = state[1]
        Hh, Hl, Zh, Zl, wr, wi = aed_apply_ff(
            H.hi, H.lo, ZT.hi, ZT.lo, jnp.asarray(Zt), jnp.asarray(Wf),
            jnp.asarray(sph), jnp.int32(s), want_z=want_z,
            wr=state[2], wi=state[3], lam_re=jnp.asarray(lams.real),
            lam_im=jnp.asarray(lams.imag), u=jnp.int32(u),
            nlam=jnp.int32(w))
        if verbosity("main") >= 1:
            print(f"[pqr_ff aed] deflated {d} at i={i_cur} (window {w})")
        return (FF(Hh, Hl), FF(Zh, Zl), wr, wi,
                jnp.int32(i_cur - d), jnp.int32(0), jnp.int32(1),
                state[7], state[8])

    state = _init(Hhi, Hlo, ZThi, ZTlo)
    cap = 0
    while True:
        cap = min(cap + seg, maxit)
        out = pqr_real_core_ff(
            Hhi, Hlo, ZThi, ZTlo, want_z=want_z, maxitfac=maxitfac,
            cfg=cfg, interpret=interpret, it_cap=jnp.int32(cap),
            resume_state=state, return_state=True, sweep_fn=sweep_fn)
        *outs, state, done = out
        # ONE blocking transfer per segment boundary: packed status (+ the
        # trailing AED window when AED is on).  The former per-boundary
        # pulls (window slabs, beta halves, int(i), bool(done), wr/wi)
        # each paid a full tunnel round trip (~0.3-0.5 s/event measured,
        # BASELINE.md round-4 AED retune).
        aed_win = aed_beta = None
        if aed_on:
            packed = _np.asarray(aed_pull_ff(
                state[0].hi, state[0].lo, state[4], state[8], done,
                w=aed_w))
            i_cur, jiter_cur = int(packed[0]), int(packed[1])
            done_b = bool(packed[2] != 0.0)
            aed_beta = float(packed[3]) + float(packed[4])
            nw = p * aed_w * aed_w
            aed_win = (packed[5:5 + nw].astype(_np.float64) +
                       packed[5 + nw:5 + 2 * nw].astype(_np.float64)
                       ).reshape(p, aed_w, aed_w)
        elif tail_n >= 2:
            st3 = _np.asarray(status_pull(state[4], state[8], done))
            i_cur, jiter_cur = int(st3[0]), int(st3[1])
            done_b = bool(st3[2] != 0.0)
        else:
            i_cur, jiter_cur = int(state[4]), int(state[8])
            done_b = bool(done)
        if verbosity("main") >= 1:
            print(f"[pqr_ff chunk] jiter={jiter_cur} "
                  f"i={i_cur} done={done_b}")
        if done_b or cap >= maxit:
            if with_info:
                # `with_info` mirrors the other cores' iteration counters
                # (reference prints niter tallies at verbosity > 0)
                return tuple(outs) + ({"niter": jiter_cur,
                                       "aed_deflated": aed_total,
                                       "host_tail_finished": tail_total},)
            return tuple(outs)
        if tail_n >= 2 and 2 <= i_cur + 1 <= tail_n:
            state, finished = _try_tail(state, i_cur)
            if finished:
                # one more (cheap) core call packages outs from the
                # done state through the single resume trace
                continue
        if aed_on:
            state = _try_aed(state, i_cur, aed_win, aed_beta)


def _deflate_kernel_auto(p: int, N: int, want_z: bool,
                         interpret: bool) -> bool:
    """Routing for the fused Mosaic deflation branch (pallas_deflate).

    Default: ON on the chip when the state fits VMEM (the XLA-glue branch
    is a ~12k-barrier launch storm there), OFF on CPU (glue is exact and
    fast under XLA:CPU; the kernel itself is interpret-tested by
    tests/test_pallas_deflate.py).  PSD_DEFL_KERNEL=0 kills it, =1 forces
    it (interpret mode included — CPU parity tests use this).
    """
    env = os.environ.get("PSD_DEFL_KERNEL", "")
    from .pallas_deflate import deflate_kernel_fits
    if env == "0":
        return False
    if env == "1":
        return deflate_kernel_fits(p, N, want_z)
    if interpret:
        return False
    dev = jax.config.jax_default_device
    plat = dev.platform if dev is not None else jax.default_backend()
    if plat == "cpu":
        return False
    return deflate_kernel_fits(p, N, want_z)



@partial(jax.jit, static_argnames=("want_z", "maxitfac", "cfg", "interpret",
                                   "maxiter", "debug_state",
                                   "return_state", "sweep_fn"))
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
    it_cap: Optional[jax.Array] = None,
    resume_state=None,
    return_state: bool = False,
    sweep_fn=None,
):
    """Run the ds real periodic QR iteration.

    Args:
      Hhi, Hlo: (p, n, n) f32 pair; H[0] upper Hessenberg, H[1:] triangular.
        On RESUME calls pass the ORIGINAL inputs unchanged (they define the
        deflation thresholds); the evolving state comes from resume_state.
      ZThi, ZTlo: optional (p, n, n) f32 pair of TRANSPOSED initial Q stack.
      interpret: run the Pallas sweep kernels in interpreter mode (CPU
        tests); the TPU path compiles them with Mosaic.
      it_cap: traced absolute iteration cap for CHUNKED execution (the axon
        worker kills any single device execute after ~60 s; see
        pqr_real_core_ff_chunked).
      resume_state / return_state: continue from / also return the raw
        padded loop state.

    Returns (Thi, Tlo, ZThi, ZTlo, wr_hi, wr_lo, wi_hi, wi_lo, ok):
      quasi-triangular stack + TRANSPOSED Schur vectors + eigenvalue pairs.
    """
    p, n, _ = Hhi.shape
    ulp = float(ff.EPS)
    unfl = 1.175494e-38  # f32 tiny (ds exponent range is f32's)
    smlnum = unfl * (n / ulp)
    ulpx = cfg.ulp_x(ulp)
    maxit = maxitfac * n if maxiter is None else maxiter
    # Product-level quantities (band entries of the cycle product, shifts,
    # eigenvalues) are computed in (emulated) FLOAT64: ds arithmetic has
    # f32's exponent range, and p-long products overflow it (measured
    # 2.4e20 product diagonals at p=16, n=512, whose squares are inf in
    # f32 and poison the shifts -> the iteration never deflates).  These
    # quantities only need threshold/shift-level accuracy, which the
    # x64-rewriter's emulated f64 easily provides; the hot rotation path
    # stays in ds.
    f64 = jnp.float64
    smlnum64 = 2.2250738585072014e-308 * (n / ulp)

    H0f = FF(Hhi, Hlo)
    if n == 1:
        lam = jnp.prod(Hhi[:, 0, 0].astype(f64) + Hlo[:, 0, 0].astype(f64))
        lhi = lam.astype(jnp.float32)
        llo = (lam - lhi.astype(f64)).astype(jnp.float32)
        if want_z:
            zt = (ZThi, ZTlo) if ZThi is not None else (
                jnp.ones((p, 1, 1), jnp.float32),
                jnp.zeros((p, 1, 1), jnp.float32))
        else:
            zt = (None, None)
        out1 = (Hhi, Hlo, zt[0], zt[1], lhi[None], llo[None],
                jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32),
                jnp.asarray(True))
        if debug_state or return_state:
            # a resume-API caller unpacking '*outs, state, done' must not
            # silently mis-bind on the early return
            raise ValueError("n == 1 does not support return_state/"
                             "debug_state (nothing to resume)")
        return out1

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
    use_glue_kernel = bool(cfg.glue_kernel) and cfg.nbulges <= 1

    # Timing-isolation variants (benchmarks/probe_iterfixed.py): each
    # DUPLICATES one component of the per-iteration fixed cost while
    # keeping data and control flow bitwise identical to the base
    # program, so (t_variant - t_base) / iters is exactly that
    # component's per-iteration cost.  Trace-time static; never set in
    # production.
    #   dupsweep - one extra full sweep call per chase iteration with
    #              v0 = e1 (tau = 0 -> every rotation is exactly I;
    #              validated bitwise on CPU);
    #   dupband  - one extra band-product + scan evaluation, consumed
    #              through a dynamically-false select;
    #   dupcond  - four extra identity lax.cond boundaries carrying the
    #              full (H, ZT) state (the repair-cond shape).
    _dbg_variant = os.environ.get("PSD_ITERFIXED_VARIANT", "")

    def body(st):
        (H, ZT, wr, wi, i, l, its, itleft, jiter) = st

        if use_glue_kernel:
            # kernel G: band products + scan + shifts fused into ONE
            # Mosaic launch (ops/pallas_glue.py).  EXPERIMENTAL, default
            # off: the round-4 on-chip A/B measured it correct
            # (backerr 1.86e-13, identical niter) but ~1.5 s SLOWER at
            # the p=16 n=512 headline — the ~12 ms/iter fixed cost is
            # NOT this glue (BASELINE.md round-4; suspects: sweep-kernel
            # launches/copies, cond boundaries)
            from .pallas_glue import glue_products_scan_shift
            (hdiag, hsub, hsup, bexp, found_k, lnew, anyf,
             v0k) = glue_products_scan_shift(H, n, l, i, its, cfg,
                                             interpret=interpret)
            bscs = None
            return _tail(H, ZT, wr, wi, i, l, its, itleft, jiter,
                         hdiag, hsub, hsup, bexp, bscs, found_k, lnew,
                         v0k)

        hdiag, hsub, hsup, bexp, bscs = _band_products_scaled(H, n)
        if _dbg_variant == "dupband":
            hdiag2, hsub2, hsup2, bexp2, _ = _band_products_scaled(H, n)
            sel = jiter < jnp.int32(-1)  # dynamically false, uneliminable
            hdiag = jnp.where(sel, hdiag2, hdiag)
            hsub = jnp.where(sel, hsub2, hsub)
            hsup = jnp.where(sel, hsup2, hsup)
            bexp = jnp.where(sel, bexp2, bexp)

        # ---- deflation scan (f64, range-safe; mirrors ops/pqr_real) ---
        z64 = jnp.zeros((1,), f64)
        hh11 = jnp.concatenate([z64, hdiag[:-1]])
        hh12 = jnp.concatenate([z64, hsup[:-1]])
        hh21 = hsub
        hh22 = hdiag
        tst1 = jnp.abs(hh11) + jnp.abs(hh22)
        ab = jnp.maximum(jnp.abs(hh21), jnp.abs(hh12))
        ba = jnp.minimum(jnp.abs(hh21), jnp.abs(hh12))
        aa = jnp.maximum(jnp.abs(hh22), jnp.abs(hh11 - hh22))
        bb = jnp.minimum(jnp.abs(hh22), jnp.abs(hh11 - hh22))
        stmp = aa + ab
        stmps = jnp.where(stmp == 0, 1.0, stmp)
        if cfg.slicot_convg:
            found_k = jnp.abs(hh21) <= jnp.maximum(ulp * tst1, smlnum64)
        else:
            at_ok = ba * (ab / stmps) <= jnp.maximum(
                smlnum64, ulpx * (bb * (aa / stmps)))
            found_k = (jnp.abs(hh21) <= smlnum64) | \
                ((jnp.abs(hh21) <= ulp * tst1) & at_ok)
            # Stagnation relaxation: certain draws reach a window foot
            # whose product band is so graded that (a) the tightened
            # Ahues-Tisseur product test rejects a ulp-negligible
            # coupling forever, and (b) the Francis first column
            # degenerates to e1 (its tail's SQUARE underflows f32 in the
            # generation kernel), making every sweep an exact no-op —
            # measured: seed-12345 A*0.5 at p=16 n=512 froze at i=511
            # for the full 20480-iteration budget (probe_stall,
            # results_r3.log 15:38).  After 16 fruitless iterations in a
            # window (1.5 exceptional-shift cycles), fall back to the
            # PLAIN dlahqr criterion — zeroing such a coupling perturbs
            # the product band by <= ulp * |neighbors|, inside the ds
            # contract (LAPACK deflates on this test alone; the AT
            # tightening is an accuracy nicety, not a safety need).
            found_k |= (its >= jnp.int32(16)) & \
                (jnp.abs(hh21) <= jnp.maximum(ulp * tst1, smlnum64))
        in_range = (iv >= l + 1) & (iv <= i)
        found_k &= in_range
        anyf = jnp.any(found_k)
        klast = jnp.max(jnp.where(found_k, iv, -1))
        lnew = jnp.where(i > l, jnp.where(anyf, klast, l), i)
        return _tail(H, ZT, wr, wi, i, l, its, itleft, jiter,
                     hdiag, hsub, hsup, bexp, bscs, found_k, lnew, None)

    # shared continuation of the iteration body: subdiagonal repair,
    # chase-vs-deflate dispatch, state update.  ``v0k`` is the fused glue
    # kernel's pre-computed shifted first column (None on the XLA-glue
    # path, which computes the shifts inside do_chase).
    def _tail(H, ZT, wr, wi, i, l, its, itleft, jiter,
              hdiag, hsub, hsup, bexp, bscs, found_k, lnew, v0k):
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
            if cfg.extra_rq:
                # final RQ stage absent from MB03WD (reference :637-652):
                # annihilate H[p-1][lnew, lnew-1] properly instead of
                # forcing it to zero — ds mirror of the exact core's
                # extra_rq branch (ops/pqr_real.py:244-259)
                Hl = fac_get(H, p - 1)
                x0 = getel_ff(Hl, lnew, lnew)
                x1 = getel_ff(Hl, lnew, lnew - 1)
                w, tau, beta = reflector_ff(ff.stack([x0, x1], 0))
                wv = ff.stack([FF(w.hi[1], w.lo[1]), one], 0)
                tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (2,)),
                               jnp.broadcast_to(tau.lo, (2,))), wv)
                M2 = ff.sub(ff.ff(jnp.eye(2, dtype=jnp.float32)),
                            ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                                   FF(wv.hi[None, :], wv.lo[None, :])))
                Hl = setel_ff(Hl, lnew, lnew - 1, zero)
                Hl = setel_ff(Hl, lnew, lnew, beta)
                Hl = colsk_ff(Hl, lnew - 1, M2, hi=lnew)
                H = fac_set(H, p - 1, Hl)
                H0x = rowsk_ff(fac_get(H, 0), lnew - 1, M2, lo=lnew - 1)
                H = fac_set(H, 0, H0x)
                ZT = zup_t(ZT, 0, lnew - 1, M2)
            else:
                # MB03WD forces the leftover to zero, even when wrong
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
        if _dbg_variant == "dupcond":
            # four extra cond boundaries carrying the full (H, ZT) state;
            # the predicate is dynamically false but unprovable, and the
            # taken branch is identity while the untaken one differs (so
            # the conditional simplifier cannot collapse it)
            for _ in range(4):
                H, ZT = lax.cond(
                    need_repair & (jiter < jnp.int32(-1)),
                    lambda x: (fac_set(x[0], 0, setel_ff(
                        fac_get(x[0], 0), lnew, lnew, zero)), x[1]),
                    lambda x: x, (H, ZT))
        H = fac_set(H, 0, setel_ff(fac_get(H, 0), lnew, lnew - 1, zero,
                                   active=lnew > 0))

        splitting = lnew >= i - 1

        # =============================================================
        # bulge-chase branch: shift + one fused Pallas sweep
        def do_chase(HZwrwi):
            H, ZT, wr, wi = HZwrwi

            def el(v, idx):
                idx = jnp.clip(jnp.asarray(idx, jnp.int32), 0, n - 1)
                return lax.dynamic_slice(v, (idx,), (1,))[0]

            if v0k is not None:
                # kernel G already computed the normalized shifted first
                # column (same dlahqr double-shift math, in-kernel ds)
                m = lnew
                v0 = v0k
                impl = sweep_fn if sweep_fn is not None else chase_sweep_ff
                H, ZT = impl(H, ZT if want_z else None, m, i, v0,
                             want_z=want_z, interpret=interpret,
                             mode=cfg.sweep_mode,
                             hbm_grouped=cfg.sweep_hbm_grouped)
                if not want_z:
                    ZT = HZwrwi[1]
                return H, ZT, wr, wi

            exc1 = its == 10
            exc2 = (its % 10 == 0) & (~exc1)
            exc = exc1 | exc2
            sE = jnp.where(
                exc1,
                jnp.abs(el(hsub, lnew + 1)) + jnp.abs(el(hsub, lnew + 2)),
                jnp.abs(el(hsub, i)) + jnp.abs(el(hsub, i - 1)))
            h44E = 0.75 * sE + jnp.where(exc1, el(hdiag, lnew), el(hdiag, i))
            h33E = h44E
            h43h34E = -0.4375 * sE * sE
            h44 = el(hdiag, i)
            h33 = el(hdiag, i - 1)
            h43 = el(hsub, i)
            h34 = el(hsup, i - 1)
            ssh = jnp.abs(h33) + jnp.abs(h34) + jnp.abs(h43) + jnp.abs(h44)
            sshs = jnp.where(ssh == 0, 1.0, ssh)
            h33n, h44n = h33 / sshs, h44 / sshs
            h34n, h43n = h34 / sshs, h43 / sshs
            trc = (h33n + h44n) * 0.5
            disc = (h33n - trc) * (h44n - trc) - h34n * h43n
            rtdisc = jnp.sqrt(jnp.abs(disc))
            r1 = trc + rtdisc
            r2 = trc - rtdisc
            pick = jnp.where(jnp.abs(r1 - h44n) <= jnp.abs(r2 - h44n),
                             r1, r2)
            rt1r = jnp.where(ssh == 0, 0.0,
                             jnp.where(disc >= 0, trc * ssh, pick * ssh))
            rt2r = rt1r
            rt1i = jnp.where(ssh == 0, 0.0,
                             jnp.where(disc >= 0, rtdisc * ssh, 0.0))
            rt2i = -rt1i

            m = lnew
            h11 = el(hdiag, m)
            h12 = el(hsup, m)
            h21 = el(hsub, m + 1)
            h22 = el(hdiag, m + 1)
            hsub_m2 = el(hsub, m + 2)
            h44s = h44E - h11
            h33s = h33E - h11
            h21s_ = jnp.where(h21 == 0, 1.0, h21)
            v1E = (h33s * h44s - h43h34E) / h21s_ + h12
            v2E = h22 - h11 - h33s - h44s
            v3E = hsub_m2
            sv = jnp.abs(h11 - rt2r) + jnp.abs(rt2i) + jnp.abs(h21)
            svs = jnp.where(sv == 0, 1.0, sv)
            h21s = h21 / svs
            v1L = h21s * h12 + (h11 - rt1r) * ((h11 - rt2r) / svs) - \
                rt1i * (rt2i / svs)
            v2L = h21s * (h11 + h22 - rt1r - rt2r)
            v3L = h21s * hsub_m2
            use_exc = exc | cfg.slicot_shifts
            v1 = jnp.where(use_exc, v1E, v1L)
            v2 = jnp.where(use_exc, v2E, v2L)
            v3 = jnp.where(use_exc, v3E, v3L)
            snorm = jnp.abs(v1) + jnp.abs(v2) + jnp.abs(v3)
            snorms = jnp.where(snorm == 0, 1.0, snorm)
            v0d = jnp.stack([v1, v2, v3]) / snorms
            v0hi = v0d.astype(jnp.float32)
            v0 = FF(v0hi, (v0d - v0hi.astype(f64)).astype(jnp.float32))

            early = None
            if cfg.allow_early_qr and cfg.nbulges <= 1:
                # ---- _allow_early_QR (reference :768-801): vectorized
                # scan (f64 product-band quantities; the test is
                # homogeneous in the global band scale) for the largest
                # row m where starting the sweep leaves ℍ[m, m-1]
                # negligible.  Mirrors ops/pqr_real.py; the Pallas sweep
                # already takes the start row as an argument, and its
                # first step preserves column m-1 (window-head restore),
                # so the dlahqr H(M,M-1) *= (1-τ) correction is applied
                # as glue after the sweep.
                z64v = jnp.zeros((1,), f64)
                h11v = hdiag
                h12v = hsup
                h21v = jnp.concatenate([hsub[1:], z64v])
                h22v = jnp.concatenate([hdiag[1:], z64v])
                h32v = jnp.concatenate([hsub[2:], jnp.zeros((2,), f64)])
                hdm1 = jnp.concatenate([z64v, hdiag[:-1]])
                h21gs = jnp.where(h21v == 0, 1.0, h21v)
                h44sv = h44E - h11v
                h33sv = h33E - h11v
                v1Ev = (h33sv * h44sv - h43h34E) / h21gs + h12v
                v2Ev = h22v - h11v - h33sv - h44sv
                v3Ev = h32v
                svv = jnp.abs(h11v - rt2r) + jnp.abs(rt2i) + jnp.abs(h21v)
                svvs = jnp.where(svv == 0, 1.0, svv)
                h21sv = h21v / svvs
                v1Lv = h21sv * h12v + (h11v - rt1r) * \
                    ((h11v - rt2r) / svvs) - rt1i * (rt2i / svvs)
                v2Lv = h21sv * (h11v + h22v - rt1r - rt2r)
                v3Lv = h21sv * h32v
                v1v = jnp.where(use_exc, v1Ev, v1Lv)
                v2v = jnp.where(use_exc, v2Ev, v2Lv)
                v3v = jnp.where(use_exc, v3Ev, v3Lv)
                tst1v = jnp.abs(v1v) * (jnp.abs(hdm1) + jnp.abs(h11v) +
                                        jnp.abs(h22v))
                okv = (jnp.abs(hsub) * (jnp.abs(v2v) + jnp.abs(v3v)) <=
                       ulp * tst1v) & (iv >= lnew + 1) & (iv <= i - 2)
                mlast = jnp.maximum(
                    jnp.max(jnp.where(okv, iv, jnp.int32(-1))), lnew)
                mc = jnp.clip(mlast, 0, n - 1)
                sne = jnp.abs(v1v[mc]) + jnp.abs(v2v[mc]) + jnp.abs(v3v[mc])
                snes = jnp.where(sne == 0, 1.0, sne)
                v0de = jnp.stack([v1v[mc], v2v[mc], v3v[mc]]) / snes
                early = mlast > lnew
                v0d = jnp.where(early, v0de, v0d)
                v0hi = v0d.astype(jnp.float32)
                v0 = FF(v0hi, (v0d - v0hi.astype(f64)).astype(jnp.float32))
                m = mlast

            if sweep_fn is not None or cfg.nbulges <= 1:
                # sweep_fn: alternative sweep implementation with the
                # chase_sweep_ff contract — e.g. the lane-sharded
                # multi-device sweep (parallel/sweep_sharded.ShardedSweep)
                impl = sweep_fn if sweep_fn is not None else chase_sweep_ff
                H, ZT = impl(H, ZT if want_z else None, m, i, v0,
                             want_z=want_z, interpret=interpret,
                             mode=cfg.sweep_mode,
                             hbm_grouped=cfg.sweep_hbm_grouped)
                if early is not None:
                    # early-QR start: the first reflector's leading row
                    # also acts on column m-1 (dlahqr: H(M,M-1) *= (1-τ);
                    # the negligible rows-below fill-in is dropped).  The
                    # kernel's window-head restore left the entry
                    # untouched, so scale it here with the same ds
                    # reflector the kernel generated from v0.
                    _, tau_e, _ = reflector_ff(v0)
                    H0f = fac_get(H, 0)
                    subv = getel_ff(H0f, m, m - 1)
                    H0f = setel_ff(H0f, m, m - 1,
                                   ff.mul(subv, ff.sub(one, tau_e)),
                                   active=early)
                    H = fac_set(H, 0, H0f)
                if _dbg_variant == "dupsweep":
                    # identity sweep: v0 = e1 -> xLARFG tau = 0 at the
                    # bulge introduction AND every chase step (no bulge
                    # to annihilate), so every transform is exactly I;
                    # same launches/copies/transposes as a real sweep
                    v0e1 = FF(jnp.zeros((3,), jnp.float32).at[0].set(1.0),
                              jnp.zeros((3,), jnp.float32))
                    H, ZT2 = impl(H, ZT if want_z else None, m, i, v0e1,
                                  want_z=want_z, interpret=interpret,
                                  mode=cfg.sweep_mode,
                                  hbm_grouped=cfg.sweep_hbm_grouped)
                    if want_z:
                        ZT = ZT2
                if not want_z:
                    ZT = HZwrwi[1]
                return H, ZT, wr, wi

            # ---- multi-bulge sweep: NB Francis pairs per pass --------
            # Shift quality decides whether extra bulges reduce the sweep
            # count.  Primary source: eigenvalues of the trailing
            # 2NB x 2NB window of the scaled cycle product (small-bulge
            # multishift semantics; the window product is EXACT — one
            # extra row/col absorbs the Hessenberg coupling, triangular
            # windows multiply exactly).  Disjoint trailing 2x2 blocks
            # (below, the fallback when the window does not fit) ignore
            # the inter-block coupling and measurably do NOT reduce the
            # sweep count (on-chip jiter 248 -> 241 at nb=2, p=8 n=128).
            # Bulge b's first column is re-derived IN-KERNEL at its
            # introduction tick (the leading product has been modified
            # by bulges < b).
            def _francis_pair(j):
                a44 = el(hdiag, j)
                a33 = el(hdiag, j - 1)
                a43 = el(hsub, j)
                a34 = el(hsup, j - 1)
                s4 = jnp.abs(a33) + jnp.abs(a34) + jnp.abs(a43) + \
                    jnp.abs(a44)
                s4s = jnp.where(s4 == 0, 1.0, s4)
                a33n, a44n = a33 / s4s, a44 / s4s
                a34n, a43n = a34 / s4s, a43 / s4s
                tc = (a33n + a44n) * 0.5
                dc = (a33n - tc) * (a44n - tc) - a34n * a43n
                rtd = jnp.sqrt(jnp.abs(dc))
                q1 = tc + rtd
                q2 = tc - rtd
                pk = jnp.where(jnp.abs(q1 - a44n) <= jnp.abs(q2 - a44n),
                               q1, q2)
                b1r = jnp.where(s4 == 0, 0.0,
                                jnp.where(dc >= 0, tc * s4, pk * s4))
                b1i = jnp.where(s4 == 0, 0.0,
                                jnp.where(dc >= 0, rtd * s4, 0.0))
                return b1r, b1i, b1r

            NBs, GAPs = cfg.nbulges, cfg.bulge_gap
            Lw = i - m + 1
            nb_fit = jnp.minimum((Lw - 2) // jnp.int32(GAPs) + 1,
                                 Lw // 2)
            nbact = jnp.clip(
                jnp.where(exc, jnp.int32(1),
                          jnp.minimum(nb_fit, jnp.int32(NBs))),
                1, NBs).astype(jnp.int32)

            Mwin = 2 * NBs
            use_win = n >= Mwin + 1
            if use_win:
                # trailing (Mwin+1)-window of the cycle product under the
                # band scale schedule; its trailing Mwin x Mwin block is
                # the exact product window
                s0c = jnp.clip(i - Mwin, 0, n - (Mwin + 1))

                def win64(lf):
                    wh = lax.dynamic_slice(H.hi[lf], (s0c, s0c),
                                           (Mwin + 1, Mwin + 1))
                    wl = lax.dynamic_slice(H.lo[lf], (s0c, s0c),
                                           (Mwin + 1, Mwin + 1))
                    return wh.astype(f64) + wl.astype(f64)

                Wp = win64(0)
                if p > 1:
                    Wr = win64(1) * bscs[1].astype(f64)
                    for lf in range(2, p):
                        Wr = (Wr @ win64(lf)) * bscs[lf].astype(f64)
                    Wp = Wp @ Wr
                # 5*M fixed iterations: typical convergence is ~1.5/eig +
                # one shrink step per block; the budget is sequential
                # scalar work inside every sweep iteration, so keep it
                # tight — an occasional unconverged window only degrades
                # that sweep's trailing shifts
                wrw, wiw = hess_eigs_small(Wp[1:, 1:], niter=5 * Mwin)
                fits = i >= Mwin

                def win_pair(b):
                    j1 = Mwin - 1 - 2 * b
                    j2 = Mwin - 2 - 2 * b
                    e1r, e1i = wrw[j1], wiw[j1]
                    e2r, e2i = wrw[j2], wiw[j2]
                    # only a GENUINE conjugate pair (same block) forms a
                    # real first column; two complex values from different
                    # blocks (1x1s misaligning the pairing) must fall back
                    # to two real shifts from the real parts
                    mag = jnp.abs(e1i) + jnp.abs(e1r) + 1e-300
                    conj = (e1i != 0.0) & (e2i != 0.0) & \
                        (jnp.abs(e1i + e2i) <= 1e-8 * mag) & \
                        (jnp.abs(e1r - e2r) <= 1e-8 * mag)
                    return e1r, jnp.where(conj, jnp.abs(e1i), 0.0), e2r

                # leading bulge: rebuild its first column from window
                # pair 0 (the v0 above used the trailing-2x2 shift)
                r1w, i1w, r2w = win_pair(0)
                svw = jnp.abs(h11 - r2w) + jnp.abs(i1w) + jnp.abs(h21)
                svws = jnp.where(svw == 0, 1.0, svw)
                h21sw = h21 / svws
                v1w = h21sw * h12 + (h11 - r1w) * ((h11 - r2w) / svws) + \
                    i1w * (i1w / svws)
                v2w = h21sw * (h11 + h22 - r1w - r2w)
                v3w = h21sw * hsub_m2
                snw = jnp.abs(v1w) + jnp.abs(v2w) + jnp.abs(v3w)
                snws = jnp.where(snw == 0, 1.0, snw)
                v0dw = jnp.stack([v1w, v2w, v3w]) / snws
                selw = fits & ~use_exc
                v0d = jnp.where(selw, v0dw, v0d)
                v0hi = v0d.astype(jnp.float32)
                v0 = FF(v0hi, (v0d - v0hi.astype(f64)).astype(jnp.float32))

            sigs = []
            for b in range(NBs):
                triple = _francis_pair(i - 2 * b)
                if use_win:
                    triple = tuple(
                        jnp.where(fits, a, fb)
                        for a, fb in zip(win_pair(b), triple))
                for vv in triple:
                    vvh = vv.astype(jnp.float32)
                    sigs += [vvh, (vv - vvh.astype(f64)).astype(jnp.float32)]
            sig = jnp.stack(sigs)
            H, ZT = chase_sweep_ff_mb(
                H, ZT if want_z else None, m, i, v0, sig, bscs, nbact,
                NB=NBs, GAP=GAPs, want_z=want_z, interpret=interpret)
            if not want_z:
                ZT = HZwrwi[1]
            return H, ZT, wr, wi

        # =============================================================
        # deflation branch (reference :895-1054)
        # Runs of consecutive trailing 1x1 deflations collapse into ONE
        # iteration: when found_k flags several negligible subdiagonals
        # ending at i, all those diagonal entries are already converged
        # real eigenvalues (a 1x1 deflation modifies nothing in H), so a
        # deflation-only iteration per eigenvalue would just re-pay the
        # fixed per-iteration cost (band products + state copies).  The
        # run length (+ the window floor when the whole window is
        # diagonal) comes off i at once; the final subdiagonal scrub
        # already zeroes real-eigenvalue subdiagonals, exactly as in the
        # one-at-a-time flow.
        one_only = lnew == i
        jdx = i - iv
        fk_ok = (jdx >= l + 1) & (jdx <= i)
        fk_run = jnp.where(
            fk_ok, found_k[jnp.clip(jdx, 0, n - 1)].astype(jnp.int32), 0)
        run1 = jnp.sum(jnp.cumprod(fk_run)).astype(jnp.int32)
        run1 = jnp.where(run1 >= i - l, run1 + 1, run1)  # window all-diag
        ndefl1 = jnp.maximum(run1, 1).astype(jnp.int32)
        ndefl = jnp.where(one_only, ndefl1, jnp.int32(2)).astype(jnp.int32)

        def do_deflate(HZwrwi):
            H, ZT, wr, wi = HZwrwi

            def defl1(HZwrwi):
                H, ZT, wr, wi = HZwrwi
                dmask = (iv <= i) & (iv > i - ndefl1)
                lamv = hdiag * jnp.exp2(bexp.astype(f64))
                wr = jnp.where(dmask, lamv, wr)
                wi = jnp.where(dmask, 0.0, wi)
                # zero ALL the run's (negligible) subdiagonals now: the
                # final scrub keys on wi of the eigenvalue ABOVE each
                # entry, so the run's top boundary would survive if that
                # eigenvalue later resolves complex — leaving T[0] with
                # two consecutive nonzero subdiagonals (not a valid real
                # Schur form; structural consumers key pairs off it)
                rr = lax.broadcasted_iota(jnp.int32, (N, N), 0)
                cc = lax.broadcasted_iota(jnp.int32, (N, N), 1)
                m0 = (rr == cc + 1) & (rr > i - ndefl1) & (rr <= i)
                H0 = fac_get(H, 0)
                H0 = FF(jnp.where(m0, 0.0, H0.hi),
                        jnp.where(m0, 0.0, H0.lo))
                H = fac_set(H, 0, H0)
                return H, ZT, wr, wi

            def defl2(HZwrwi):
                H, ZT, wr, wi = HZwrwi

                def g64(Mf, r, c):
                    v = getel_ff(Mf, r, c)
                    return v.hi.astype(f64) + v.lo.astype(f64)

                hp22 = jnp.ones((), f64)
                hp12 = jnp.zeros((), f64)
                hp11 = jnp.ones((), f64)
                for f in range(1, p):
                    Hf = fac_get(H, f)
                    d1 = g64(Hf, i - 1, i - 1)
                    d2 = g64(Hf, i, i)
                    u = g64(Hf, i - 1, i)
                    hp12 = hp11 * u + hp12 * d2
                    hp11 = hp11 * d1
                    hp22 = hp22 * d2
                H0 = fac_get(H, 0)
                a11 = g64(H0, i - 1, i - 1)
                a12 = g64(H0, i - 1, i)
                a21 = g64(H0, i, i - 1)
                a22 = g64(H0, i, i)
                bh11 = a11 * hp11
                bh12 = a11 * hp12 + a12 * hp22
                bh21 = a21 * hp11
                bh22 = a21 * hp12 + a22 * hp22
                (_, _, cc_, _, cs0d, sn0d,
                 w1r, w1i, w2r, w2i) = lanv2(bh11, bh12, bh21, bh22)
                lam_real = cc_ == 0
                cs0h = cs0d.astype(jnp.float32)
                cs0 = FF(cs0h, (cs0d - cs0h.astype(f64)).astype(jnp.float32))
                sn0h = sn0d.astype(jnp.float32)
                sn0 = FF(sn0h, (sn0d - sn0h.astype(f64)).astype(jnp.float32))

                def put(v, idx, val):
                    idx = jnp.clip(idx, 0, n - 1)
                    return lax.dynamic_update_slice(v, val[None], (idx,))
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
                    a1 = jnp.hypot(w1r, w1i)
                    a2 = jnp.hypot(w2r, w2i)
                    amx = jnp.maximum(a1, a2)
                    amn = jnp.minimum(a1, a2)
                    prod0 = ((w1r == 0) & (w1i == 0)) | \
                        ((w2r == 0) & (w2i == 0))
                    tinyrat = amn < ulp * amx
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

                    def iter20(carry):
                        H, ZT, replaceG, done, t = carry
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
                        subv = getel_ff(fac_get(H, 0), i, i - 1)
                        subd = jnp.abs(subv.hi.astype(f64) +
                                       subv.lo.astype(f64))
                        conv = (~replaceG) | (
                            subd < jnp.maximum(smlnum64, ulp * amx))
                        done = done | conv
                        return H, ZT, jnp.asarray(True), done, t + 1

                    # retriangularization loop (reference :901-1054, <=20
                    # rounds): a while_loop, NOT a masked fori — the common
                    # complex-pair case (replace0 == False) converges after
                    # ONE round, and the 19 masked rounds of p-factor
                    # rotation chains were pure fixed cost on every 2x2
                    # deflation (~n/2 of them per decomposition)
                    H, ZT, _, _, _ = lax.while_loop(
                        lambda c: (~c[3]) & (c[4] < 20), iter20,
                        (H, ZT, replace0, jnp.asarray(False), jnp.int32(0)))
                    H = fac_set(H, 0, setel_ff(
                        fac_get(H, 0), i, i - 1, zero,
                        active=(jmax >= 0) | (bh21 == 0)))

                    def zmax(H):
                        Hf = fac_get(H, jmax)
                        Hf = setel_ff(Hf, i, i - 1, zero)
                        return fac_set(H, jmax, Hf)
                    H = lax.cond(jmax >= 1, zmax, lambda x: x, H)
                    return H, ZT

                if _deflate_kernel_auto(p, N, want_z, interpret):
                    # fused Mosaic deflation branch (ops/pallas_deflate):
                    # ONE launch instead of the ~12k-barrier XLA chain;
                    # same ds op sequence (bitwise vs the glue path,
                    # tests/test_pallas_deflate.py).  PSD_DEFL_KERNEL=0/1
                    # overrides the on-chip auto-routing.
                    from .pallas_deflate import deflate2x2_ff
                    a1k = jnp.hypot(w1r, w1i)
                    a2k = jnp.hypot(w2r, w2i)
                    amxk = jnp.maximum(a1k, a2k)
                    amnk = jnp.minimum(a1k, a2k)
                    prod0k = ((w1r == 0) & (w1i == 0)) | \
                        ((w2r == 0) & (w2i == 0))
                    tinyk = amnk < ulp * amxk
                    replace0k = ((jmax >= 1) & lam_real) | prod0k | \
                        ((~prod0k) & lam_real & tinyk)
                    thrk = jnp.maximum(smlnum64, ulp * amxk)
                    thr_hi = thrk.astype(jnp.float32)
                    thr_lo = (thrk - thr_hi.astype(f64)).astype(
                        jnp.float32)
                    finzero = (jmax >= 0) | (bh21 == 0)
                    H, ZT = deflate2x2_ff(
                        H, ZT, i, jmin, jmax, cs0, sn0, replace0k,
                        finzero, thr_hi, thr_lo, want_z=want_z,
                        interpret=interpret)
                else:
                    H, ZT = lax.cond(jmin >= 1, chainA, chainB, (H, ZT))

                # eigenvalue-order check after replacement rotations
                l1 = g64(fac_get(H, 0), i - 1, i - 1)
                for f in range(1, p):
                    l1 = l1 * g64(fac_get(H, f), i - 1, i - 1)
                swap = lam_real & (jnp.abs(l1 - w1r) > jnp.abs(l1 - w2r))
                i1c = jnp.clip(i - 1, 0, n - 1)
                ic = jnp.clip(i, 0, n - 1)
                wr1 = lax.dynamic_slice(wr, (i1c,), (1,))[0]
                wr2 = lax.dynamic_slice(wr, (ic,), (1,))[0]
                wr = put(wr, i - 1, jnp.where(swap, wr2, wr1))
                wr = put(wr, i, jnp.where(swap, wr1, wr2))
                return H, ZT, wr, wi

            if _dbg_variant == "litedeflate":
                # TIMING-ONLY: route every deflation through the cheap 1x1
                # path (defl2's 33k-eqn 2x2 machinery never executes).
                # Downstream control flow diverges mildly (2x2 blocks get
                # mishandled), so ONLY the wall-clock is meaningful.
                return defl1((H, ZT, wr, wi))
            return lax.cond(one_only, defl1, defl2, (H, ZT, wr, wi))

        # ONE cond for the two exclusive branches: the chase/deflate pair
        # used to be two identity-carrying conds, each round-tripping the
        # full padded (H, ZT) state (~70 MB at the N=512 headline) through
        # the cond boundary — a pure fixed cost on every iteration.
        H, ZT, wr, wi = lax.cond(
            splitting, do_deflate, do_chase, (H, ZT, wr, wi))

        itleft = jnp.where(splitting, itleft - its, itleft)
        i = jnp.where(splitting, i - ndefl, i)
        l = jnp.where(splitting, jnp.int32(0), lnew)
        its = jnp.where(splitting, jnp.int32(1), its + 1)
        return (H, ZT, wr, wi, i, l, its, itleft, jiter + 1)

    def cond(st):
        (H, ZT, wr, wi, i, l, its, itleft, jiter) = st
        go = (i >= 0) & (jiter < maxit)
        if it_cap is not None:
            go = go & (jiter < it_cap)
        return go

    # NOTE: no body guard — while_loop only invokes the body when cond
    # holds, and cond already requires i >= 0, so a lax.cond(st[4] >= 0,
    # body, identity) wrapper would round-trip the full padded (H, ZT)
    # state through an always-true cond every iteration (the same fixed
    # cost the chase/deflate cond merge removed)
    wr0 = jnp.zeros((n,), f64)
    wi0 = jnp.zeros((n,), f64)
    if resume_state is not None:
        st = resume_state
    else:
        st = (H, ZT, wr0, wi0, jnp.int32(n - 1), jnp.int32(0), jnp.int32(1),
              jnp.int32(maxit), jnp.int32(0))
    H, ZT, wr, wi, i, l, its, itleft, jiter = lax.while_loop(
        cond, body, st)
    ok = i < 0
    final_state = (H, ZT, wr, wi, i, l, its, itleft, jiter)
    done = (i < 0) | (jiter >= maxit)

    H = FF(H.hi[:, :n, :n], H.lo[:, :n, :n])
    ZTout = FF(ZT.hi[:, :n, :n], ZT.lo[:, :n, :n]) if want_z else None
    # scrub subdiagonals of real eigenvalues (reference :1066-1073)
    keep = jnp.where(wi[:-1] == 0, 0.0, 1.0).astype(jnp.float32)
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
    # eigenvalues are carried in f64 (cycle products exceed f32 range);
    # the public tuple keeps the (hi, lo) pair layout via an exact split
    wr_hi = wr.astype(jnp.float32)
    wr_lo = (wr - wr_hi.astype(f64)).astype(jnp.float32)
    wi_hi = wi.astype(jnp.float32)
    wi_lo = (wi - wi_hi.astype(f64)).astype(jnp.float32)
    if want_z:
        out = (Hhi_out, Hlo_out, ZTout.hi, ZTout.lo,
               wr_hi, wr_lo, wi_hi, wi_lo, ok)
    else:
        out = (Hhi_out, Hlo_out, None, None,
               wr_hi, wr_lo, wi_hi, wi_lo, ok)
    if debug_state:
        # raw loop scalars + the UNSCRUBBED padded state, for bisecting
        return out + ((i, l, its, jiter), (H.hi, H.lo))
    if return_state:
        return out + (final_state, done)
    return out
