"""Pallas TPU kernel: the ds real core's 2x2-deflation machinery, fused.

The deflation branch of `ops/pqr_ff.pqr_real_core_ff` (defl2: chainA /
chainB retriangularization, reference
src/PeriodicSchurDecompositions.jl:895-1054) is a ~72k-eqn unrolled
scalar ds chain with ~12k optimization_barriers; on XLA:TPU every
barrier layer becomes its own tiny kernel, and the branch executes on
roughly every other iteration (one 2x2 deflation per converged complex
pair) — the dominant share of the measured ~12 ms/iteration fixed cost
at the p=16 n=512 headline (probe_iterfixed, BASELINE round-5).  This
kernel runs the whole branch as ONE Mosaic launch.

Design notes (mirrors ops/pallas_sweep.py's toolbox):
* identical ds arithmetic to the glue path: the same ffkern generation
  primitives (reflector_ff, givens_ff — proven to lower in Mosaic by the
  rg sweep kernel) and the same mul/add orders as ffslab.rowsk_ff /
  colsk_ff / zup_t, so results are bitwise-equal to the XLA-glue branch
  (validated by tests/test_pallas_deflate.py);
* row (2-row slab) accesses go through the 8-aligned 16-row rolled
  blocks (`_read_rows` / `_write_rows`); column updates touch all rows
  of two LANES — Mosaic has no dynamic lane slicing, so they run as
  full-factor masked lane extract/forces (a handful of (N, N) vector
  passes, microseconds on the VPU);
* the <= 20-round retriangularization loop is a genuine
  `lax.while_loop` (Mosaic lowers dynamic-cond while): the common
  complex-pair case exits after ONE round, exactly like the glue;
* the convergence test compares the ds |H0[i, i-1]| against the
  f32-split threshold max(smlnum, ulp * amx) computed on the glue side
  (f64 there); ties at the last bit of the lo word can differ from the
  glue's f64 comparison — behaviorally irrelevant (it decides only
  whether to run another cleanup round);
* whole state resident in VMEM with input/output aliasing (H + Z^T
  hi/lo = 4 (p, N, N) f32 arrays, 67 MiB at p=16 N=528).

Gate: `hess`-style VMEM fit; the wrapper falls back to the XLA glue
branch above ~100 MiB.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ff
from .ff import FF
from .ffkern import givens_ff, reflector_ff, refl_mat_ff
from .pallas_sweep import (_lane_extract, _lane_force, _lane_iota,
                           _read_rows, _write_rows)

if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)


def _mm2_rows(M: FF, rows: FF) -> FF:
    """(2,2) FF @ (2, N) FF — same mul/add order as ffkern.matmul3_ff."""
    outs = []
    for r in range(2):
        acc = ff.mul(FF(M.hi[r, 0], M.lo[r, 0]),
                     FF(rows.hi[0], rows.lo[0]))
        acc = ff.add(acc, ff.mul(FF(M.hi[r, 1], M.lo[r, 1]),
                                 FF(rows.hi[1], rows.lo[1])))
        outs.append(acc)
    return ff.stack(outs, 0)


def _make_deflate_kernel(p: int, N: int, want_z: bool):

    def kernel(iscal, fscal, *refs):
        # aliased in/out refs: [Hhi, Hlo, (ZTwin_hi, ZTwin_lo)] as
        # outputs.  Z^T enters as a (p, 16, N) ROW WINDOW around i-1
        # (the only rows the branch ever touches), sliced/unsliced by the
        # XLA glue: keeping the whole (p, N, N) Z^T pair VMEM-resident
        # dies in the Mosaic compiler above ~67 MiB of state (bisected,
        # results_r5), and sliced DMA on pltpu.ANY refs crashes the
        # compile helper outright (every .at[f]/.at[f, ds] form, even
        # static — only full-ref copies compile in this toolchain).
        nin = 4 if want_z else 2
        oH_hi, oH_lo = refs[nin], refs[nin + 1]
        if want_z:
            oZ_hi, oZ_lo = refs[nin + 2], refs[nin + 3]
        for k in range(nin):
            refs[nin + k][...] = refs[k][...]

        i = iscal[0]
        jmin = iscal[1]
        jmax = iscal[2]
        replace0 = iscal[3] != 0
        finzero = iscal[4] != 0
        cs0 = FF(fscal[0], fscal[1])
        sn0 = FF(fscal[2], fscal[3])
        thr = FF(fscal[4], fscal[5])

        zero = ff.zeros(())
        one = ff.ff(jnp.float32(1.0))
        sub_i = _lane_iota((N, N), 0)  # row index grid (sublane iota)

        def kel(ref_hi, ref_lo, f, r, c):
            rows = _read_rows(ref_hi, ref_lo, f, r, 1)
            v = _lane_extract(rows, c)
            return FF(v.hi[0], v.lo[0])

        def krows(f, k0, M2: FF, lo=None, active=None, zrefs=False):
            """rows k0:k0+2 <- M2 @ rows; cols >= lo kept (ffslab.rowsk_ff
            order: full-lane matmul then column mask then active)."""
            hr, lr = (oZ_hi, oZ_lo) if zrefs else (oH_hi, oH_lo)
            rows = _read_rows(hr, lr, f, k0, 2)
            new = _mm2_rows(M2, rows)
            if lo is not None:
                cmask = _lane_iota(rows.hi.shape) >= lo
                new = ff.where(cmask, new, rows)
            if active is not None:
                new = ff.where(active, new, rows)
            _write_rows(hr, lr, f, k0, new)

        def kcols(f, j0, M2: FF, hi=None, active=None):
            """cols j0:j0+2 <- cols @ M2; rows < hi kept (ffslab.colsk_ff
            order: matmul_right over both columns, then row mask)."""
            Mv = FF(oH_hi[f], oH_lo[f])
            c0 = _lane_extract(Mv, j0)
            c1 = _lane_extract(Mv, j0 + 1)
            outs = []
            for c in range(2):
                acc = ff.mul(c0, FF(M2.hi[0, c], M2.lo[0, c]))
                acc = ff.add(acc, ff.mul(c1, FF(M2.hi[1, c], M2.lo[1, c])))
                outs.append(acc)
            if hi is not None:
                rmask = sub_i[:, 0] < hi
                outs = [ff.where(rmask, o, old)
                        for o, old in zip(outs, (c0, c1))]
            if active is not None:
                outs = [ff.where(active, o, old)
                        for o, old in zip(outs, (c0, c1))]
            act_all = jnp.asarray(True)
            nv = _lane_force(Mv, j0, outs[0], act_all)
            nv = _lane_force(nv, j0 + 1, outs[1], act_all)
            oH_hi[f] = nv.hi
            oH_lo[f] = nv.lo

        def ksetel(f, r, c, val: FF, active):
            rows = _read_rows(oH_hi, oH_lo, f, r, 1)
            v1 = FF(jnp.reshape(val.hi, (1,)), jnp.reshape(val.lo, (1,)))
            rows = _lane_force(rows, c, v1, active)
            _write_rows(oH_hi, oH_lo, f, r, rows)

        def mT2(M: FF) -> FF:
            return FF(M.hi.T, M.lo.T)

        def zup(l, k0, M2: FF, active=None):
            """ZT window rows [k0-base, k0-base+2) <- M^T @ rows.

            ``k0`` is always i-1 here; the window base is (i-1) & -8, so
            the in-window offset o = k0 - base is in [0, 8) and the
            16-row block is rolled by o exactly like _read_rows."""
            if not want_z:
                return
            W = min(16, N)
            # typed bounds: jnp.clip's python-int bounds become weak i64
            # under x64, and any i64 sends Mosaic's convert lowering into
            # infinite recursion (the pallas_hess lesson)
            base = jnp.minimum(jnp.maximum((i - 1) & jnp.int32(-8),
                                           jnp.int32(0)),
                               jnp.int32(N - W))
            o = k0 - base
            bh = pltpu.roll(oZ_hi[l], -o, 0)
            bl = pltpu.roll(oZ_lo[l], -o, 0)
            rows = FF(bh[:2], bl[:2])
            new = _mm2_rows(mT2(M2), rows)
            if active is not None:
                new = ff.where(active, new, rows)
            bh = jnp.concatenate([new.hi, bh[2:]], axis=0)
            bl = jnp.concatenate([new.lo, bl[2:]], axis=0)
            oZ_hi[l] = pltpu.roll(bh, o, 0)
            oZ_lo[l] = pltpu.roll(bl, o, 0)

        def lmat(c: FF, s: FF) -> FF:
            return ff.stack([ff.stack([c, s], 0),
                             ff.stack([ff.neg(s), c], 0)], 0)

        def rmat_adj(c: FF, s: FF) -> FF:
            return ff.stack([ff.stack([c, ff.neg(s)], 0),
                             ff.stack([s, c], 0)], 0)

        # ---- chainA (reference :957-975): annihilate H[f][i, i-1]
        # from the right across factors f <= jmin-2.  Factor loop rolled
        # (dynamic batch-axis ref indexing) — the statically unrolled
        # body's p full-factor column pipelines blow the remote Mosaic
        # compiler up at p=16 N=528 (compile time grows superlinearly in
        # p*N and the helper dies; p=12 N=528 already took 150 s) ------
        def chainA():
            def astep(t, c):
                f = t
                act = f <= jmin - 2
                x0 = kel(oH_hi, oH_lo, f, i, i)
                x1 = kel(oH_hi, oH_lo, f, i, i - 1)
                w, tau, beta = reflector_ff(ff.stack([x0, x1], 0))
                wv = ff.stack([FF(w.hi[1], w.lo[1]), one], 0)
                tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (2,)),
                               jnp.broadcast_to(tau.lo, (2,))), wv)
                M2 = ff.sub(
                    ff.ff(jnp.stack([
                        jnp.stack([jnp.float32(1.0), jnp.float32(0.0)]),
                        jnp.stack([jnp.float32(0.0), jnp.float32(1.0)])])),
                    ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                           FF(wv.hi[None, :], wv.lo[None, :])))
                ksetel(f, i, i - 1, zero, act)
                ksetel(f, i, i, beta, act)
                kcols(f, i - 1, M2, hi=i, active=act)
                krows(f + 1, i - 1, M2, lo=i - 1, active=act)
                zup(f + 1, i - 1, M2, active=act)
                return c
            if p > 1:
                lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), astep,
                              jnp.int32(0))

        # ---- chainB (reference :901-1054): <= 20 cleanup rounds ------
        def chainB():
            def round_(carry):
                replaceG, done, t = carry
                act = jnp.logical_not(done)
                g0 = kel(oH_hi, oH_lo, 0, i - 1, i - 1)
                g1 = kel(oH_hi, oH_lo, 0, i, i - 1)
                cg, sg, _ = givens_ff(g0, g1)
                c = ff.where(replaceG, cg, cs0)
                s = ff.where(replaceG, sg, sn0)
                krows(0, i - 1, lmat(c, s), lo=i - 1, active=act)
                tgt = p - 1 if p > 1 else 0
                kcols(tgt, i - 1, rmat_adj(c, s), hi=i + 1, active=act)
                zup(0, i - 1, rmat_adj(c, s), active=act)
                def bstep(t, c):
                    f = jnp.int32(p - 1) - t
                    actf = act & (f >= jmax + 1)
                    x0 = kel(oH_hi, oH_lo, f, i - 1, i - 1)
                    x1 = kel(oH_hi, oH_lo, f, i, i - 1)
                    w_, tau_, beta_ = reflector_ff(ff.stack([x0, x1], 0))
                    M2 = refl_mat_ff(w_, tau_)
                    ksetel(f, i - 1, i - 1, beta_, actf)
                    ksetel(f, i, i - 1, zero, actf)
                    krows(f, i - 1, M2, lo=i, active=actf)
                    kcols(f - 1, i - 1, M2, hi=i + 1, active=actf)
                    zup(f, i - 1, M2, active=actf)
                    return c
                if p > 1:
                    lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), bstep,
                                  jnp.int32(0))
                subv = kel(oH_hi, oH_lo, 0, i, i - 1)
                suba = ff.abs_(subv)
                small = (suba.hi < thr.hi) | \
                    ((suba.hi == thr.hi) & (suba.lo < thr.lo))
                conv = jnp.logical_not(replaceG) | small
                return (jnp.asarray(True), done | conv, t + 1)

            lax.while_loop(
                lambda c: jnp.logical_not(c[1]) & (c[2] < 20), round_,
                (replace0, jnp.asarray(False), jnp.int32(0)))
            ksetel(0, i, i - 1, zero, finzero)
            # zmax: the negligible-diagonal factor's own subdiagonal
            ksetel(jnp.maximum(jmax, 0), i, i - 1, zero, jmax >= 1)

        pl.when(jmin >= 1)(chainA)
        pl.when(jmin < 1)(chainB)

    return kernel


def _vmem_bytes_defl(p, N, want_z):
    comps = 4 if want_z else 2
    return comps * p * N * N * 4


@functools.lru_cache(maxsize=16)
def _deflate_call(p: int, N: int, want_z: bool, interpret: bool):
    kern = _make_deflate_kernel(p, N, want_z)
    nin = 4 if want_z else 2
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 \
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nin
    out_shape = [jax.ShapeDtypeStruct((p, N, N), jnp.float32)] * 2
    if want_z:
        W = min(16, N)
        out_shape += [jax.ShapeDtypeStruct((p, W, N), jnp.float32)] * 2
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(nin)),
        input_output_aliases={2 + j: j for j in range(nin)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
        interpret=interpret,
    )


def deflate_kernel_fits(p: int, N: int, want_z: bool = True) -> bool:
    """H pair + the 16-row ZT window <= the bisected ~67 MiB Mosaic
    compiler ceiling for VMEM-resident state."""
    return (2 * p * N * N + 2 * p * min(16, N) * N) * 4 <= 64 * (1 << 20)


def deflate2x2_ff(H: FF, ZT, i, jmin, jmax, cs0: FF, sn0: FF,
                  replace0, finzero, thr_hi, thr_lo, *, want_z: bool,
                  interpret: bool = False):
    """Run the fused defl2 chainA/chainB branch; returns (H, ZT).

    Scalars: ``i`` active-window bottom; ``jmin``/``jmax`` the negligible
    triangular-diagonal factor indices (-1 = none); ``cs0``/``sn0`` the
    lanv2 replacement rotation (ds); ``replace0`` chainB's
    replace-rotation flag; ``finzero`` the final H0[i, i-1] force-zero
    flag ((jmax >= 0) | (bh21 == 0)); ``thr_hi/lo`` the f32-split
    convergence threshold max(smlnum, ulp * amx).

    Z^T rides through the kernel as the 16-row window [base, base+16),
    base = (i-1) & -8 (the branch only ever touches rows i-1, i); the
    window is sliced here and written back after the call.
    """
    p, N, _ = H.hi.shape
    iscal = jnp.stack([jnp.asarray(i, jnp.int32),
                       jnp.asarray(jmin, jnp.int32),
                       jnp.asarray(jmax, jnp.int32),
                       jnp.asarray(replace0).astype(jnp.int32),
                       jnp.asarray(finzero).astype(jnp.int32)])
    fscal = jnp.stack([cs0.hi, cs0.lo, sn0.hi, sn0.lo,
                       jnp.asarray(thr_hi, jnp.float32),
                       jnp.asarray(thr_lo, jnp.float32)])
    args = (iscal, fscal, H.hi, H.lo)
    if want_z:
        z32 = jnp.int32(0)
        W = min(16, N)
        base = (jnp.asarray(i, jnp.int32) - 1) & jnp.int32(-8)
        base = jnp.clip(base, 0, N - W)
        wh = jax.lax.dynamic_slice(ZT.hi, (z32, base, z32), (p, W, N))
        wl = jax.lax.dynamic_slice(ZT.lo, (z32, base, z32), (p, W, N))
        args = args + (wh, wl)
    with ff.no_barriers():
        outs = _deflate_call(p, N, want_z, interpret)(*args)
    Hn = FF(outs[0], outs[1])
    if want_z:
        zh = jax.lax.dynamic_update_slice(ZT.hi, outs[2], (z32, base, z32))
        zl = jax.lax.dynamic_update_slice(ZT.lo, outs[3], (z32, base, z32))
        ZTn = FF(zh, zl)
    else:
        ZTn = ZT
    return Hn, ZTn
