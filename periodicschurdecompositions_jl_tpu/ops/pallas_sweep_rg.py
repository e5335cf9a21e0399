"""Pallas TPU kernels: fused ds real generalized double-shift QZ chase.

The chase loop of ``pqz_real_ff.act_sweep`` (reference
src/rgeneralized.jl:953-1014) traces ~40 slab-op dispatches per
(step, factor) into the while-body HLO — the same remote-compile blowup
and per-dispatch cost the complex glue sweep had (ops/pallas_sweep_cx.py
docstring).  These kernels replace the chase with three `pallas_call`s;
the sweep's opening and closing single steps stay in the XLA glue.

Per chase step j (j = jlo..ilast-2) and factor, TWO Givens pairs
propagate: (c2, s2) acting on rows/cols j+1:j+3 and (c1, s1) on j:j+2.
Kernel A maintains a VMEM working copy with the glue's exact interleaved
order (two 2-row left applies + two 2-column band applies per factor,
register-carried generation inputs) and logs the FUSED 3x3 transforms:

  L[l, j]  = E1(c1) @ E2(c2)   — left action on H[l] rows j:j+3
             (E2 embeds lmat(c2) at rows 1..2, E1 at rows 0..1; E2 acts
             first, matching the glue's rowsk(j+1) then rowsk(j) order),
  R[l, j]  = R2e @ R1e         — right action on H[l] cols j:j+3
             (R2e embeds rmat_adj at cols 1..2 and acts first),
  ZR[l, j] = R2e @ R1e of the factor's OWN pair — what Z[l] receives.

Kernel B0 applies the L chains to H rows (batched over factors); kernel
B applies R^T to H^T (lanes = H rows, bounded by hi_lane = ilast) and
ZR^T to Z^T.  Deferred-application exactness is the standard commuting
argument (ops/pallas_sweep.py); the wrapper triu-scrubs the deferred
junk but PRESERVES the genuine closing bulge H[0][ilast, ilast-2] that
the glue's closing rotation consumes.
"""
from __future__ import annotations

import functools
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ff
from .ff import FF
from .ffkern import givens_ff
from .pallas_sweep import (_lane_iota, _read_rows, _read_rows_raw,
                           _write_rows, _write_rows_raw)

if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)


# ---------------------------------------------------------------------------
# fused 3x3 transform builders (scalar FF entries, closed forms)


def _fuse_left(c1: FF, s1: FF, c2: FF, s2: FF):
    """E1(c1,s1) @ E2(c2,s2) as a 3x3 tuple-of-rows of scalar FF:
    [[c1, s1 c2, s1 s2], [-s1, c1 c2, c1 s2], [0, -s2, c2]]."""
    z = ff.zeros(())
    return ((c1, ff.mul(s1, c2), ff.mul(s1, s2)),
            (ff.neg(s1), ff.mul(c1, c2), ff.mul(c1, s2)),
            (z, ff.neg(s2), c2))


def _fuse_right(c1: FF, s1: FF, c2: FF, s2: FF):
    """R2e(c2,s2) @ R1e(c1,s1) as a 3x3 tuple-of-rows:
    [[c1, -s1, 0], [c2 s1, c2 c1, -s2], [s2 s1, s2 c1, c2]]."""
    z = ff.zeros(())
    return ((c1, ff.neg(s1), z),
            (ff.mul(c2, s1), ff.mul(c2, c1), ff.neg(s2)),
            (ff.mul(s2, s1), ff.mul(s2, c1), c2))


def _flat18(M):
    """18 f32 log lanes from a 3x3 tuple of scalar FF (row-major,
    [hi(9) | lo(9)]; matches kernel B/B0's _log_entry slicing)."""
    ents = [M[r][c] for r in range(3) for c in range(3)]
    return jnp.stack([e.hi for e in ents] + [e.lo for e in ents])


def _lmat2_s(c: FF, s: FF):
    return ((c, s), (ff.neg(s), c))


def _rmat2_adj_s(c: FF, s: FF):
    return ((c, ff.neg(s)), (s, c))


# ---------------------------------------------------------------------------
# kernel-A building blocks (FF variants of pallas_sweep_cx's helpers)


def _row_of(rows: FF, t: int) -> FF:
    return FF(rows.hi[t], rows.lo[t])


def _sub_scalar(acc: FF, mask) -> FF:
    z = jnp.float32(0.0)
    return FF(jnp.sum(jnp.where(mask, acc.hi, z)),
              jnp.sum(jnp.where(mask, acc.lo, z)))


def _row2_apply(refs, f, k, M, N, force_lane=None, force_vals=None,
                gen_lanes=None, gen_row=1):
    """C[f][k:k+2, :] <- M @ rows (M a 2x2 tuple of scalar FF), with
    optional forced lane and register-carried generation extraction from
    row ``gen_row`` of the in-register results."""
    hi_ref, lo_ref = refs
    rows = _read_rows(hi_ref, lo_ref, f, k, 2)
    r0 = _row_of(rows, 0)
    r1 = _row_of(rows, 1)
    n0 = ff.add(ff.mul(M[0][0], r0), ff.mul(M[0][1], r1))
    n1 = ff.add(ff.mul(M[1][0], r0), ff.mul(M[1][1], r1))
    gens = None
    if gen_lanes is not None:
        src = (n0, n1)[gen_row]
        li = lax.broadcasted_iota(jnp.int32, src.hi.shape, 0)
        gens = tuple(_sub_scalar(src, li == g) for g in gen_lanes)
    if force_lane is not None:
        li = lax.broadcasted_iota(jnp.int32, n0.hi.shape, 0)
        fm = li == force_lane

        def frc(nv, fv):
            return FF(jnp.where(fm, fv.hi, nv.hi),
                      jnp.where(fm, fv.lo, nv.lo))

        n0 = frc(n0, force_vals[0])
        n1 = frc(n1, force_vals[1])
    new = FF(jnp.stack([n0.hi, n1.hi]), jnp.stack([n0.lo, n1.lo]))
    _write_rows(hi_ref, lo_ref, f, k, new, )
    return gens


def _band_col2_apply(refs, g, k, M, N, gen_row0=None, gen_cnt=2,
                     force_row=None, force_vals=None):
    """C[g][band, k:k+2] <- band @ M (M 2x2 tuple of scalar FF) on an
    aligned row slab; optional generation extraction from the NEW column
    k (``gen_cnt`` scalars starting at global row ``gen_row0``) and a
    forced global row."""
    hi_ref, lo_ref = refs
    if N <= 128:
        W = min(8, N)
        rb = jnp.maximum(jnp.int32(0), jnp.minimum(k - 2, jnp.int32(N - W)))
    else:
        W = 16
        rb = pl.multiple_of(
            jnp.maximum(jnp.int32(0), k - 2) & jnp.int32(-8), 8)
    slab = _read_rows_raw(hi_ref, lo_ref, g, rb, W)
    it = _lane_iota(slab.hi.shape)

    def lane_extract(j):
        mask = it == j
        z = jnp.float32(0.0)
        return FF(jnp.sum(jnp.where(mask, slab.hi, z), axis=1),
                  jnp.sum(jnp.where(mask, slab.lo, z), axis=1))

    cols = [lane_extract(k + c) for c in range(2)]
    new_hi, new_lo = slab.hi, slab.lo
    gens = None
    for c in range(2):
        acc = ff.add(ff.mul(cols[0], M[0][c]), ff.mul(cols[1], M[1][c]))
        sub = lax.broadcasted_iota(jnp.int32, acc.hi.shape, 0)
        if gen_row0 is not None and c == 0:
            gens = tuple(_sub_scalar(acc, sub == gen_row0 + t - rb)
                         for t in range(gen_cnt))
        if force_row is not None:
            fm = sub == force_row - rb
            fv = force_vals[c]
            acc = FF(jnp.where(fm, fv.hi, acc.hi),
                     jnp.where(fm, fv.lo, acc.lo))
        mask = it == (k + c)
        new_hi = jnp.where(mask, acc.hi[:, None], new_hi)
        new_lo = jnp.where(mask, acc.lo[:, None], new_lo)
    _write_rows_raw(hi_ref, lo_ref, g, rb, FF(new_hi, new_lo))
    return gens


# ---------------------------------------------------------------------------
# kernel A


def _make_rg_sweep_kernel(p: int, N: int, S: Tuple[bool, ...],
                          hbm_inputs: bool = False):
    def kernel(scal, Hhi, Hlo, R0, Chi, Clo, *sems):
        m = scal[0]
        i = scal[1]  # ilast: steps run j = m..i-2
        if hbm_inputs:
            c1c = pltpu.make_async_copy(Hhi, Chi, sems[0])
            c2c = pltpu.make_async_copy(Hlo, Clo, sems[1])
            c1c.start()
            c2c.start()
            c1c.wait()
            c2c.wait()
        else:
            Chi[:] = Hhi[:]
            Clo[:] = Hlo[:]
        refs = (Chi, Clo)
        zs = ff.zeros(())

        # seed: the opening (glue) left the bulge in column m-1, rows
        # m..m+2 — the first step's generation fragment
        seedv = _read_rows(Chi, Clo, 0, m, 3)
        mask0 = _lane_iota(seedv.hi.shape) == m - 1
        z = jnp.float32(0.0)
        seed = tuple(
            FF(jnp.sum(jnp.where(mask0, seedv.hi, z), axis=1)[t],
               jnp.sum(jnp.where(mask0, seedv.lo, z), axis=1)[t])
            for t in range(3))

        def step(j, carry):
            g0, g1, g2 = carry
            # factor-0 bulge rotations from the carried column fragment
            c2, s2, r2 = givens_ff(g1, g2)
            c1, s1, r1 = givens_ff(g0, r2)
            # left applies on C[0] rows j+1:j+3 then j:j+2, forcing the
            # bulge column (r1, 0, 0) at lane j-1 (the first apply zeroes
            # rows j+1, j+2 there; the second writes r1 at row j)
            _row2_apply(refs, 0, j + 1, _lmat2_s(c2, s2), N,
                        force_lane=j - 1, force_vals=(zs, zs))
            _row2_apply(refs, 0, j, _lmat2_s(c1, s1), N,
                        force_lane=j - 1, force_vals=(r1, zs))
            R0[0, j, 0:18] = _flat18(_fuse_left(c1, s1, c2, s2))
            R0[0, j, 36:54] = _flat18(_fuse_right(c1, s1, c2, s2))

            for l in range(p - 1, 0, -1):
                if S[l]:
                    # incoming rights, regen from the new columns
                    gg2 = _band_col2_apply(refs, l, j + 1,
                                           _rmat2_adj_s(c2, s2), N,
                                           gen_row0=j + 1)
                    c2n, s2n, rr2 = givens_ff(gg2[0], gg2[1])
                    _row2_apply(refs, l, j + 1, _lmat2_s(c2n, s2n), N,
                                force_lane=j + 1, force_vals=(rr2, zs))
                    gg1 = _band_col2_apply(refs, l, j,
                                           _rmat2_adj_s(c1, s1), N,
                                           gen_row0=j)
                    c1n, s1n, rr1 = givens_ff(gg1[0], gg1[1])
                    _row2_apply(refs, l, j, _lmat2_s(c1n, s1n), N,
                                force_lane=j, force_vals=(rr1, zs))
                    # L = own pair; R = incoming pair
                    R0[l, j, 0:18] = _flat18(
                        _fuse_left(c1n, s1n, c2n, s2n))
                    R0[l, j, 18:36] = _flat18(_fuse_right(c1, s1, c2, s2))
                else:
                    # incoming lefts, regen from the new rows, own rights
                    gl2 = _row2_apply(refs, l, j + 1, _lmat2_s(c2, s2), N,
                                      gen_lanes=(j + 2, j + 1), gen_row=1)
                    c2n, s2n, rr2 = givens_ff(gl2[0], ff.neg(gl2[1]))
                    _band_col2_apply(refs, l, j + 1,
                                     _rmat2_adj_s(c2n, s2n), N,
                                     force_row=j + 2, force_vals=(zs, rr2))
                    gl1 = _row2_apply(refs, l, j, _lmat2_s(c1, s1), N,
                                      gen_lanes=(j + 1, j), gen_row=1)
                    c1n, s1n, rr1 = givens_ff(gl1[0], ff.neg(gl1[1]))
                    _band_col2_apply(refs, l, j,
                                     _rmat2_adj_s(c1n, s1n), N,
                                     force_row=j + 1, force_vals=(zs, rr1))
                    # L = incoming pair; R = own pair
                    R0[l, j, 0:18] = _flat18(_fuse_left(c1, s1, c2, s2))
                    R0[l, j, 18:36] = _flat18(
                        _fuse_right(c1n, s1n, c2n, s2n))
                R0[l, j, 36:54] = _flat18(_fuse_right(c1n, s1n, c2n, s2n))
                c1, s1, c2, s2 = c1n, s1n, c2n, s2n

            # ring close on factor 0 (cols j+1:j+3 then j:j+2); the new
            # column j's rows j+1..j+3 feed the next step
            _band_col2_apply(refs, 0, j + 1, _rmat2_adj_s(c2, s2), N)
            gg = _band_col2_apply(refs, 0, j, _rmat2_adj_s(c1, s1), N,
                                  gen_row0=j + 1, gen_cnt=3)
            R0[0, j, 18:36] = _flat18(_fuse_right(c1, s1, c2, s2))
            return gg

        lax.fori_loop(m, i - 1, step, seed)

    return kernel


# ---------------------------------------------------------------------------
# kernels B0 / B


def _log_entry(v, base: int, r: int, c: int) -> FF:
    q = r * 3 + c
    return FF(v[:, 0, base + q:base + q + 1],
              v[:, 0, base + 9 + q:base + 9 + q + 1])


def _apply_logged3(hi_ref, lo_ref, kk, v, base: int, N, transpose: bool,
                   hi_lane=None):
    """rows kk:kk+3 of a (p, N, N) FF buffer <- M @ rows (or M^T @ rows),
    M the logged 3x3 at lane block ``base``."""
    if N <= 128:
        bh = hi_ref[:, pl.ds(kk, 3), :]
        bl = lo_ref[:, pl.ds(kk, 3), :]
        rs = [FF(bh[:, t, :], bl[:, t, :]) for t in range(3)]
        ctx = None
    else:
        kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
        o = kk - kk8
        bh = pltpu.roll(hi_ref[:, pl.ds(kk8, 16), :], -o, 1)
        bl = pltpu.roll(lo_ref[:, pl.ds(kk8, 16), :], -o, 1)
        rs = [FF(bh[:, t, :], bl[:, t, :]) for t in range(3)]
        ctx = (kk8, o)

    def el(rr, cc):
        if transpose:
            rr, cc = cc, rr
        return _log_entry(v, base, rr, cc)

    outs = []
    for rr in range(3):
        acc = ff.mul(el(rr, 0), rs[0])
        for ss in range(1, 3):
            acc = ff.add(acc, ff.mul(el(rr, ss), rs[ss]))
        outs.append(acc)
    if hi_lane is not None:
        lane = _lane_iota(outs[0].hi.shape, 1)
        outs = [FF(jnp.where(lane <= hi_lane, o.hi, r.hi),
                   jnp.where(lane <= hi_lane, o.lo, r.lo))
                for o, r in zip(outs, rs)]
    nh = jnp.stack([o.hi for o in outs], 1)
    nl = jnp.stack([o.lo for o in outs], 1)
    if ctx is None:
        hi_ref[:, pl.ds(kk, 3), :] = nh
        lo_ref[:, pl.ds(kk, 3), :] = nl
    else:
        kk8, o = ctx
        bh2 = jnp.concatenate([nh, bh[:, 3:, :]], axis=1)
        bl2 = jnp.concatenate([nl, bl[:, 3:, :]], axis=1)
        hi_ref[:, pl.ds(kk8, 16), :] = pltpu.roll(bh2, o, 1)
        lo_ref[:, pl.ds(kk8, 16), :] = pltpu.roll(bl2, o, 1)


def _group_apply3(hi_ref, lo_ref, b, v8, base: int, m, ihi,
                  transpose: bool, hi_lane=None):
    """8 consecutive chase steps' fused 3x3 transforms on ONE aligned
    16-row slab, applied sequentially in registers (bitwise-identical to
    the per-step rolled-RMW chain; steps j outside [m, ihi-2] keep rows
    unchanged).  Max touched row t+2 <= 9 < 16."""
    bh = hi_ref[:, pl.ds(b, 16), :]
    bl = lo_ref[:, pl.ds(b, 16), :]
    rows = [FF(bh[:, t, :], bl[:, t, :]) for t in range(16)]
    lane = _lane_iota(rows[0].hi.shape, 1)
    for t in range(8):
        j = b + jnp.int32(t)
        act = (j >= m) & (j <= ihi - 2)
        v = v8[:, t:t + 1, :]

        def el(rr, cc):
            if transpose:
                rr, cc = cc, rr
            return _log_entry(v, base, rr, cc)

        rs = [rows[t], rows[t + 1], rows[t + 2]]
        outs = []
        for rr in range(3):
            acc = ff.mul(el(rr, 0), rs[0])
            for ss in range(1, 3):
                acc = ff.add(acc, ff.mul(el(rr, ss), rs[ss]))
            outs.append(acc)
        if hi_lane is not None:
            outs = [FF(jnp.where(lane <= hi_lane, o.hi, r.hi),
                       jnp.where(lane <= hi_lane, o.lo, r.lo))
                    for o, r in zip(outs, rs)]
        for rr in range(3):
            rows[t + rr] = FF(jnp.where(act, outs[rr].hi, rs[rr].hi),
                              jnp.where(act, outs[rr].lo, rs[rr].lo))
    hi_ref[:, pl.ds(b, 16), :] = jnp.stack([r.hi for r in rows], 1)
    lo_ref[:, pl.ds(b, 16), :] = jnp.stack([r.lo for r in rows], 1)


def _make_rg_left_kernel(p: int, N: int, hbm_inputs: bool = False):
    def kernel(scal, Hhi, Hlo, R0, oHhi, oHlo, *sems):
        m = scal[0]
        i = scal[1]
        if hbm_inputs:
            c1c = pltpu.make_async_copy(Hhi, oHhi, sems[0])
            c2c = pltpu.make_async_copy(Hlo, oHlo, sems[1])
            c1c.start()
            c2c.start()
            c1c.wait()
            c2c.wait()
        else:
            oHhi[:] = Hhi[:]
            oHlo[:] = Hlo[:]

        def step(j, _):
            v = R0[:, pl.ds(j, 1), :]
            _apply_logged3(oHhi, oHlo, j, v, 0, N, transpose=False)
            return jnp.int32(0)

        def group(t, _):
            b = pl.multiple_of(g0 + t * jnp.int32(8), 8)
            v8 = R0[:, pl.ds(b, 8), :]
            _group_apply3(oHhi, oHlo, b, v8, 0, m, i, transpose=False)
            return jnp.int32(0)

        if N > 128 and not hbm_inputs:
            g0 = pl.multiple_of(m & jnp.int32(-8), 8)
            ngroups = (i - jnp.int32(1) - g0 + jnp.int32(7)) >> 3
            lax.fori_loop(jnp.int32(0), jnp.maximum(ngroups, 0), group,
                          jnp.int32(0))
        else:
            lax.fori_loop(m, i - 1, step, jnp.int32(0))

    return kernel


def _make_rg_apply_kernel(p: int, N: int, want_z: bool,
                          hbm_inputs: bool = False):
    def kernel(scal, HThi, HTlo, ZThi, ZTlo, R0,
               oHhi, oHlo, oZhi, oZlo, *sems):
        m = scal[0]
        i = scal[1]
        pairs = [(HThi, oHhi), (HTlo, oHlo)]
        if want_z:
            pairs += [(ZThi, oZhi), (ZTlo, oZlo)]
        if hbm_inputs:
            cps = [pltpu.make_async_copy(a, b, s) for (a, b), s in
                   zip(pairs, sems)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        else:
            for a, b in pairs:
                b[:] = a[:]

        def step(j, _):
            v = R0[:, pl.ds(j, 1), :]
            _apply_logged3(oHhi, oHlo, j, v, 18, N, transpose=True,
                           hi_lane=i)
            if want_z:
                _apply_logged3(oZhi, oZlo, j, v, 36, N, transpose=True)
            return jnp.int32(0)

        def group(t, _):
            b = pl.multiple_of(g0 + t * jnp.int32(8), 8)
            v8 = R0[:, pl.ds(b, 8), :]
            _group_apply3(oHhi, oHlo, b, v8, 18, m, i, transpose=True,
                          hi_lane=i)
            if want_z:
                _group_apply3(oZhi, oZlo, b, v8, 36, m, i, transpose=True)
            return jnp.int32(0)

        if N > 128 and not hbm_inputs:
            g0 = pl.multiple_of(m & jnp.int32(-8), 8)
            ngroups = (i - jnp.int32(1) - g0 + jnp.int32(7)) >> 3
            lax.fori_loop(jnp.int32(0), jnp.maximum(ngroups, 0), group,
                          jnp.int32(0))
        else:
            lax.fori_loop(m, i - 1, step, jnp.int32(0))

    def kernel_noz(scal, HThi, HTlo, R0, oHhi, oHlo, *sems):
        kernel(scal, HThi, HTlo, None, None, R0, oHhi, oHlo, None, None,
               *sems)

    return kernel if want_z else kernel_noz


# ---------------------------------------------------------------------------
# pallas_call wrappers


def _vmem_bytes(p, N, n_arrays):
    lanes = -(-N // 128) * 128
    rows = -(-N // 8) * 8
    return n_arrays * p * rows * lanes * 4


@functools.lru_cache(maxsize=32)
def _rg_sweep_call(p: int, N: int, S: Tuple[bool, ...], interpret: bool):
    hbm_inputs = _vmem_bytes(p, N, 4) > 96 * (1 << 20) and not interpret
    kern = _make_rg_sweep_kernel(p, N, S, hbm_inputs)
    n_res = 2 if hbm_inputs else 4
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 54 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.VMEM((p, N, N), jnp.float32)] * 2
    if hbm_inputs:
        scratch += [pltpu.SemaphoreType.DMA] * 2
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((p, N, 54), jnp.float32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=h_space)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _rg_left_call(p: int, N: int, interpret: bool):
    hbm_inputs = _vmem_bytes(p, N, 4) > 96 * (1 << 20) and not interpret
    kern = _make_rg_left_kernel(p, N, hbm_inputs)
    n_res = 2 if hbm_inputs else 4
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 54 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.SemaphoreType.DMA] * 2 if hbm_inputs else []
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                        for _ in range(2)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=h_space)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2)),
        scratch_shapes=scratch,
        input_output_aliases={} if hbm_inputs else {1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _rg_apply_call(p: int, N: int, want_z: bool, interpret: bool):
    n_out = 4 if want_z else 2
    hbm_inputs = _vmem_bytes(p, N, 2 * n_out) > 96 * (1 << 20) \
        and not interpret
    kern = _make_rg_apply_kernel(p, N, want_z, hbm_inputs)
    n_res = n_out if hbm_inputs else 2 * n_out
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 54 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.SemaphoreType.DMA] * n_out if hbm_inputs else []
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                        for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=h_space)] * n_out
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
        scratch_shapes=scratch,
        input_output_aliases={} if hbm_inputs else
        {1 + j: j for j in range(n_out)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 127 * (1 << 20))),
        interpret=interpret,
    )


def _pad_to(x, N):
    p, n, _ = x.shape
    return jnp.zeros((p, N, N), jnp.float32).at[:, :n, :n].set(x)


def rg_chase_sweep_ff(H: FF, Z: Optional[FF], jlo, ilast, *,
                      S: Tuple[bool, ...], want_z: bool,
                      interpret: bool = False):
    """The double-shift chase j = jlo..ilast-2 in ds (three fused Pallas
    kernels); the opening (at ifirst) and closing (at ilast-1) single
    steps stay in pqz_real_ff's XLA glue.

    Args:
      H: (p, n, n) FF stack mid-sweep (bulge in column jlo-1).
      Z: (p, n, n) FF orthogonal stack (NOT transposed) or None.
      jlo, ilast: traced int32; jlo = ifirst+1.

    Returns (H, Z) with exact structural zeros EXCEPT the genuine closing
    bulge H[0][ilast, ilast-2], which is preserved for the glue's closing
    rotation.
    """
    p, n, _ = H.hi.shape
    if n + 1 <= 128:
        N = n + 1
    else:
        N = ((n + 16 + 7) // 8) * 8
    m = jnp.asarray(jlo, jnp.int32)
    il = jnp.asarray(ilast, jnp.int32)
    scal = jnp.stack([m, il])
    comps = [_pad_to(H.hi, N), _pad_to(H.lo, N)]

    with ff.no_barriers():
        (R0,) = _rg_sweep_call(p, N, S, interpret)(scal, *comps)
        comps = list(_rg_left_call(p, N, interpret)(scal, *comps, R0))

    compsT = [jnp.swapaxes(x, 1, 2) for x in comps]
    if want_z:
        zT = [jnp.swapaxes(_pad_to(x, N), 1, 2) for x in (Z.hi, Z.lo)]
        with ff.no_barriers():
            outs = _rg_apply_call(p, N, True, interpret)(
                scal, *compsT, *zT, R0)
        compsT = outs[:2]
        zc = [jnp.swapaxes(x, 1, 2)[:, :n, :n] for x in outs[2:]]
        Z = FF(zc[0], zc[1])
    else:
        with ff.no_barriers():
            compsT = _rg_apply_call(p, N, False, interpret)(
                scal, *compsT, R0)
    comps = [jnp.swapaxes(x, 1, 2)[:, :n, :n] for x in compsT]

    # structural scrub, PRESERVING the closing bulge at (ilast, ilast-2)
    ilc = jnp.clip(il, 0, n - 1)
    blc = jnp.clip(il - 2, 0, n - 1)

    def scrub(x):
        keep = lax.dynamic_slice(x[0], (ilc, blc), (1, 1))[0, 0]
        h0 = jnp.triu(x[0], -1)
        h0 = lax.dynamic_update_slice(h0, keep[None, None], (ilc, blc))
        rest = jnp.triu(x[1:]) if p > 1 else x[1:]
        return jnp.concatenate([h0[None], rest], axis=0)

    comps = [scrub(x) for x in comps]
    return FF(comps[0], comps[1]), Z
