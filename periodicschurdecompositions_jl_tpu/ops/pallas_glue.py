"""Fused per-iteration glue kernel for the ds real core (kernel G).

The chunked iteration's wall-clock is dominated by a ~12 ms/iter FIXED
cost (phases_p16_n512: 7.77 s at niter=640 with ~6 avg sweep steps/iter;
scaling: 4.2 ms at p=8 n=128, 6.2 at p=16 n=256 — O(p, n), not O(n^2)):
the per-iteration GLUE — the scaled band-product recurrence (emulated
f64: every op expands to many f32 ops), the deflation scan, and the
Francis shift chain — lowers to hundreds of tiny sequential XLA:TPU
kernels, each paying launch latency.  This kernel fuses all of it into
ONE pallas_call per iteration:

* the band recurrence (reference src/PeriodicSchurDecompositions.jl:
  477-528 semantics, the scaled form of ops/pqr_ff._band_products_scaled)
  runs in ds (float-float) arithmetic — exact EFTs at 2^-48, equal or
  better than the emulated-f64 glue it replaces — with a per-factor
  binary renormalization to |band| ~ [1, 2) and an exact power-of-two
  global exponent;
* the deflation scan (tightened Ahues-Tisseur + the round-3 stagnation
  relaxation, reference :291-295,535-565) compares hi parts in f32: the
  tests are magnitude comparisons with ~1e-3 headroom, and the ds hi
  part carries 2^-24 relative accuracy.  The f64 glue's smlnum term
  (~1e-294) is unrepresentable in f32 and drops to the exact-zero test;
* the dlahqr-style double-shift computation + first-column v0
  (reference :729-763) runs in ds scalars.

Vectors live TRANSPOSED as (n, 1) slabs: single-position shifts become
sublane rolls (static pltpu.roll — Mosaic forbids unaligned LANE
rotates, ops/pallas_sweep.py note).  Scalars in/out ride a (1, 128)
lane-addressed pack.  Everything Mosaic-exact, traced under
ff.no_barriers (same policy as the sweep kernels).

MEASURED OUTCOME (round-4 on-chip A/B, BASELINE.md): CORRECT
(backerr 1.86e-13, niter identical to the XLA-glue path) but ~1.5 s
SLOWER at the p=16 n=512 headline — the per-iteration fixed cost is
NOT the band/scan/shift glue this kernel fuses.  It ships as an
experimental path (AlgoConfig.glue_kernel / PSD_GLUE_KERNEL=1); the
remaining fixed-cost suspects are the sweep-kernel launches with
full-state copies and the chase/deflate cond boundary
(benchmarks/probe_iterfixed.py decomposes them).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ff
from .ff import FF

# f32 constants
_ULP = float(ff.EPS)  # ds unit roundoff 2^-47 (same as the f64 glue's ulp)


def _roll_up(x, k):
    """x shifted so out[r] = x[r + k] (sublane roll), tail rows zeroed."""
    n = x.shape[0]
    # out[r] = x[(r + k) % n]; shift must be i32 (a python int would
    # become a weak i64 under x64 and fail tpu.dynamic_rotate)
    out = pltpu.roll(x, jnp.int32(n - k), 0)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < n - k, out, jnp.float32(0.0))


def _roll_down(x, k, head):
    """out[r] = x[r - k]; rows < k set to ``head``."""
    out = pltpu.roll(x, jnp.int32(k), 0)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= k, out, jnp.float32(head))


def _ff_roll_up(x: FF, k) -> FF:
    return FF(_roll_up(x.hi, k), _roll_up(x.lo, k))


def _ff_roll_down(x: FF, k, head) -> FF:
    return FF(_roll_down(x.hi, k, head), _roll_down(x.lo, k, 0.0))


def _row_extract(v: FF, r) -> FF:
    """ds scalar at traced (float) sublane index r of an (n, 1) slab."""
    # tpu.iota is int-only; si32 -> f32 convert is supported (unlike the
    # bool-cast / int-reduction lowerings that recurse)
    row = lax.broadcasted_iota(jnp.int32, v.hi.shape, 0).astype(jnp.float32)
    m = row == r
    z = jnp.float32(0.0)
    return FF(jnp.sum(jnp.where(m, v.hi, z)), jnp.sum(jnp.where(m, v.lo, z)))


def _sc(x) -> FF:
    """f32 scalar -> ds."""
    return FF(jnp.float32(x), jnp.float32(0.0))


def _make_glue_kernel(p: int, n: int, slicot_convg: bool,
                      slicot_shifts: bool):
    """kernel G: see module docstring.

    Inputs (all VMEM): scalf (1, 128) f32 scalar pack
      [l, i, its, exc1, exc2] (the kernel is int-free — see below);
      Dh/Dl, Uh/Ul, Vh/Vl: (p, n, 1) factor diagonal / superdiag /
      2nd-superdiag stacks (ds pairs; U/V tails zero);
      S0h/S0l: (n, 1) H0 subdiagonal (s0[r] = H0[r, r-1], s0[0] = 0).
    Outputs: band (n, 8) f32
      [hdiag.hi, hdiag.lo, hsub.hi, hsub.lo, hsup.hi, hsup.lo, found_k,
       pad];
      spack (1, 128) f32: [0]=lnew, [1]=anyf, [2]=bexp,
      [3:9]=v0 (hi0, lo0, hi1, lo1, hi2, lo2), [9]=pad,
      [32:32+p]=scs (per-factor scale schedule).
    """

    def kernel(scalf, Dh, Dl, Uh, Ul, Vh, Vl, S0h, S0l, band, spack):
        # The kernel is INT-FREE: every scalar (l, i, its, exceptional
        # flags — `its % 10` needs integer division) arrives PRE-COMPUTED
        # as f32 lanes of ``scalf``, the row index is a float iota, and
        # all masks/reductions are float compares — int reductions and
        # bool casts send the Mosaic convert lowering into infinite
        # recursion (CLAUDE.md constraint; observed on-chip 03:16 on the
        # int-iota variant of this very kernel).

        def sclane(q):
            lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            return jnp.sum(jnp.where(lane == q, scalf[:, :],
                                     jnp.float32(0.0)))

        l = sclane(0)
        i = sclane(1)
        its = sclane(2)
        exc1 = sclane(3) > 0.5
        exc2 = sclane(4) > 0.5
        row = lax.broadcasted_iota(jnp.int32,
                                   (n, 1), 0).astype(jnp.float32)

        # ---- scaled band-product recurrence (ds) ------------------------
        one_col = jnp.ones((n, 1), jnp.float32)
        zero_col = jnp.zeros((n, 1), jnp.float32)
        P1 = FF(one_col, zero_col)
        P2 = FF(zero_col, zero_col)
        P3 = FF(zero_col, zero_col)
        bexp = jnp.float32(0.0)
        scs = [jnp.float32(1.0)]
        for f in range(1, p):
            D = FF(Dh[f, :, :], Dl[f, :, :])
            U = FF(Uh[f, :, :], Ul[f, :, :])
            V = FF(Vh[f, :, :], Vl[f, :, :])
            D1 = _ff_roll_up(D, 1)
            U1 = _ff_roll_up(U, 1)
            D2 = _ff_roll_up(D, 2)
            P3 = ff.add(ff.add(ff.mul(P1, V), ff.mul(P2, U1)),
                        ff.mul(P3, D2))
            P2 = ff.add(ff.mul(P1, U), ff.mul(P2, D1))
            P1 = ff.mul(P1, D)
            # binary renorm of max|P| to [1, 2): exact powers of two
            m = jnp.max(jnp.maximum(jnp.abs(P1.hi),
                                    jnp.maximum(jnp.abs(P2.hi),
                                                jnp.abs(P3.hi))))
            sc = jnp.float32(1.0)
            ex = jnp.float32(0.0)
            mm = jnp.where(m > 0, m, jnp.float32(1.0))
            for j in (64, 32, 16, 8, 4, 2, 1):
                big = mm >= jnp.float32(2.0 ** j)
                mm = jnp.where(big, mm * jnp.float32(2.0 ** -j), mm)
                sc = jnp.where(big, sc * jnp.float32(2.0 ** -j), sc)
                ex = jnp.where(big, ex + j, ex)
            for j in (64, 32, 16, 8, 4, 2, 1):
                sml = mm < jnp.float32(2.0 ** (1 - j))
                mm = jnp.where(sml, mm * jnp.float32(2.0 ** j), mm)
                sc = jnp.where(sml, sc * jnp.float32(2.0 ** j), sc)
                ex = jnp.where(sml, ex - j, ex)
            P1 = ff.mul_pow2(P1, sc)
            P2 = ff.mul_pow2(P2, sc)
            P3 = ff.mul_pow2(P3, sc)
            bexp = bexp + ex
            scs.append(sc)
        d0 = FF(Dh[0, :, :], Dl[0, :, :])
        u0 = FF(Uh[0, :, :], Ul[0, :, :])
        s0 = FF(S0h[:, :], S0l[:, :])
        P1m = _ff_roll_down(P1, 1, 1.0)
        P2m = _ff_roll_down(P2, 1, 0.0)
        P3m = _ff_roll_down(P3, 1, 0.0)
        P11 = _ff_roll_up(P1, 1)
        hsub = ff.mul(s0, P1m)
        hdiag = ff.add(ff.mul(s0, P2m), ff.mul(d0, P1))
        hsup = ff.add(ff.add(ff.mul(s0, P3m), ff.mul(d0, P2)),
                      ff.mul(u0, P11))

        # ---- deflation scan (f32 hi parts; reference :531-576) ----------
        hh22 = hdiag.hi
        hh21 = hsub.hi
        hh11 = _roll_down(hdiag.hi, 1, 0.0)
        hh12 = _roll_down(hsup.hi, 1, 0.0)
        a21 = jnp.abs(hh21)
        tst1 = jnp.abs(hh11) + jnp.abs(hh22)
        ulp = jnp.float32(_ULP)
        if slicot_convg:
            found_k = a21 <= ulp * tst1
        else:
            ulpx = jnp.float32(_ULP ** (1.0 + 4.0 / 16.0))
            ab = jnp.maximum(a21, jnp.abs(hh12))
            ba = jnp.minimum(a21, jnp.abs(hh12))
            aa = jnp.maximum(jnp.abs(hh22), jnp.abs(hh11 - hh22))
            bb = jnp.minimum(jnp.abs(hh22), jnp.abs(hh11 - hh22))
            stmp = aa + ab
            stmps = jnp.where(stmp == 0, jnp.float32(1.0), stmp)
            at_ok = ba * (ab / stmps) <= ulpx * (bb * (aa / stmps))
            found_k = (a21 == 0) | ((a21 <= ulp * tst1) & at_ok)
            # stagnation relaxation (ops/pqr_ff.py note)
            found_k |= (its >= 16) & (a21 <= ulp * tst1)
        found_k &= (row >= l + 1) & (row <= i)
        anyf = jnp.max(jnp.where(found_k, jnp.float32(1.0),
                                 jnp.float32(0.0)))
        klast = jnp.max(jnp.where(found_k, row, jnp.float32(-1.0)))
        lnew = jnp.where(i > l, jnp.where(anyf > 0, klast, l), i)

        # ---- dlahqr double shift + first column v0 (ds) ------------------
        def at(v: FF, idx) -> FF:
            return _row_extract(v, jnp.clip(idx, jnp.float32(0.0),
                                            jnp.float32(n - 1)))

        exc = exc1 | exc2
        sE_1 = ff.add(ff.abs_(at(hsub, lnew + 1)), ff.abs_(at(hsub, lnew + 2)))
        sE_2 = ff.add(ff.abs_(at(hsub, i)), ff.abs_(at(hsub, i - 1)))
        sE = ff.where(exc1, sE_1, sE_2)
        h44E = ff.add(ff.mul(_sc(0.75), sE),
                      ff.where(exc1, at(hdiag, lnew), at(hdiag, i)))
        h33E = h44E
        h43h34E = ff.mul(_sc(-0.4375), ff.sq(sE))
        h44 = at(hdiag, i)
        h33 = at(hdiag, i - 1)
        h43 = at(hsub, i)
        h34 = at(hsup, i - 1)
        ssh = ff.add(ff.add(ff.abs_(h33), ff.abs_(h34)),
                     ff.add(ff.abs_(h43), ff.abs_(h44)))
        ssh0 = ff.eq0(ssh)
        sshs = ff.where(ssh0, _sc(1.0), ssh)
        rsh = ff.recip(sshs)
        h33n = ff.mul(h33, rsh)
        h44n = ff.mul(h44, rsh)
        h34n = ff.mul(h34, rsh)
        h43n = ff.mul(h43, rsh)
        trc = ff.mul_pow2(ff.add(h33n, h44n), jnp.float32(0.5))
        disc = ff.sub(ff.mul(ff.sub(h33n, trc), ff.sub(h44n, trc)),
                      ff.mul(h34n, h43n))
        rtdisc = ff.sqrt(ff.abs_(disc))
        r1 = ff.add(trc, rtdisc)
        r2 = ff.sub(trc, rtdisc)
        pick_r1 = ff.le(ff.abs_(ff.sub(r1, h44n)),
                        ff.abs_(ff.sub(r2, h44n)))
        pick = ff.where(pick_r1, r1, r2)
        disc_pos = disc.hi >= 0
        rt1r = ff.where(ssh0, _sc(0.0),
                        ff.where(disc_pos, ff.mul(trc, ssh),
                                 ff.mul(pick, ssh)))
        rt2r = rt1r
        rt1i = ff.where(ssh0, _sc(0.0),
                        ff.where(disc_pos, ff.mul(rtdisc, ssh), _sc(0.0)))
        rt2i = ff.neg(rt1i)

        m = lnew
        h11 = at(hdiag, m)
        h12 = at(hsup, m)
        h21 = at(hsub, m + 1)
        h22 = at(hdiag, m + 1)
        hsub_m2 = at(hsub, m + 2)
        h44s = ff.sub(h44E, h11)
        h33s = ff.sub(h33E, h11)
        h21z = ff.eq0(h21)
        h21s_ = ff.where(h21z, _sc(1.0), h21)
        v1E = ff.add(ff.mul(ff.sub(ff.mul(h33s, h44s), h43h34E),
                            ff.recip(h21s_)), h12)
        v2E = ff.sub(ff.sub(ff.sub(h22, h11), h33s), h44s)
        v3E = hsub_m2
        sv = ff.add(ff.add(ff.abs_(ff.sub(h11, rt2r)), ff.abs_(rt2i)),
                    ff.abs_(h21))
        sv0 = ff.eq0(sv)
        svs = ff.where(sv0, _sc(1.0), sv)
        rsv = ff.recip(svs)
        h21s = ff.mul(h21, rsv)
        v1L = ff.sub(
            ff.add(ff.mul(h21s, h12),
                   ff.mul(ff.sub(h11, rt1r),
                          ff.mul(ff.sub(h11, rt2r), rsv))),
            ff.mul(rt1i, ff.mul(rt2i, rsv)))
        v2L = ff.mul(h21s, ff.sub(ff.sub(ff.add(h11, h22), rt1r), rt2r))
        v3L = ff.mul(h21s, hsub_m2)
        if slicot_shifts:
            use_exc = jnp.asarray(True)
        else:
            use_exc = exc
        v1 = ff.where(use_exc, v1E, v1L)
        v2 = ff.where(use_exc, v2E, v2L)
        v3 = ff.where(use_exc, v3E, v3L)
        snorm = ff.add(ff.add(ff.abs_(v1), ff.abs_(v2)), ff.abs_(v3))
        snorm0 = ff.eq0(snorm)
        snorms = ff.where(snorm0, _sc(1.0), snorm)
        rsn = ff.recip(snorms)
        v1 = ff.mul(v1, rsn)
        v2 = ff.mul(v2, rsn)
        v3 = ff.mul(v3, rsn)

        # ---- outputs -----------------------------------------------------
        band[:, 0:1] = hdiag.hi
        band[:, 1:2] = hdiag.lo
        band[:, 2:3] = hsub.hi
        band[:, 3:4] = hsub.lo
        band[:, 4:5] = hsup.hi
        band[:, 5:6] = hsup.lo
        band[:, 6:7] = jnp.where(found_k, jnp.float32(1.0),
                                 jnp.float32(0.0))
        band[:, 7:8] = jnp.zeros((n, 1), jnp.float32)
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        vals = [lnew, anyf, bexp,
                v1.hi, v1.lo, v2.hi, v2.lo, v3.hi, v3.lo]
        out = jnp.zeros((1, 128), jnp.float32)
        for q, v in enumerate(vals):
            out = jnp.where(lane == q, v, out)
        for f in range(p):
            out = jnp.where(lane == 32 + f, scs[f], out)
        spack[:, :] = out

    return kernel


@functools.lru_cache(maxsize=32)
def _glue_call(p: int, n: int, slicot_convg: bool, slicot_shifts: bool,
               interpret: bool):
    kern = _make_glue_kernel(p, n, slicot_convg, slicot_shifts)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, 8), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )


def glue_products_scan_shift(H: FF, n: int, l, i, its, cfg,
                             interpret: bool = False):
    """Run kernel G for one iteration of the ds real core.

    Extracts the factor diagonals from the padded (p, N, N) ds stack
    (cheap fused slices — the same extraction the f64 glue does), calls
    the fused kernel, and unpacks:

    Returns (hdiag, hsub, hsup, bexp, found_k, lnew, anyf, v0):
      hdiag/hsub/hsup: (n,) float64 scaled band entries (true values =
      scaled * 2^bexp) — same contract as _band_products_scaled;
      found_k: (n,) bool deflation mask (scan already windowed to
      [l+1, i] and stagnation-relaxed); lnew: int32; anyf: bool;
      v0: FF (3,) normalized shifted first column.
    """
    p = H.hi.shape[0]

    def dpair(lf, off):
        cnt = n - off
        dh = jnp.diagonal(H.hi[lf], off)[:cnt]
        dl = jnp.diagonal(H.lo[lf], off)[:cnt]
        pad = jnp.zeros((off,), jnp.float32)
        return (jnp.concatenate([dh, pad]) if off else dh,
                jnp.concatenate([dl, pad]) if off else dl)

    Dh = jnp.stack([dpair(f, 0)[0] for f in range(p)])[:, :, None]
    Dl = jnp.stack([dpair(f, 0)[1] for f in range(p)])[:, :, None]
    Uh = jnp.stack([dpair(f, 1)[0] for f in range(p)])[:, :, None]
    Ul = jnp.stack([dpair(f, 1)[1] for f in range(p)])[:, :, None]
    Vh = jnp.stack([dpair(f, 2)[0] for f in range(p)])[:, :, None]
    Vl = jnp.stack([dpair(f, 2)[1] for f in range(p)])[:, :, None]
    s0h = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                           jnp.diagonal(H.hi[0], -1)[:n - 1]])[:, None]
    s0l = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                           jnp.diagonal(H.lo[0], -1)[:n - 1]])[:, None]
    its32 = jnp.asarray(its, jnp.int32)
    exc1 = jnp.where(its32 == 10, 1.0, 0.0).astype(jnp.float32)
    exc2 = jnp.where(((its32 % 10) == 0) & (its32 != 10),
                     1.0, 0.0).astype(jnp.float32)
    scalf = jnp.zeros((1, 128), jnp.float32)
    for q, v in enumerate([jnp.asarray(l, jnp.int32).astype(jnp.float32),
                           jnp.asarray(i, jnp.int32).astype(jnp.float32),
                           its32.astype(jnp.float32), exc1, exc2]):
        scalf = scalf.at[0, q].set(v)
    with ff.no_barriers():
        band, spack = _glue_call(p, n, bool(cfg.slicot_convg),
                                 bool(cfg.slicot_shifts), interpret)(
            scalf, Dh, Dl, Uh, Ul, Vh, Vl, s0h, s0l)
    f64 = jnp.float64
    hdiag = band[:, 0].astype(f64) + band[:, 1].astype(f64)
    hsub = band[:, 2].astype(f64) + band[:, 3].astype(f64)
    hsup = band[:, 4].astype(f64) + band[:, 5].astype(f64)
    found_k = band[:, 6] > 0
    sp = spack[0]
    lnew = sp[0].astype(jnp.int32)
    anyf = sp[1] > 0
    bexp = sp[2].astype(jnp.int32)
    v0 = FF(jnp.stack([sp[3], sp[5], sp[7]]),
            jnp.stack([sp[4], sp[6], sp[8]]))
    return hdiag, hsub, hsup, bexp, found_k, lnew, anyf, v0
