"""Pallas TPU kernels: fused float-float double-shift periodic QR sweep.

The round-1 core dispatched ~30 HLO slab ops per (k, factor) chase step
(~5-8M sequential device ops at p=8, n=128 -> ~50 s wall-clock and a 3e-8
on-chip backward-error floor from the x64-rewriter's weak add).  These
kernels replace the whole sweep with two `pallas_call`s in double-single
(float-float) arithmetic (ops/ff.py): exact two-sum/two-product on f32
pairs, ~2^-48 unit roundoff, restoring the <=1e-12 contract at hardware
f32 speed.

Semantics: the bulge chase of the reference's real `pschur!`
(/root/reference/src/PeriodicSchurDecompositions.jl:806-886), identical to
ops/pqr_real.py's `chase_step`, reorganized for the TPU's memory model
(Mosaic supports dynamic sublane (row) slicing but NOT dynamic lane
(column) slicing):

* kernel A (`sweep`) walks k = m..i-1 once: per step it generates the
  bulge/re-triangularization reflectors from a VMEM *working copy* C that
  carries the true interleaved values (left-updates as cheap row slabs;
  right-updates band-only via lane masks on 8-row slabs), applies ONLY the
  left (row) updates to H, and logs every right-side 3x3 transform.
* the host-side wrapper transposes H (XLA transpose, cheap),
* kernel B applies the logged right-transform chains to the transposed H
  and to Z (stored transposed throughout the iteration) as batched row
  slabs — valid because left and right multiplications commute as global
  matrix products: H_final = Lc @ H0 @ Rc regardless of interleaving.
* structural zeros (entries the reference force-writes during the chase)
  re-emerge only up to ds roundoff; the wrapper kills them with a triu
  mask (below-subdiagonal for H[0], below-diagonal for the triangular
  factors), which is where all deferred-ordering junk provably lands.

`interpret=True` runs the same kernels through the Pallas interpreter
(used by the CPU test suite; the TPU path compiles via Mosaic).
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
from .ffkern import matmul3_ff, refl_mat_s_ff, reflector3s_ff

# the kernels trace deep expression chains (ds arithmetic per chase step
# inside nested loops; the grouped variants unroll 8 steps per body);
# CPython's default recursion limit aborts tracing
if sys.getrecursionlimit() < 40000:
    sys.setrecursionlimit(40000)


def _eye32(k: int):
    """f32 identity via int32 iotas (jnp.eye uses int64 iota under x64,
    and any 64-bit type crashes the Mosaic backend)."""
    r = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r == c).astype(jnp.float32)


def _i2_flat():
    # constructed functionally (no closed-over constants, no reshape)
    one = jnp.float32(1.0)
    z = jnp.float32(0.0)
    return jnp.stack([one, z, z, one, z, z, z, z])


# Mosaic constraint: when the lane dimension spans more than one 128-tile
# (N > 128), a dynamic SUBLANE start must be provably a multiple of 8
# ("cannot statically prove that index in dimension 1 is a multiple of 8").
# For those sizes every row-slab access goes through an 8-aligned 16-row
# block with masked in-block extraction/insertion (exact: 0/1 masks); the
# wrapper pads N so the blocks always fit (see chase_sweep_ff).


def _read_rows(hi_ref, lo_ref, f, k, r):
    lanes = hi_ref.shape[-1]
    if lanes <= 128:
        return FF(hi_ref[f, pl.ds(k, r), :], lo_ref[f, pl.ds(k, r), :])
    k8 = pl.multiple_of(k & jnp.int32(-8), 8)
    o = k - k8
    bh = hi_ref[f, pl.ds(k8, 16), :]
    bl = lo_ref[f, pl.ds(k8, 16), :]
    sub = lax.broadcasted_iota(jnp.int32, bh.shape, 0)
    z = jnp.float32(0.0)
    hs, ls = [], []
    for a in range(r):
        # jnp.where, NOT bool.astype: the Mosaic convert lowering recurses
        # on bool->float (same footgun as int64 converts, see _band_col_apply)
        msk = sub == o + a
        hs.append(jnp.sum(jnp.where(msk, bh, z), axis=0))
        ls.append(jnp.sum(jnp.where(msk, bl, z), axis=0))
    return FF(jnp.stack(hs), jnp.stack(ls))


def _write_rows(hi_ref, lo_ref, f, k, vals: FF):
    r = vals.hi.shape[0]
    lanes = hi_ref.shape[-1]
    if lanes <= 128:
        hi_ref[f, pl.ds(k, r), :] = vals.hi
        lo_ref[f, pl.ds(k, r), :] = vals.lo
        return
    k8 = pl.multiple_of(k & jnp.int32(-8), 8)
    o = k - k8
    bh = hi_ref[f, pl.ds(k8, 16), :]
    bl = lo_ref[f, pl.ds(k8, 16), :]
    sub = lax.broadcasted_iota(jnp.int32, bh.shape, 0)
    for a in range(r):
        msk = sub == o + a
        bh = jnp.where(msk, vals.hi[a][None, :], bh)
        bl = jnp.where(msk, vals.lo[a][None, :], bl)
    hi_ref[f, pl.ds(k8, 16), :] = bh
    lo_ref[f, pl.ds(k8, 16), :] = bl


def _lane_iota(shape, dim=1):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _lane_extract(rows: FF, j):
    """(r,) FF column fragment at traced lane j of an (r, N) FF slab."""
    mask = _lane_iota(rows.hi.shape) == j
    z = jnp.float32(0.0)  # typed: python 0.0 becomes f64 under x64
    return FF(jnp.sum(jnp.where(mask, rows.hi, z), axis=1),
              jnp.sum(jnp.where(mask, rows.lo, z), axis=1))


def _lane_force(rows: FF, j, vals: FF, active) -> FF:
    """Overwrite lane j of an (r, N) FF slab with (r,) vals when active."""
    mask = (_lane_iota(rows.hi.shape) == j) & active
    return FF(jnp.where(mask, vals.hi[:, None], rows.hi),
              jnp.where(mask, vals.lo[:, None], rows.lo))


def _read_rows_raw(hi_ref, lo_ref, f, k, r):
    return FF(hi_ref[f, pl.ds(k, r), :], lo_ref[f, pl.ds(k, r), :])


def _write_rows_raw(hi_ref, lo_ref, f, k, vals: FF):
    r = vals.hi.shape[0]
    hi_ref[f, pl.ds(k, r), :] = vals.hi
    lo_ref[f, pl.ds(k, r), :] = vals.lo


def _band_col_apply(hi_ref, lo_ref, g, k, M: FF, width: int, N: int):
    """C[g][k-2:k+6, k:k+width] <- C[g][.., k:k+width] @ M  (lane-masked).

    Maintains the working copy's band under a right-side transform; only
    the 8 rows a later reflector generation can read need to be current.
    """
    # NOT jnp.clip: its python-int bounds become int64 under x64, and any
    # int64 in a Mosaic kernel sends the convert lowering into infinite
    # recursion
    if N <= 128:
        W = min(8, N)
        rb = jnp.maximum(jnp.int32(0), jnp.minimum(k - 2, jnp.int32(N - W)))
    else:
        # aligned 16-row slab covering rows k-2..k+5 (the maintained band);
        # extra rows get the same (mathematically exact) column transform
        W = 16
        rb = pl.multiple_of(
            jnp.maximum(jnp.int32(0), k - 2) & jnp.int32(-8), 8)
    slab = _read_rows_raw(hi_ref, lo_ref, g, rb, W)
    cols = [_lane_extract(slab, k + c) for c in range(width)]
    it = _lane_iota(slab.hi.shape)
    new_hi, new_lo = slab.hi, slab.lo
    for c in range(width):
        acc = ff.mul(cols[0], FF(M.hi[0, c], M.lo[0, c]))
        for s in range(1, width):
            acc = ff.add(acc, ff.mul(cols[s], FF(M.hi[s, c], M.lo[s, c])))
        mask = it == (k + c)
        new_hi = jnp.where(mask, acc.hi[:, None], new_hi)
        new_lo = jnp.where(mask, acc.lo[:, None], new_lo)
    _write_rows_raw(hi_ref, lo_ref, g, rb, FF(new_hi, new_lo))


def _flat_mat(M: FF, n2: int):
    # scalar extracts + one stack: Mosaic can neither shape-cast
    # (k,k)->(k*k,) nor slice rows of tiny arrays at sublane offsets
    k = M.hi.shape[0]
    parts = [M.hi[r, c] for r in range(k) for c in range(k)] + \
        [M.lo[r, c] for r in range(k) for c in range(k)]
    return jnp.stack(parts)


# ---------------------------------------------------------------------------
# Grouped (8-step) kernel variants for N > 128.
#
# The per-step kernels pay for Mosaic's aligned-sublane constraint with
# masked in-block extraction/insertion on every row access (a 16-row
# where+sum per row, ~60% of kernel A's vector ops).  The grouped variants
# iterate aligned 8-step groups: within a group the in-block row offset of
# step ``kk = base + a`` is the STATIC ``a``, so every row access becomes a
# static slice of a loaded (.., 16, N) block — no masks, no sums.  Kernel B
# additionally loads/stores each (p, 16, N) slab ONCE per group instead of
# once per step (~8x slab traffic).  Step order and ds arithmetic are
# identical to the per-step kernels, so results are bit-identical; steps
# outside [m, i) are masked with selects.


def _blk_get(hi_ref, lo_ref, f, base):
    return FF(hi_ref[f, pl.ds(base, 16), :], lo_ref[f, pl.ds(base, 16), :])


def _blk_put(hi_ref, lo_ref, f, base, blk: FF):
    hi_ref[f, pl.ds(base, 16), :] = blk.hi
    lo_ref[f, pl.ds(base, 16), :] = blk.lo


def _srows(blk: FF, a: int, r: int) -> FF:
    """Static 3/2-row slice of a (16, N) block value."""
    return FF(blk.hi[a:a + r], blk.lo[a:a + r])


def _srows_set(blk: FF, a: int, vals: FF, active) -> FF:
    """Write rows [a, a+r) of a block value, masked by scalar ``active``."""
    r = vals.hi.shape[0]
    old = FF(blk.hi[a:a + r], blk.lo[a:a + r])
    nh = jnp.where(active, vals.hi, old.hi)
    nl = jnp.where(active, vals.lo, old.lo)
    return FF(jnp.concatenate([blk.hi[:a], nh, blk.hi[a + r:]], axis=0),
              jnp.concatenate([blk.lo[:a], nl, blk.lo[a + r:]], axis=0))


def _band_col_apply_g(hi_ref, lo_ref, g, base, aa: int, kkv, M: FF,
                      width: int, act):
    """Grouped-static variant of :func:`_band_col_apply`.

    ``aa`` is the static in-group offset of ``kkv`` (may be 8 for the
    second per-factor transform of the last step); the covering aligned
    16-row slab starts at ``base`` when ``aa >= 2``, else one block up
    (clamped to 0 at the top edge — extra covered rows get the same
    mathematically exact column transform)."""
    if aa >= 2:
        rb = base
    else:
        rb = pl.multiple_of(
            jnp.maximum(base - jnp.int32(8), jnp.int32(0)), 8)
    slab = FF(hi_ref[g, pl.ds(rb, 16), :], lo_ref[g, pl.ds(rb, 16), :])
    cols = [_lane_extract(slab, kkv + c) for c in range(width)]
    it = _lane_iota(slab.hi.shape)
    new_hi, new_lo = slab.hi, slab.lo
    for c in range(width):
        acc = ff.mul(cols[0], FF(M.hi[0, c], M.lo[0, c]))
        for s in range(1, width):
            acc = ff.add(acc, ff.mul(cols[s], FF(M.hi[s, c], M.lo[s, c])))
        mask = (it == (kkv + c)) & act
        new_hi = jnp.where(mask, acc.hi[:, None], new_hi)
        new_lo = jnp.where(mask, acc.lo[:, None], new_lo)
    hi_ref[g, pl.ds(rb, 16), :] = new_hi
    lo_ref[g, pl.ds(rb, 16), :] = new_lo


def _make_sweep_kernel_g(p: int, N: int, hbm_inputs: bool = False):
    """Grouped kernel A (see block comment above): N > 128 only."""

    def kernel(scal, v0f, Hhi, Hlo, oHhi, oHlo, R0, R1, Chi, Clo, *sems):
        m = scal[0]
        i = scal[1]
        g0 = scal[2]
        g1 = scal[3]
        if hbm_inputs:
            c1 = pltpu.make_async_copy(Hhi, oHhi, sems[0])
            c2 = pltpu.make_async_copy(Hlo, oHlo, sems[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
            Chi[:] = oHhi[:]
            Clo[:] = oHlo[:]
        else:
            oHhi[:] = Hhi[:]
            oHlo[:] = Hlo[:]
            Chi[:] = Hhi[:]
            Clo[:] = Hlo[:]
        v0 = FF(jnp.stack([v0f[0], v0f[1], v0f[2]]),
                jnp.stack([v0f[3], v0f[4], v0f[5]]))

        def group(g, _):
            base = pl.multiple_of(g * 8, 8)
            for a in range(8):
                kk = base + a
                act = (kk >= m) & (kk < i)
                nr3 = (i - kk + 1) >= 3

                # ---- H[0] bulge reflector ----------------------------
                C0 = _blk_get(Chi, Clo, 0, base)
                rowsC0 = _srows(C0, a, 3)
                colC = _lane_extract(rowsC0, kk - 1)
                first = kk == m
                vk = ff.where(first, v0, colC)
                z3 = jnp.where(nr3, jnp.float32(1.0), jnp.float32(0.0))
                mask3 = jnp.stack([jnp.float32(1.0), jnp.float32(1.0), z3])
                vk = FF(vk.hi * mask3, vk.lo * mask3)
                w, tau, beta = reflector3s_ff(vk)
                M3 = refl_mat_s_ff(w, tau, 3)
                oH0 = _blk_get(oHhi, oHlo, 0, base)
                rowsH0 = _srows(oH0, a, 3)
                bnd = _lane_extract(rowsH0, kk - 1)
                rowsH0 = matmul3_ff(M3, rowsH0)
                rowsH0 = _lane_force(rowsH0, kk - 1, bnd, first)
                oH0 = _srows_set(oH0, a, rowsH0, act)
                _blk_put(oHhi, oHlo, 0, base, oH0)
                rowsC0 = matmul3_ff(M3, rowsC0)
                keep3 = ff.where(kk < i - 1, ff.zeros(()),
                                 FF(colC.hi[2], colC.lo[2]))
                newc = FF(jnp.stack([beta.hi, jnp.float32(0.0), keep3.hi]),
                          jnp.stack([beta.lo, jnp.float32(0.0), keep3.lo]))
                rowsC0 = _lane_force(rowsC0, kk - 1, newc, ~first)
                C0 = _srows_set(C0, a, rowsC0, act)
                _blk_put(Chi, Clo, 0, base, C0)
                _band_col_apply_g(Chi, Clo, p - 1, base, a, kk, M3, 3, act)
                R0[0, kk, :] = _flat_mat(M3, 9)
                R1[0, kk, :] = _i2_flat()

                # ---- factor re-triangularization loop ----------------
                def fac(t, _, a=a, kk=kk, act=act, nr3=nr3, mask3=mask3):
                    f = jnp.int32(p - 1) - t
                    Cf = _blk_get(Chi, Clo, f, base)
                    rowsCf = _srows(Cf, a, 3)
                    colv = _lane_extract(rowsCf, kk)
                    colv = FF(colv.hi * mask3, colv.lo * mask3)
                    w2, tau2, beta2 = reflector3s_ff(colv)
                    M3b = refl_mat_s_ff(w2, tau2, 3)
                    oHf = _blk_get(oHhi, oHlo, f, base)
                    oHf = _srows_set(
                        oHf, a, matmul3_ff(M3b, _srows(oHf, a, 3)), act)
                    rowsCf = matmul3_ff(M3b, rowsCf)
                    newcf = FF(jnp.stack([beta2.hi, jnp.float32(0.0),
                                          jnp.float32(0.0)]),
                               jnp.stack([beta2.lo, jnp.float32(0.0),
                                          jnp.float32(0.0)]))
                    rowsCf = _lane_force(rowsCf, kk, newcf, True)
                    Cf = _srows_set(Cf, a, rowsCf, act)

                    # second (2-element) re-triangularization when nr3
                    rows2 = _srows(Cf, a + 1, 2)
                    xc = _lane_extract(rows2, kk + 1)
                    xc3 = FF(jnp.stack([xc.hi[0], xc.hi[1],
                                        jnp.float32(0.0)]),
                             jnp.stack([xc.lo[0], xc.lo[1],
                                        jnp.float32(0.0)]))
                    wb, taub, betab = reflector3s_ff(xc3)
                    M2 = refl_mat_s_ff(wb, taub, 2)
                    eye2 = ff.ff(_eye32(2))
                    M2 = ff.where(nr3, M2, eye2)
                    oHf = _srows_set(
                        oHf, a + 1,
                        matmul3_ff(M2, _srows(oHf, a + 1, 2)), act)
                    _blk_put(oHhi, oHlo, f, base, oHf)
                    rows2 = matmul3_ff(M2, rows2)
                    newc2 = FF(jnp.stack([betab.hi, jnp.float32(0.0)]),
                               jnp.stack([betab.lo, jnp.float32(0.0)]))
                    rows2 = _lane_force(rows2, kk + 1, newc2, nr3)
                    Cf = _srows_set(Cf, a + 1, rows2, act)
                    _blk_put(Chi, Clo, f, base, Cf)
                    _band_col_apply_g(Chi, Clo, f - 1, base, a, kk, M3b, 3,
                                      act)
                    _band_col_apply_g(Chi, Clo, f - 1, base, a + 1, kk + 1,
                                      M2, 2, act)
                    R0[f, kk, :] = _flat_mat(M3b, 9)
                    R1[f, kk, :] = _flat_mat(M2, 4)
                    return jnp.int32(0)

                if p > 1:
                    lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), fac,
                                  jnp.int32(0))
            return jnp.int32(0)

        lax.fori_loop(g0, g1 + 1, group, jnp.int32(0))

    return kernel


def _make_apply_kernel_g(p: int, N: int, want_z: bool,
                         hbm_inputs: bool = False):
    """Grouped kernel B: one (p, 16, N) slab RMW per group per target."""

    def _rollg(R):
        if p == 1:
            return R
        return jnp.concatenate([R[1:], R[:1]], axis=0)

    def _process(hi_ref, lo_ref, R0g, R1g, base, m, i, hi_lane=None):
        blk = FF(hi_ref[:, pl.ds(base, 16), :],
                 lo_ref[:, pl.ds(base, 16), :])
        rows = [FF(blk.hi[:, r, :], blk.lo[:, r, :]) for r in range(16)]

        def el(R, a, q):
            return R[:, a, q][:, None]  # (p, 1) broadcast vs (p, N)

        for a in range(8):
            kk = base + a
            act = (kk >= m) & (kk < i)
            rs = [rows[a], rows[a + 1], rows[a + 2]]
            outs = []
            for r in range(3):  # out_r = sum_s M3[s, r] * rows[s]  (M3^T @)
                acc = ff.mul(FF(el(R0g, a, 0 * 3 + r),
                                el(R0g, a, 9 + 0 * 3 + r)), rs[0])
                for s in range(1, 3):
                    acc = ff.add(acc, ff.mul(
                        FF(el(R0g, a, s * 3 + r),
                           el(R0g, a, 9 + s * 3 + r)), rs[s]))
                outs.append(acc)
            o1 = ff.add(
                ff.mul(FF(el(R1g, a, 0), el(R1g, a, 4)), outs[1]),
                ff.mul(FF(el(R1g, a, 2), el(R1g, a, 6)), outs[2]))
            o2 = ff.add(
                ff.mul(FF(el(R1g, a, 1), el(R1g, a, 5)), outs[1]),
                ff.mul(FF(el(R1g, a, 3), el(R1g, a, 7)), outs[2]))
            outs = [outs[0], o1, o2]
            lane = _lane_iota(outs[0].hi.shape, 1)
            keep = act if hi_lane is None else act & (lane <= hi_lane)
            for s in range(3):
                rows[a + s] = FF(jnp.where(keep, outs[s].hi, rs[s].hi),
                                 jnp.where(keep, outs[s].lo, rs[s].lo))
        hi_ref[:, pl.ds(base, 16), :] = jnp.stack(
            [r.hi for r in rows], axis=1)
        lo_ref[:, pl.ds(base, 16), :] = jnp.stack(
            [r.lo for r in rows], axis=1)

    def kernel(scal, HThi, HTlo, ZThi, ZTlo, R0, R1,
               oHThi, oHTlo, oZThi, oZTlo, *sems):
        m = scal[0]
        i = scal[1]
        g0 = scal[2]
        g1 = scal[3]
        if hbm_inputs:
            cps = [pltpu.make_async_copy(HThi, oHThi, sems[0]),
                   pltpu.make_async_copy(HTlo, oHTlo, sems[1])]
            if want_z:
                cps += [pltpu.make_async_copy(ZThi, oZThi, sems[2]),
                        pltpu.make_async_copy(ZTlo, oZTlo, sems[3])]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
        else:
            oHThi[:] = HThi[:]
            oHTlo[:] = HTlo[:]
            if want_z:
                oZThi[:] = ZThi[:]
                oZTlo[:] = ZTlo[:]

        def group(g, _):
            base = pl.multiple_of(g * 8, 8)
            R0g = R0[:, pl.ds(base, 8), :]   # (p, 8, 18)
            R1g = R1[:, pl.ds(base, 8), :]   # (p, 8, 8)
            _process(oHThi, oHTlo, _rollg(R0g), _rollg(R1g), base, m, i,
                     hi_lane=i)
            if want_z:
                _process(oZThi, oZTlo, R0g, R1g, base, m, i)
            return jnp.int32(0)

        lax.fori_loop(g0, g1 + 1, group, jnp.int32(0))

    def kernel_noz(scal, HThi, HTlo, R0, R1, oHThi, oHTlo, *sems):
        kernel(scal, HThi, HTlo, None, None, R0, R1, oHThi, oHTlo, None,
               None, *sems)

    return kernel if want_z else kernel_noz


def _make_sweep_kernel(p: int, N: int, hbm_inputs: bool = False):
    """Kernel A: chase + left updates + working copy + right-op logging.

    ``hbm_inputs``: H stays in HBM (pltpu.ANY) and is DMA'd into the VMEM
    working copies — required once the six (p, N, N) f32 buffers exceed the
    128 MiB of VMEM (p=16, N=528 needs 129.25M with pure-VMEM windows).
    """

    def kernel(scal, v0f, Hhi, Hlo, oHhi, oHlo, R0, R1, Chi, Clo,
               *sems):
        m = scal[0]
        i = scal[1]
        if hbm_inputs:
            c1 = pltpu.make_async_copy(Hhi, oHhi, sems[0])
            c2 = pltpu.make_async_copy(Hlo, oHlo, sems[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
            Chi[:] = oHhi[:]
            Clo[:] = oHlo[:]
        else:
            oHhi[:] = Hhi[:]
            oHlo[:] = Hlo[:]
            Chi[:] = Hhi[:]
            Clo[:] = Hlo[:]
        # SMEM supports scalar loads only: gather v0 element-wise
        v0 = FF(jnp.stack([v0f[0], v0f[1], v0f[2]]),
                jnp.stack([v0f[3], v0f[4], v0f[5]]))

        def step(kk, _):
            nr3 = (i - kk + 1) >= 3

            # ---- H[0] bulge reflector --------------------------------
            rowsC0 = _read_rows(Chi, Clo, 0, kk, 3)
            colC = _lane_extract(rowsC0, kk - 1)
            first = kk == m
            vk = ff.where(first, v0, colC)
            z3 = jnp.where(nr3, jnp.float32(1.0), jnp.float32(0.0))
            mask3 = jnp.stack([jnp.float32(1.0), jnp.float32(1.0), z3])
            vk = FF(vk.hi * mask3, vk.lo * mask3)
            w, tau, beta = reflector3s_ff(vk)
            M3 = refl_mat_s_ff(w, tau, 3)
            # left update on H[0] (all lanes; sub-band junk dies in triu).
            # At k == m lane m-1 is the window-boundary subdiagonal column,
            # which the reference never touches (rowsk lo=k) — restore it.
            rowsH0 = _read_rows(oHhi, oHlo, 0, kk, 3)
            bnd = _lane_extract(rowsH0, kk - 1)
            rowsH0 = matmul3_ff(M3, rowsH0)
            rowsH0 = _lane_force(rowsH0, kk - 1, bnd, first)
            _write_rows(oHhi, oHlo, 0, kk, rowsH0)
            # working copy: left update + forced bulge column (k > m)
            rowsC0 = matmul3_ff(M3, rowsC0)
            keep3 = ff.where(kk < i - 1, ff.zeros(()),
                             FF(colC.hi[2], colC.lo[2]))
            newc = FF(jnp.stack([beta.hi, jnp.float32(0.0), keep3.hi]),
                      jnp.stack([beta.lo, jnp.float32(0.0), keep3.lo]))
            rowsC0 = _lane_force(rowsC0, kk - 1, newc, ~first)
            _write_rows(Chi, Clo, 0, kk, rowsC0)
            # right-side effect: C[p-1] cols kk..kk+2 (band) + log
            _band_col_apply(Chi, Clo, p - 1, kk, M3, 3, N)
            R0[0, kk, :] = _flat_mat(M3, 9)
            R1[0, kk, :] = _i2_flat()

            # ---- factor re-triangularization loop --------------------
            def fac(t, _):
                # int32-typed constant first: python-int OP tracer promotes
                # through an int64 asarray under x64, which Mosaic rejects
                f = jnp.int32(p - 1) - t
                rowsCf = _read_rows(Chi, Clo, f, kk, 3)
                colv = _lane_extract(rowsCf, kk)
                colv = FF(colv.hi * mask3, colv.lo * mask3)
                w2, tau2, beta2 = reflector3s_ff(colv)
                M3b = refl_mat_s_ff(w2, tau2, 3)
                _write_rows(oHhi, oHlo, f, kk,
                            matmul3_ff(M3b, _read_rows(oHhi, oHlo, f, kk, 3)))
                rowsCf = matmul3_ff(M3b, rowsCf)
                # the masked colv makes the reference's kept 3rd entry 0 in
                # both branches (src/PeriodicSchurDecompositions.jl:859-866)
                newcf = FF(jnp.stack([beta2.hi, jnp.float32(0.0),
                                      jnp.float32(0.0)]),
                           jnp.stack([beta2.lo, jnp.float32(0.0),
                                      jnp.float32(0.0)]))
                rowsCf = _lane_force(rowsCf, kk, newcf, True)
                _write_rows(Chi, Clo, f, kk, rowsCf)
                _band_col_apply(Chi, Clo, f - 1, kk, M3b, 3, N)
                R0[f, kk, :] = _flat_mat(M3b, 9)

                # second (2-element) re-triangularization when nr3
                rows2 = _read_rows(Chi, Clo, f, kk + 1, 2)
                xc = _lane_extract(rows2, kk + 1)
                xc3 = FF(jnp.stack([xc.hi[0], xc.hi[1], jnp.float32(0.0)]),
                         jnp.stack([xc.lo[0], xc.lo[1], jnp.float32(0.0)]))
                wb, taub, betab = reflector3s_ff(xc3)
                M2 = refl_mat_s_ff(wb, taub, 2)
                eye2 = ff.ff(_eye32(2))
                M2 = ff.where(nr3, M2, eye2)
                _write_rows(oHhi, oHlo, f, kk + 1,
                            matmul3_ff(M2, _read_rows(oHhi, oHlo, f,
                                                      kk + 1, 2)))
                rows2 = matmul3_ff(M2, rows2)
                newc2 = FF(jnp.stack([betab.hi, jnp.float32(0.0)]),
                           jnp.stack([betab.lo, jnp.float32(0.0)]))
                rows2 = _lane_force(rows2, kk + 1, newc2, nr3)
                _write_rows(Chi, Clo, f, kk + 1, rows2)
                _band_col_apply(Chi, Clo, f - 1, kk + 1, M2, 2, N)
                R1[f, kk, :] = _flat_mat(M2, 4)
                return jnp.int32(0)

            if p > 1:
                # int32 bounds: python-int fori bounds make an int64 loop
                # counter under x64, which Mosaic cannot lower
                lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), fac,
                              jnp.int32(0))
            return jnp.int32(0)

        lax.fori_loop(m, i, step, jnp.int32(0))

    return kernel


def _make_apply_kernel(p: int, N: int, want_z: bool,
                       hbm_inputs: bool = False):
    """Kernel B: apply logged right-transform chains to H^T (and Z^T).

    Target factor g receives source ((g+1) mod p)'s transforms (the chase
    updates H[f-1]'s columns with factor f's reflectors; H[p-1] with the
    H[0] bulge reflector); Z[f] receives its own factor's transforms.
    A column update cols <- cols @ M becomes rows <- M^T @ rows on the
    transposed storage.
    """

    def _load_logs(R, kk, n2):
        # returns ROW-MAJOR FLAT (p, n2) hi/lo pairs (no reshape: Mosaic
        # cannot shape-cast); _apply indexes elements by s*k+r
        v = R[:, pl.ds(kk, 1), :]  # (p, 1, 2*n2)
        hi = v[:, 0, :n2]
        lo = v[:, 0, n2:2 * n2]
        return FF(hi, lo)

    def _roll1(M: FF) -> FF:
        if p == 1:
            return M
        return FF(jnp.concatenate([M.hi[1:], M.hi[:1]], axis=0),
                  jnp.concatenate([M.lo[1:], M.lo[:1]], axis=0))

    def _apply(hi_ref, lo_ref, kk, M: FF, hi_lane=None):
        """rows <- M^T @ rows on a (p, k, N) slab; optionally lane-bounded.

        ``hi_lane``: only lanes <= hi_lane updated.  Used for H^T, where
        lanes are H's ROWS: the reference restricts column updates to rows
        0..i (hi_r, src/PeriodicSchurDecompositions.jl:844-883) — rows
        below the active window hold boundary subdiagonals that must not
        be touched.  Within rows 0..i the bound is immaterial (the skipped
        entries are structural zeros), which is what makes the deferred
        (commuted) application exact.
        """
        k = {9: 3, 4: 2}[M.hi.shape[1]]

        def _el(X, s, r):
            # static slice into the row-major flat log (no reshape/gather)
            q = s * k + r
            return X[:, q:q + 1]

        lanes = hi_ref.shape[-1]
        if lanes <= 128:
            rows = FF(hi_ref[:, pl.ds(kk, k), :],
                      lo_ref[:, pl.ds(kk, k), :])
            rs = [FF(rows.hi[:, s, :], rows.lo[:, s, :]) for s in range(k)]
        else:
            # aligned 16-row block + masked extraction (Mosaic requires
            # provably 8-aligned dynamic sublane starts once N > 128)
            kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
            o = kk - kk8
            blk = FF(hi_ref[:, pl.ds(kk8, 16), :],
                     lo_ref[:, pl.ds(kk8, 16), :])
            sub = lax.broadcasted_iota(jnp.int32, blk.hi.shape, 1)
            zf = jnp.float32(0.0)
            rs = []
            for s in range(k):
                msk = sub == o + s
                rs.append(FF(jnp.sum(jnp.where(msk, blk.hi, zf), axis=1),
                             jnp.sum(jnp.where(msk, blk.lo, zf), axis=1)))
        outs = []
        for r in range(k):  # out_r = sum_s M[:, s, r] * rows[:, s]  (M^T @)
            acc = ff.mul(FF(_el(M.hi, 0, r), _el(M.lo, 0, r)), rs[0])
            for s in range(1, k):
                acc = ff.add(acc, ff.mul(
                    FF(_el(M.hi, s, r), _el(M.lo, s, r)), rs[s]))
            outs.append(acc)
        if hi_lane is not None:
            lane = _lane_iota(outs[0].hi.shape, 1)
            outs = [FF(jnp.where(lane <= hi_lane, outs[s].hi, rs[s].hi),
                       jnp.where(lane <= hi_lane, outs[s].lo, rs[s].lo))
                    for s in range(k)]
        if lanes <= 128:
            new = ff.stack(outs, 1)
            hi_ref[:, pl.ds(kk, k), :] = new.hi
            lo_ref[:, pl.ds(kk, k), :] = new.lo
        else:
            bh, bl = blk.hi, blk.lo
            for s in range(k):
                msk = sub == o + s
                bh = jnp.where(msk, outs[s].hi[:, None, :], bh)
                bl = jnp.where(msk, outs[s].lo[:, None, :], bl)
            hi_ref[:, pl.ds(kk8, 16), :] = bh
            lo_ref[:, pl.ds(kk8, 16), :] = bl

    def _apply2(hi_ref, lo_ref, kk, M3: FF, M2: FF, hi_lane=None):
        """Fused per-step application: M3^T on rows kk..kk+2 then M2^T on
        rows kk+1..kk+2, with ONE load/store per array pair (the separate
        _apply calls each did their own read-modify-write of the same
        aligned block — this halves kernel B's slab traffic)."""

        def _el(X, k, s, r):
            q = s * k + r
            return X[:, q:q + 1]

        lanes = hi_ref.shape[-1]
        if lanes <= 128:
            blk = FF(hi_ref[:, pl.ds(kk, 3), :], lo_ref[:, pl.ds(kk, 3), :])
            rs = [FF(blk.hi[:, s, :], blk.lo[:, s, :]) for s in range(3)]
        else:
            kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
            o = kk - kk8
            blk = FF(hi_ref[:, pl.ds(kk8, 16), :],
                     lo_ref[:, pl.ds(kk8, 16), :])
            sub = lax.broadcasted_iota(jnp.int32, blk.hi.shape, 1)
            zf = jnp.float32(0.0)
            rs = []
            for s in range(3):
                msk = sub == o + s
                rs.append(FF(jnp.sum(jnp.where(msk, blk.hi, zf), axis=1),
                             jnp.sum(jnp.where(msk, blk.lo, zf), axis=1)))
        outs = []
        for r in range(3):
            acc = ff.mul(FF(_el(M3.hi, 3, 0, r), _el(M3.lo, 3, 0, r)),
                         rs[0])
            for s in range(1, 3):
                acc = ff.add(acc, ff.mul(
                    FF(_el(M3.hi, 3, s, r), _el(M3.lo, 3, s, r)), rs[s]))
            outs.append(acc)
        o1 = ff.add(
            ff.mul(FF(_el(M2.hi, 2, 0, 0), _el(M2.lo, 2, 0, 0)), outs[1]),
            ff.mul(FF(_el(M2.hi, 2, 1, 0), _el(M2.lo, 2, 1, 0)), outs[2]))
        o2 = ff.add(
            ff.mul(FF(_el(M2.hi, 2, 0, 1), _el(M2.lo, 2, 0, 1)), outs[1]),
            ff.mul(FF(_el(M2.hi, 2, 1, 1), _el(M2.lo, 2, 1, 1)), outs[2]))
        outs = [outs[0], o1, o2]
        if hi_lane is not None:
            lane = _lane_iota(outs[0].hi.shape, 1)
            outs = [FF(jnp.where(lane <= hi_lane, outs[s].hi, rs[s].hi),
                       jnp.where(lane <= hi_lane, outs[s].lo, rs[s].lo))
                    for s in range(3)]
        if lanes <= 128:
            new = ff.stack(outs, 1)
            hi_ref[:, pl.ds(kk, 3), :] = new.hi
            lo_ref[:, pl.ds(kk, 3), :] = new.lo
        else:
            bh, bl = blk.hi, blk.lo
            for s in range(3):
                msk = sub == o + s
                bh = jnp.where(msk, outs[s].hi[:, None, :], bh)
                bl = jnp.where(msk, outs[s].lo[:, None, :], bl)
            hi_ref[:, pl.ds(kk8, 16), :] = bh
            lo_ref[:, pl.ds(kk8, 16), :] = bl

    def kernel(scal, HThi, HTlo, ZThi, ZTlo, R0, R1,
               oHThi, oHTlo, oZThi, oZTlo, *sems):
        m = scal[0]
        i = scal[1]
        if hbm_inputs:
            cps = [pltpu.make_async_copy(HThi, oHThi, sems[0]),
                   pltpu.make_async_copy(HTlo, oHTlo, sems[1])]
            if want_z:
                cps += [pltpu.make_async_copy(ZThi, oZThi, sems[2]),
                        pltpu.make_async_copy(ZTlo, oZTlo, sems[3])]
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
        else:
            oHThi[:] = HThi[:]
            oHTlo[:] = HTlo[:]
            if want_z:
                oZThi[:] = ZThi[:]
                oZTlo[:] = ZTlo[:]

        def step(kk, _):
            M0 = _load_logs(R0, kk, 9)
            M1 = _load_logs(R1, kk, 4)
            _apply2(oHThi, oHTlo, kk, _roll1(M0), _roll1(M1), hi_lane=i)
            if want_z:
                _apply2(oZThi, oZTlo, kk, M0, M1)
            return jnp.int32(0)

        lax.fori_loop(m, i, step, jnp.int32(0))

    def kernel_noz(scal, HThi, HTlo, R0, R1, oHThi, oHTlo, *sems):
        kernel(scal, HThi, HTlo, None, None, R0, R1, oHThi, oHTlo, None,
               None, *sems)

    return kernel if want_z else kernel_noz


def _vmem_bytes(p, N, n_arrays):
    lanes = -(-N // 128) * 128
    rows = -(-N // 8) * 8
    return n_arrays * p * rows * lanes * 4


@functools.lru_cache(maxsize=32)
def _sweep_call(p: int, N: int, interpret: bool):
    # pure-VMEM windows need 6 full (p, N, N) f32 buffers (input windows are
    # not deduplicated by aliasing); past ~96 MiB switch the H inputs to HBM
    # and DMA them in (4 buffers resident)
    hbm_inputs = _vmem_bytes(p, N, 6) > 96 * (1 << 20) and not interpret
    mk = _make_sweep_kernel_g if N > 128 else _make_sweep_kernel
    kern = mk(p, N, hbm_inputs)
    n_res = 4 if hbm_inputs else 6
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 40 * 4 + (1 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.VMEM((p, N, N), jnp.float32),
               pltpu.VMEM((p, N, N), jnp.float32)]
    if hbm_inputs:
        scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((p, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((p, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((p, N, 18), jnp.float32),
                   jax.ShapeDtypeStruct((p, N, 8), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=h_space),
                  pl.BlockSpec(memory_space=h_space)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=scratch,
        input_output_aliases={} if hbm_inputs else {2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=32)
def _apply_call(p: int, N: int, want_z: bool, interpret: bool):
    n_out = 4 if want_z else 2
    n_arr = 2 * n_out
    hbm_inputs = _vmem_bytes(p, N, n_arr) > 96 * (1 << 20) and not interpret
    mk = _make_apply_kernel_g if N > 128 else _make_apply_kernel
    kern = mk(p, N, want_z, hbm_inputs)
    n_res = n_out if hbm_inputs else n_arr
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 40 * 4 + (1 << 20)
    big_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.SemaphoreType.DMA] * n_out if hbm_inputs else []
    call = pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                        for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=big_space)] * n_out
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
        scratch_shapes=scratch,
        input_output_aliases={} if hbm_inputs else
        {1 + j: j for j in range(n_out)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )
    return call


def chase_sweep_ff(H: FF, ZT, m, i, v0: FF, *, want_z: bool,
                   interpret: bool = False):
    """One full double-shift QR sweep over the window [m, i] in ds precision.

    Args:
      H: (p, N, N) FF stack (N = n + 1 ghost-padded), H[0] Hessenberg.
      ZT: (p, N, N) FF stack of TRANSPOSED Schur vector factors (or None).
      m, i: traced int32 window bounds (sweep chases k = m..i-1).
      v0: FF (3,) normalized first shifted column.
      want_z: static; update ZT.
      interpret: run kernels through the Pallas interpreter (CPU tests).

    Returns (H, ZT) updated.  Structural sub-triangular entries are exact
    zeros on output.
    """
    p, N, _ = H.hi.shape
    m32 = jnp.asarray(m, jnp.int32)
    i32 = jnp.asarray(i, jnp.int32)
    # aligned group bounds for the grouped (N > 128) kernels: steps
    # kk = m..i-1 live in groups [m // 8, (i - 1) // 8]; an empty sweep
    # (i <= m) yields g1 < g0 and the group loop does not run
    g0 = m32 // 8
    g1 = jnp.where(i32 > m32, (i32 - 1) // 8, g0 - 1)
    scal = jnp.stack([m32, i32, g0, g1])
    v0f = jnp.concatenate([v0.hi, v0.lo]).astype(jnp.float32)

    # kernels are traced WITHOUT EFT barriers (Mosaic cannot lower them and
    # provably does not need them); the surrounding XLA glue keeps them
    with ff.no_barriers():
        Hhi, Hlo, R0, R1p = _sweep_call(p, N, interpret)(scal, v0f,
                                                         H.hi, H.lo)
    R1 = R1p  # (p, N, 8): 2x2 hi | lo

    HThi = jnp.swapaxes(Hhi, 1, 2)
    HTlo = jnp.swapaxes(Hlo, 1, 2)
    if want_z:
        with ff.no_barriers():
            outs = _apply_call(p, N, True, interpret)(
                scal, HThi, HTlo, ZT.hi, ZT.lo, R0, R1)
        HThi, HTlo, ZThi, ZTlo = outs
        ZT = FF(ZThi, ZTlo)
    else:
        with ff.no_barriers():
            HThi, HTlo = _apply_call(p, N, False, interpret)(
                scal, HThi, HTlo, R0, R1)
    H = FF(jnp.swapaxes(HThi, 1, 2), jnp.swapaxes(HTlo, 1, 2))

    # structural enforcement: deferred-ordering junk lands strictly below
    # the subdiagonal of H[0] / the diagonal of the triangular factors
    h0 = FF(jnp.triu(H.hi[0], -1), jnp.triu(H.lo[0], -1))
    if p > 1:
        rest = FF(jnp.triu(H.hi[1:]), jnp.triu(H.lo[1:]))
        H = FF(jnp.concatenate([h0.hi[None], rest.hi]),
               jnp.concatenate([h0.lo[None], rest.lo]))
    else:
        H = FF(h0.hi[None], h0.lo[None])
    return H, ZT
