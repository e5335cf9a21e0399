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
  right-updates band-only on aligned slabs), applies the FUSED per-step
  left transform F^T = (M3 M2e)^T to H's rows ONCE, and logs the fused
  right-side 3x3 F per (factor, step) — one transform per step per row
  halves the per-entry rounding chain vs applying the reflector pair
  separately (the dominant backward-error term).
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

Eigenvalue-only runs / `want_t` windowing (reference
src/generalized.jl:202-227,756-775 restricts updates to the active
window when T is unwanted): on the TPU the analogous lever does NOT
exist at kernel level — Mosaic has no dynamic LANE slicing, so a
row/column update is a full-N-lane slab op whether or not the columns
outside the window are maintained, and the per-step work is already
window-restricted in the sublane dimension.  What CAN be skipped is the
entire Z maintenance: `want_z=False` compiles kernel B without the Z^T
targets — measured 22% faster end-to-end at p=16 n=256 (2.43 s vs
3.11 s, results_r3.log 15:49).
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
from .ffkern import (fuse32b_flat, matmul3_ff, refl2_fused_flat,
                     refl3_fused_flat)

# the kernels trace deep expression chains (ds arithmetic per chase step
# inside nested loops); CPython's default recursion limit aborts tracing
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)


def _eye32(k: int):
    """f32 identity via int32 iotas (jnp.eye uses int64 iota under x64,
    and any 64-bit type crashes the Mosaic backend)."""
    r = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r == c).astype(jnp.float32)


# Mosaic constraint: when the lane dimension spans more than one 128-tile
# (N > 128), a dynamic SUBLANE start must be provably a multiple of 8
# ("cannot statically prove that index in dimension 1 is a multiple of 8").
# For those sizes every row-slab access goes through an 8-aligned 16-row
# block ROLLED by the in-block offset (pltpu.roll with a dynamic shift is
# an exact hardware sublane rotate), so the rows of interest sit at STATIC
# offsets — no masked extraction/insertion sums.  The wrapper pads N so
# the blocks always fit (see chase_sweep_ff).


import os as _os

_ROLL_ROWS = _os.environ.get("PSD_SWEEP_MASKED", "") != "1"

# Kernel-B group application mode — a first-class AlgoConfig switch
# (config.sweep_mode / config.sweep_hbm_grouped) threaded through
# chase_sweep_ff into the kernel builders:
#   "banded": compose each 8-step group's overlapping 3x3
#     transforms into one banded group operator and apply its 10 affected
#     rows in parallel — same backward stability, NOT bitwise vs the
#     per-step chain (summation order differs), ~72 independent FF
#     mul-adds instead of an 8-deep sequential chain.
#   "seq": in-register sequential per-step applies within the group
#     (bitwise-identical to the per-step path).
#   "step": per-step rolled RMW (the pre-grouping path).
# The env vars below feed ONLY the AlgoConfig defaults (and the probe
# subprocesses of benchmarks/, which set them before importing); library
# callers select the mode per call via AlgoConfig.
# probe_sweep_verify passed ALL modes on-chip (08-20 11:40-12:19), incl.
# banded+HBM at n=512; the 08-20 banded headline failure (340 iters, no
# deflation) is under pipeline-level investigation (chip_queue round 3).
_GROUP_MODE = _os.environ.get("PSD_GROUP_MODE", "step")
# engage the grouped path when inputs are HBM-staged (headline sizes):
# needs the raised scoped-vmem limit below
_GROUP_HBM = _os.environ.get("PSD_GROUP_HBM", "0") == "1"


def _read_rows(hi_ref, lo_ref, f, k, r):
    lanes = hi_ref.shape[-1]
    if lanes <= 128:
        return FF(hi_ref[f, pl.ds(k, r), :], lo_ref[f, pl.ds(k, r), :])
    k8 = pl.multiple_of(k & jnp.int32(-8), 8)
    o = k - k8
    if _ROLL_ROWS:
        bh = pltpu.roll(hi_ref[f, pl.ds(k8, 16), :], -o, 0)
        bl = pltpu.roll(lo_ref[f, pl.ds(k8, 16), :], -o, 0)
        return FF(bh[:r], bl[:r])
    bh = hi_ref[f, pl.ds(k8, 16), :]
    bl = lo_ref[f, pl.ds(k8, 16), :]
    sub = lax.broadcasted_iota(jnp.int32, bh.shape, 0)
    z = jnp.float32(0.0)
    hs, ls = [], []
    for a in range(r):
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
    if _ROLL_ROWS:
        bh = pltpu.roll(hi_ref[f, pl.ds(k8, 16), :], -o, 0)
        bl = pltpu.roll(lo_ref[f, pl.ds(k8, 16), :], -o, 0)
        bh = jnp.concatenate([vals.hi, bh[r:]], axis=0)
        bl = jnp.concatenate([vals.lo, bl[r:]], axis=0)
        hi_ref[f, pl.ds(k8, 16), :] = pltpu.roll(bh, o, 0)
        lo_ref[f, pl.ds(k8, 16), :] = pltpu.roll(bl, o, 0)
        return
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


# Lane (column) access stays MASKED: tpu.dynamic_rotate on the lane axis
# requires the lane dim to be a multiple of 128 ("unsupported unaligned
# shape" for e.g. vector<3x272xf32>), and the ghost-padded N rarely is.
# Sublane rotates have no such constraint (verified on-chip at N=272).


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


def _band_col_apply(hi_ref, lo_ref, g, k, M: FF, width: int, N: int,
                    gen_row0=None, gen_c1=False):
    """C[g][k-2:k+6, k:k+width] <- C[g][.., k:k+width] @ M.

    Maintains the working copy's band under a right-side transform; only
    the 8 rows a later reflector generation can read need to be current.

    ``gen_row0``: when given, ALSO return the fragment of the NEW column k
    at rows gen_row0..gen_row0+2 — the next reflector generation's input
    column, handed forward in registers so the generation chain (the
    sweep's sequential latency) never waits on this slab's write/re-read.
    The fragment is returned as a TUPLE OF 3 SCALAR FFs, not a (3,) array:
    loop-carried rank-1 vectors feeding the scalar generation chain crash
    the Mosaic layout pass ("Check failed: arr.size() >= layout_rank"),
    while scalar carries lower to SREGs.  Each scalar is extracted from
    the same ``acc`` values the slab write stores (single-nonzero masked
    sum), so register-carried and re-read values are bitwise identical.
    ``gen_c1``: also return the matching fragment of the new column k+1
    (the second re-triangularization reflector's input lane); the return
    becomes a (col_k, col_k1) tuple.  Rows outside the slab read all-False
    masks and yield exact zeros (never dereferenced by consumers).
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
    gens = [None, None]
    for c in range(width):
        acc = ff.mul(cols[0], FF(M.hi[0, c], M.lo[0, c]))
        for s in range(1, width):
            acc = ff.add(acc, ff.mul(cols[s], FF(M.hi[s, c], M.lo[s, c])))
        if gen_row0 is not None and (c == 0 or (gen_c1 and c == 1)):
            sub = lax.broadcasted_iota(jnp.int32, acc.hi.shape, 0)
            z = jnp.float32(0.0)
            off = gen_row0 - rb
            gens[c] = tuple(
                FF(jnp.sum(jnp.where(sub == off + j, acc.hi, z)),
                   jnp.sum(jnp.where(sub == off + j, acc.lo, z)))
                for j in range(3))
        mask = it == (k + c)
        new_hi = jnp.where(mask, acc.hi[:, None], new_hi)
        new_lo = jnp.where(mask, acc.lo[:, None], new_lo)
    _write_rows_raw(hi_ref, lo_ref, g, rb, FF(new_hi, new_lo))
    return tuple(gens) if gen_c1 else gens[0]


def _flat_mat(M: FF, n2: int):
    # scalar extracts + one stack: Mosaic can neither shape-cast
    # (k,k)->(k*k,) nor slice rows of tiny arrays at sublane offsets
    k = M.hi.shape[0]
    parts = [M.hi[r, c] for r in range(k) for c in range(k)] + \
        [M.lo[r, c] for r in range(k) for c in range(k)]
    return jnp.stack(parts)


def _mat_from_flat(M, k: int) -> FF:
    """(k,k) FF matrix from k*k row-major scalar FF entries (stack-only:
    Mosaic-safe, mirrors ffkern.refl_mat_s_ff's assembly)."""
    hi = jnp.stack([jnp.stack([M[r * k + c].hi for c in range(k)])
                    for r in range(k)])
    lo = jnp.stack([jnp.stack([M[r * k + c].lo for c in range(k)])
                    for r in range(k)])
    return FF(hi, lo)


def _ffel(v: FF, j: int) -> FF:
    return FF(v.hi[j], v.lo[j])


def _fuse32_ff(M3: FF, M2: FF) -> FF:
    """F = M3 @ E with E = diag-embed of M2 on rows/cols 1..2 (E[0,0]=1).

    One fused 3x3 per chase step replaces the (M3 then M2) transform PAIR:
    kernel B applies F once per step (right side), kernel A applies F^T
    once to H's rows (left side) — both reflectors are symmetric, so the
    right-composition F = M3 M2e and left-composition (M2e M3) are exact
    transposes.  Halves the per-row rounding chain (the backward-error
    driver) and cuts kernel B's arithmetic ~30%%."""

    def el3(r, c):
        return FF(M3.hi[r, c], M3.lo[r, c])

    def el2(r, c):
        return FF(M2.hi[r, c], M2.lo[r, c])

    rows_hi, rows_lo = [], []
    for r in range(3):
        e0 = el3(r, 0)
        e1 = ff.add(ff.mul(el3(r, 1), el2(0, 0)),
                    ff.mul(el3(r, 2), el2(1, 0)))
        e2 = ff.add(ff.mul(el3(r, 1), el2(0, 1)),
                    ff.mul(el3(r, 2), el2(1, 1)))
        rows_hi.append(jnp.stack([e0.hi, e1.hi, e2.hi]))
        rows_lo.append(jnp.stack([e0.lo, e1.lo, e2.lo]))
    return FF(jnp.stack(rows_hi), jnp.stack(rows_lo))


def _matmul3T_ff(M: FF, rows: FF) -> FF:
    """M^T @ rows without materializing the transpose (Mosaic-safe)."""
    k = M.hi.shape[0]
    outs = []
    for r in range(k):
        acc = ff.mul(FF(M.hi[0, r], M.lo[0, r]),
                     FF(rows.hi[0], rows.lo[0]))
        for s in range(1, k):
            acc = ff.add(acc, ff.mul(FF(M.hi[s, r], M.lo[s, r]),
                                     FF(rows.hi[s], rows.lo[s])))
        outs.append(acc)
    return ff.stack(outs, 0)


def _el_flat(M, q, b) -> FF:
    """Scalar entry q of row b from a flat batched matrix (list of (B,) FF)."""
    return FF(M[q].hi[b], M[q].lo[b])


def _matmul3_flat_b(M, b, rows: FF) -> FF:
    """rows (3, N) <- M_b @ rows, M a flat batched 3x3 (9 (B,) FF entries)."""
    outs = []
    for r in range(3):
        acc = ff.mul(_el_flat(M, r * 3, b), FF(rows.hi[0], rows.lo[0]))
        for s in range(1, 3):
            acc = ff.add(acc, ff.mul(_el_flat(M, r * 3 + s, b),
                                     FF(rows.hi[s], rows.lo[s])))
        outs.append(acc)
    return ff.stack(outs, 0)


def _matmul2_flat_b(M2, b, rows: FF) -> FF:
    """rows (2, N) <- M2_b @ rows, M2 a flat batched 2x2 (4 (B,) FF)."""
    outs = []
    for r in range(2):
        acc = ff.mul(_el_flat(M2, r * 2, b), FF(rows.hi[0], rows.lo[0]))
        acc = ff.add(acc, ff.mul(_el_flat(M2, r * 2 + 1, b),
                                 FF(rows.hi[1], rows.lo[1])))
        outs.append(acc)
    return ff.stack(outs, 0)


def _band_col_apply_flat_b(hi_ref, lo_ref, g, k, M, b, width: int, N: int,
                           lowext: int = 0):
    """_band_col_apply with a flat batched transform (row b of M).

    ``lowext``: extra maintained rows BELOW k-2.  Multi-bulge sweeps need
    the band current down to the hindmost trailing bulge's rows
    (k - (NB-1)*GAP ..): a trailing bulge's left transform mixes its three
    rows across ALL lanes — including the leading bulges' columns — so
    stale entries there would poison the working copy (verified: gen
    inputs match the full-update reference exactly once the slab reaches
    k-2-lowext; without it they diverge at the first trailing read).
    """
    if N <= 128:
        W = min(8 + lowext, N)
        rb = jnp.maximum(jnp.int32(0),
                         jnp.minimum(k - 2 - lowext, jnp.int32(N - W)))
    else:
        W = 16 + ((lowext + 7) & -8)
        rb = pl.multiple_of(
            jnp.maximum(jnp.int32(0), k - 2 - lowext) & jnp.int32(-8), 8)
        # N is a multiple of 8 (pqr_ff padding rule), so the clamp keeps
        # 8-alignment; re-assert it — a bare jnp.minimum erases the proof
        # and Mosaic then rejects the dynamic sublane start
        rb = pl.multiple_of(jnp.minimum(rb, jnp.int32(N - W)), 8)
    slab = _read_rows_raw(hi_ref, lo_ref, g, rb, W)
    cols = [_lane_extract(slab, k + c) for c in range(width)]
    it = _lane_iota(slab.hi.shape)
    new_hi, new_lo = slab.hi, slab.lo
    for c in range(width):
        acc = ff.mul(cols[0], _el_flat(M, c, b))
        for s in range(1, width):
            acc = ff.add(acc, ff.mul(cols[s], _el_flat(M, s * width + c, b)))
        mask = it == (k + c)
        new_hi = jnp.where(mask, acc.hi[:, None], new_hi)
        new_lo = jnp.where(mask, acc.lo[:, None], new_lo)
    _write_rows_raw(hi_ref, lo_ref, g, rb, FF(new_hi, new_lo))


def _flat_mat_b(M, b):
    """(18,) f32 log row from a flat batched 3x3 (9 (B,) FF entries)."""
    parts = [M[q].hi[b] for q in range(9)] + [M[q].lo[b] for q in range(9)]
    return jnp.stack(parts)


def _make_sweep_kernel(p: int, N: int, hbm_inputs: bool = False):
    """Kernel A: chase on the working copy + fused right-op logging.

    Generation-only: the H left/right applications live in the batched
    kernels (B0 left on H, B right on H^T/Z^T), OUTSIDE this kernel's
    sequential (step, factor) chain — they use the same logged F per step
    and vectorize over the p factors.  ``hbm_inputs``: H stays in HBM
    (pltpu.ANY) and is DMA'd into the VMEM working copy.
    """

    def kernel(scal, v0f, Hhi, Hlo, R0, Chi, Clo, *sems):
        m = scal[0]
        i = scal[1]
        if hbm_inputs:
            c1 = pltpu.make_async_copy(Hhi, Chi, sems[0])
            c2 = pltpu.make_async_copy(Hlo, Clo, sems[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
        else:
            Chi[:] = Hhi[:]
            Clo[:] = Hlo[:]
        # SMEM supports scalar loads only: gather v0 element-wise
        v0 = FF(jnp.stack([v0f[0], v0f[1], v0f[2]]),
                jnp.stack([v0f[3], v0f[4], v0f[5]]))

        # Register-carried generation columns: every reflector generation's
        # input column is column 0 (or 1) of the band apply that last wrote
        # it, extracted from the apply's in-register accumulators (bitwise
        # identical to a slab re-read) and threaded through the loop
        # carries — the sweep's sequential chain never waits on a slab
        # write/re-read/masked-lane-extract.  Carries are TUPLES OF 3
        # SCALAR FFs (rank-1 loop carries feeding the scalar chain crash
        # the Mosaic layout pass; scalars lower to SREGs).  Seed: the
        # pre-sweep bulge column (factor 0, lane m-1, rows m..m+2).
        seedv = _lane_extract(_read_rows(Chi, Clo, 0, m, 3), m - 1)
        seed = tuple(_ffel(seedv, j) for j in range(3))

        def step(kk, colC):
            nr3 = (i - kk + 1) >= 3

            # ---- H[0] bulge reflector --------------------------------
            # colC (carried) = factor 0, lane kk-1, rows kk..kk+2
            rowsC0 = _read_rows(Chi, Clo, 0, kk, 3)
            first = kk == m
            z3 = jnp.where(nr3, jnp.float32(1.0), jnp.float32(0.0))
            # scalar generation inputs (element 2 zeroed in the nr3 tail)
            vk0 = ff.where(first, _ffel(v0, 0), colC[0])
            vk1 = ff.where(first, _ffel(v0, 1), colC[1])
            vk2 = ff.where(first, _ffel(v0, 2), colC[2])
            vk2 = FF(vk2.hi * z3, vk2.lo * z3)
            M3f, beta = refl3_fused_flat(vk0, vk1, vk2)
            M3 = _mat_from_flat(M3f, 3)
            # working copy: left update + forced bulge column (k > m)
            rowsC0 = matmul3_ff(M3, rowsC0)
            keep3 = ff.where(kk < i - 1, ff.zeros(()), colC[2])
            newc = FF(jnp.stack([beta.hi, jnp.float32(0.0), keep3.hi]),
                      jnp.stack([beta.lo, jnp.float32(0.0), keep3.lo]))
            rowsC0 = _lane_force(rowsC0, kk - 1, newc, ~first)
            _write_rows(Chi, Clo, 0, kk, rowsC0)
            # right-side effect: C[p-1] cols kk..kk+2 (band) + log
            # (the bulge step has no second transform: F = M3); for p > 1
            # this seeds the fac-loop carry (factor p-1's generation
            # lanes kk, kk+1), for p == 1 it feeds the NEXT step's bulge
            # column (lane kk, rows kk+1..kk+3)
            if p > 1:
                g0, g1 = _band_col_apply(Chi, Clo, p - 1, kk, M3, 3, N,
                                         gen_row0=kk, gen_c1=True)
            else:
                nxt = _band_col_apply(Chi, Clo, 0, kk, M3, 3, N,
                                      gen_row0=kk + 1)
            R0[0, kk, :] = _flat_mat(M3, 9)

            # ---- factor re-triangularization loop --------------------
            def fac(t, carry):
                cv0, cv1 = carry
                # int32-typed constant first: python-int OP tracer promotes
                # through an int64 asarray under x64, which Mosaic rejects
                f = jnp.int32(p - 1) - t
                rowsCf = _read_rows(Chi, Clo, f, kk, 3)
                cv02 = FF(cv0[2].hi * z3, cv0[2].lo * z3)
                M3bf, beta2 = refl3_fused_flat(cv0[0], cv0[1], cv02)
                M3b = _mat_from_flat(M3bf, 3)
                rows3 = matmul3_ff(M3b, rowsCf)

                # second (2-element) re-triangularization when nr3; its
                # generation column = rows 1..2 of M3b @ (carried lane
                # kk+1 fragment), as scalar ds dots with matmul3_ff's
                # exact per-element expression tree — bitwise identical
                # to extracting lane kk+1 of rows3
                def _mrow(r):
                    acc = ff.mul(FF(M3b.hi[r, 0], M3b.lo[r, 0]), cv1[0])
                    acc = ff.add(acc, ff.mul(FF(M3b.hi[r, 1],
                                                M3b.lo[r, 1]), cv1[1]))
                    return ff.add(acc, ff.mul(FF(M3b.hi[r, 2],
                                                 M3b.lo[r, 2]), cv1[2]))
                M2f, betab = refl2_fused_flat(_mrow(1), _mrow(2),
                                              active=nr3)
                r12 = FF(rows3.hi[1:], rows3.lo[1:])
                M2 = _mat_from_flat(M2f, 2)
                rows12 = matmul3_ff(M2, r12)

                # ONE C write for the step: rows3 row 0 + M2-updated rows
                # 1..2, with the forced structural lanes (the lane-kk junk
                # M2 mixes is overwritten by the force, so this is value-
                # identical to the old two-write sequence)
                rowsC = FF(jnp.concatenate([rows3.hi[:1], rows12.hi]),
                           jnp.concatenate([rows3.lo[:1], rows12.lo]))
                newcf = FF(jnp.stack([beta2.hi, jnp.float32(0.0),
                                      jnp.float32(0.0)]),
                           jnp.stack([beta2.lo, jnp.float32(0.0),
                                      jnp.float32(0.0)]))
                rowsC = _lane_force(rowsC, kk, newcf, True)
                lane = _lane_iota(rowsC.hi.shape)
                row_i = lax.broadcasted_iota(jnp.int32, rowsC.hi.shape, 0)
                m2msk = (lane == kk + 1) & (row_i >= 1) & nr3
                newc2 = FF(jnp.stack([jnp.float32(0.0), betab.hi,
                                      jnp.float32(0.0)]),
                           jnp.stack([jnp.float32(0.0), betab.lo,
                                      jnp.float32(0.0)]))
                rowsC = FF(jnp.where(m2msk, newc2.hi[:, None], rowsC.hi),
                           jnp.where(m2msk, newc2.lo[:, None], rowsC.lo))
                _write_rows(Chi, Clo, f, kk, rowsC)

                # fused per-step transform F = M3b @ M2e: ONE band apply,
                # ONE log (see _fuse32_ff); the H applications happen in
                # the batched kernels from this log.  The apply's column
                # fragments feed the next generation: the next fac
                # iteration (factor f-1, lanes kk/kk+1, rows kk..) for
                # f > 1, the next STEP's bulge (lane kk, rows kk+1..)
                # when f == 1 — F's column 0 is M3b's, so the carried
                # dataflow never includes the second reflector.
                F = _fuse32_ff(M3b, M2)
                grow0 = jnp.where(f == jnp.int32(1), kk + 1, kk)
                n0, n1 = _band_col_apply(Chi, Clo, f - 1, kk, F, 3, N,
                                         gen_row0=grow0, gen_c1=True)
                R0[f, kk, :] = _flat_mat(F, 9)
                return (n0, n1)

            if p > 1:
                # int32 bounds: python-int fori bounds make an int64 loop
                # counter under x64, which Mosaic cannot lower
                nxt, _ = lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), fac,
                                       (g0, g1))
            return nxt

        lax.fori_loop(m, i, step, seed)

    return kernel


def _make_sweep_kernel_mb(p: int, N: int, NB: int, GAP: int,
                          hbm_inputs: bool = False):
    """Multi-bulge kernel A: chase NB double-shift bulges in one sweep.

    Bulge b trails bulge b-1 by GAP columns (GAP >= 3 keeps every pair of
    per-step transforms on disjoint lanes/rows, which is what makes the
    deferred all-of-bulge-0-then-all-of-bulge-1 application of kernels
    B0/B equal to the tick-order interleaving).  The per-bulge generation
    chains — the issue-bound cost of the sweep — run BATCHED as (NB,)
    ds ops (ffkern.reflector3b_ff and friends), so NB bulges cost about
    one bulge's sequential chain per (tick, factor).

    Shift pairs for bulges 1..NB-1 come from the glue (trailing 2x2
    blocks of the scaled cycle product, SMEM ``sig``); their v0 columns
    are computed IN-KERNEL at the introduction tick from the working
    copy's leading 3x3 product, accumulated under the glue's per-factor
    power-of-two scale schedule (SMEM ``scs``) so shifts and product
    entries share a scale.  Mirrors the small-bulge multishift QR idea
    (Braman-Byers-Mathias) applied to the periodic sweep of the
    reference's src/PeriodicSchurDecompositions.jl:806-886.

    Logs: R0 lanes [b*18, (b+1)*18) hold bulge b's fused F per
    (factor, step); kernels B0/B are invoked once per bulge with the
    corresponding lane slice.
    """

    def kernel(scal, v0f, sig, scs, Hhi, Hlo, R0, Chi, Clo, *sems):
        m = scal[0]
        i = scal[1]
        nbact = scal[2]
        if hbm_inputs:
            c1 = pltpu.make_async_copy(Hhi, Chi, sems[0])
            c2 = pltpu.make_async_copy(Hlo, Clo, sems[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
        else:
            Chi[:] = Hhi[:]
            Clo[:] = Hlo[:]
        v0_glue = (v0f[0], v0f[1], v0f[2], v0f[3], v0f[4], v0f[5])

        one_s = jnp.float32(1.0)
        zero_s = jnp.float32(0.0)

        def _lead_v0(b):
            """v0 (6 f32 scalars) for bulge b introduced at window top m,
            from the working copy's leading 3x3 cycle product."""

            def b3(f):
                rows = _read_rows(Chi, Clo, f, m, 3)
                cs = [_lane_extract(rows, m + c) for c in range(3)]
                return [FF(cs[c].hi[r], cs[c].lo[r])
                        for r in range(3) for c in range(3)]

            def mm33(A, B):
                out = []
                for r in range(3):
                    for c in range(3):
                        acc = ff.mul(A[r * 3], B[c])
                        acc = ff.add(acc, ff.mul(A[r * 3 + 1], B[3 + c]))
                        acc = ff.add(acc, ff.mul(A[r * 3 + 2], B[6 + c]))
                        out.append(acc)
                return out

            eye9 = [ff.ff(one_s if q in (0, 4, 8) else zero_s)
                    for q in range(9)]

            def facstep(t, T):
                f = jnp.int32(1) + t
                Tn = mm33(list(T), b3(f))
                sc = scs[f]
                return tuple(FF(e.hi * sc, e.lo * sc) for e in Tn)

            T = tuple(eye9)
            if p > 1:
                T = lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), facstep, T)
            A0 = b3(0)

            def a_entry(r, c):
                acc = ff.mul(A0[r * 3], T[c])
                acc = ff.add(acc, ff.mul(A0[r * 3 + 1], T[3 + c]))
                return ff.add(acc, ff.mul(A0[r * 3 + 2], T[6 + c]))

            h11 = a_entry(0, 0)
            h21 = a_entry(1, 0)
            h12 = a_entry(0, 1)
            h22 = a_entry(1, 1)
            h32 = a_entry(2, 1)
            rt1r = FF(sig[b * 6 + 0], sig[b * 6 + 1])
            rt1i = FF(sig[b * 6 + 2], sig[b * 6 + 3])
            rt2r = FF(sig[b * 6 + 4], sig[b * 6 + 5])
            # v1L/v2L/v3L of the glue's shifted-column formula (rt2i=-rt1i)
            sv = ff.add(ff.add(ff.abs_(ff.sub(h11, rt2r)), ff.abs_(rt1i)),
                        ff.abs_(h21))
            svs = ff.where(ff.eq0(sv), ff.ff(one_s), sv)
            h21s = ff.div(h21, svs)
            v1 = ff.add(ff.mul(h21s, h12),
                        ff.mul(ff.sub(h11, rt1r),
                               ff.div(ff.sub(h11, rt2r), svs)))
            v1 = ff.add(v1, ff.mul(rt1i, ff.div(rt1i, svs)))
            v2 = ff.mul(h21s,
                        ff.sub(ff.sub(ff.add(h11, h22), rt1r), rt2r))
            v3 = ff.mul(h21s, h32)
            sn = ff.add(ff.add(ff.abs_(v1), ff.abs_(v2)), ff.abs_(v3))
            sns = ff.where(ff.eq0(sn), ff.ff(one_s), sn)
            v1 = ff.div(v1, sns)
            v2 = ff.div(v2, sns)
            v3 = ff.div(v3, sns)
            return (v1.hi, v2.hi, v3.hi, v1.lo, v2.lo, v3.lo)

        def step(kk, _):
            ks, acts, firsts, nr3s = [], [], [], []
            for b in range(NB):
                kb = kk - jnp.int32(b * GAP)
                inr = (kb >= m) & (kb <= i - 1)
                act = inr & (jnp.int32(b) < nbact)
                kc = jnp.maximum(m, jnp.minimum(kb, i - 1))
                ks.append(kc)
                acts.append(act)
                firsts.append(kb == m)
                nr3s.append((i - kc + 1) >= 3)

            # ---- bulge creation / continuation at H[0] ---------------
            rows0, cols0, vks = [], [], []
            for b in range(NB):
                r0 = _read_rows(Chi, Clo, 0, ks[b], 3)
                c0 = _lane_extract(r0, ks[b] - 1)
                rows0.append(r0)
                cols0.append(c0)
            for b in range(NB):
                if b == 0:
                    v6 = v0_glue
                else:
                    v6 = lax.cond(firsts[b] & acts[b],
                                  lambda b=b: _lead_v0(b),
                                  lambda: (zero_s,) * 6)
                z3 = jnp.where(nr3s[b], one_s, zero_s)
                c0 = cols0[b]
                vh = jnp.stack([jnp.where(firsts[b], v6[0], c0.hi[0]),
                                jnp.where(firsts[b], v6[1], c0.hi[1]),
                                jnp.where(firsts[b], v6[2], c0.hi[2]) * z3])
                vl = jnp.stack([jnp.where(firsts[b], v6[3], c0.lo[0]),
                                jnp.where(firsts[b], v6[4], c0.lo[1]),
                                jnp.where(firsts[b], v6[5], c0.lo[2]) * z3])
                vks.append(FF(vh, vl))
            x0 = FF(jnp.stack([vks[b].hi[0] for b in range(NB)]),
                    jnp.stack([vks[b].lo[0] for b in range(NB)]))
            x1 = FF(jnp.stack([vks[b].hi[1] for b in range(NB)]),
                    jnp.stack([vks[b].lo[1] for b in range(NB)]))
            x2 = FF(jnp.stack([vks[b].hi[2] for b in range(NB)]),
                    jnp.stack([vks[b].lo[2] for b in range(NB)]))
            M3, betab = refl3_fused_flat(x0, x1, x2)
            for b in range(NB):
                # re-read the rows: for p == 1 the leading bulges' band
                # applies (earlier in this loop) target THIS factor and
                # touch these rows' lanes; the pre-read above is only for
                # the generation column (lane ks[b]-1, which no same-tick
                # transform of another bulge reaches)
                rC = _matmul3_flat_b(
                    M3, b, _read_rows(Chi, Clo, 0, ks[b], 3))
                keep3 = ff.where(ks[b] < i - 1, ff.zeros(()),
                                 FF(cols0[b].hi[2], cols0[b].lo[2]))
                newc = FF(jnp.stack([betab.hi[b], zero_s, keep3.hi]),
                          jnp.stack([betab.lo[b], zero_s, keep3.lo]))
                rC = _lane_force(rC, ks[b] - 1, newc, ~firsts[b])

                @pl.when(acts[b])
                def _do(b=b, rC=rC):
                    _write_rows(Chi, Clo, 0, ks[b], rC)
                    _band_col_apply_flat_b(Chi, Clo, p - 1, ks[b], M3, b,
                                           3, N, lowext=(NB - 1) * GAP)
                    R0[0, ks[b], b * 18:(b + 1) * 18] = _flat_mat_b(M3, b)

            # ---- factor re-triangularization loop --------------------
            def fac(t, _):
                f = jnp.int32(p - 1) - t
                rowsf, colsf = [], []
                for b in range(NB):
                    rf = _read_rows(Chi, Clo, f, ks[b], 3)
                    colv = _lane_extract(rf, ks[b])
                    rowsf.append(rf)
                    colsf.append(colv)
                # NO jnp.stack of bool scalars: Mosaic dies on the i1
                # vreg bitcast ("Invalid vector register cast"); stack
                # f32 0/1 selects and re-derive the bool vector by
                # comparison (comparison-born masks lower fine)
                z3v = jnp.stack([jnp.where(nr3s[b], one_s, zero_s)
                                 for b in range(NB)])
                nr3v = z3v > jnp.float32(0.5)
                x0 = FF(jnp.stack([colsf[b].hi[0] for b in range(NB)]),
                        jnp.stack([colsf[b].lo[0] for b in range(NB)]))
                x1 = FF(jnp.stack([colsf[b].hi[1] for b in range(NB)]),
                        jnp.stack([colsf[b].lo[1] for b in range(NB)]))
                x2 = FF(jnp.stack([colsf[b].hi[2] for b in range(NB)]) * z3v,
                        jnp.stack([colsf[b].lo[2] for b in range(NB)]) * z3v)
                M3b, beta2b = refl3_fused_flat(x0, x1, x2)
                rows3s, xcs = [], []
                for b in range(NB):
                    rows3 = _matmul3_flat_b(M3b, b, rowsf[b])
                    r12 = FF(rows3.hi[1:], rows3.lo[1:])
                    xc = _lane_extract(r12, ks[b] + 1)
                    rows3s.append(rows3)
                    xcs.append(xc)
                y0 = FF(jnp.stack([xcs[b].hi[0] for b in range(NB)]),
                        jnp.stack([xcs[b].lo[0] for b in range(NB)]))
                y1 = FF(jnp.stack([xcs[b].hi[1] for b in range(NB)]),
                        jnp.stack([xcs[b].lo[1] for b in range(NB)]))
                M2, betam2 = refl2_fused_flat(y0, y1, active=nr3v)
                Fm = fuse32b_flat(M3b, M2)
                for b in range(NB):
                    rows3 = rows3s[b]
                    r12 = FF(rows3.hi[1:], rows3.lo[1:])
                    rows12 = _matmul2_flat_b(M2, b, r12)
                    rC = FF(jnp.concatenate([rows3.hi[:1], rows12.hi]),
                            jnp.concatenate([rows3.lo[:1], rows12.lo]))
                    newcf = FF(jnp.stack([beta2b.hi[b], zero_s, zero_s]),
                               jnp.stack([beta2b.lo[b], zero_s, zero_s]))
                    rC = _lane_force(rC, ks[b], newcf, True)
                    lane = _lane_iota(rC.hi.shape)
                    row_i = lax.broadcasted_iota(jnp.int32, rC.hi.shape, 0)
                    m2msk = (lane == ks[b] + 1) & (row_i >= 1) & nr3s[b]
                    newc2 = FF(jnp.stack([zero_s, betam2.hi[b], zero_s]),
                               jnp.stack([zero_s, betam2.lo[b], zero_s]))
                    rC = FF(jnp.where(m2msk, newc2.hi[:, None], rC.hi),
                            jnp.where(m2msk, newc2.lo[:, None], rC.lo))

                    @pl.when(acts[b])
                    def _dof(b=b, rC=rC, f=f):
                        _write_rows(Chi, Clo, f, ks[b], rC)
                        _band_col_apply_flat_b(Chi, Clo, f - 1, ks[b],
                                               Fm, b, 3, N,
                                               lowext=(NB - 1) * GAP)
                        R0[f, ks[b], b * 18:(b + 1) * 18] = \
                            _flat_mat_b(Fm, b)
                return jnp.int32(0)

            if p > 1:
                lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), fac,
                              jnp.int32(0))
            return jnp.int32(0)

        hi_tick = i + (nbact - 1) * jnp.int32(GAP)
        lax.fori_loop(m, hi_tick, step, jnp.int32(0))

    return kernel


def _make_left_kernel(p: int, N: int, hbm_inputs: bool = False,
                      NB: int = 1, mode: str = "step",
                      hbm_ok: bool = False):
    """Kernel B0: apply the logged left chains F^T to H's rows, batched
    over the p factors (one (p, 16, N) slab RMW + 3-row transform per
    step — outside kernel A's sequential factor chain).

    The H[0] bulge step never touches the window-boundary subdiagonal
    column m-1 (the reference's rowsk lo=k device): lane m-1 of factor 0
    is restored at step kk == m.
    """

    def kernel(scal, Hhi, Hlo, R0, oHhi, oHlo, *sems):
        m = scal[0]
        i = scal[1]
        on = scal[2]
        if hbm_inputs:
            c1 = pltpu.make_async_copy(Hhi, oHhi, sems[0])
            c2 = pltpu.make_async_copy(Hlo, oHlo, sems[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
        else:
            oHhi[:] = Hhi[:]
            oHlo[:] = Hlo[:]

        def step(kk, _, b=0):
            v = R0[:, pl.ds(kk, 1), :]
            M = FF(v[:, 0, b * 18:b * 18 + 9],
                   v[:, 0, b * 18 + 9:b * 18 + 18])

            def el(X, s, r):
                q = s * 3 + r
                return X[:, q:q + 1]

            lanes = oHhi.shape[-1]
            if lanes <= 128:
                rows = FF(oHhi[:, pl.ds(kk, 3), :], oHlo[:, pl.ds(kk, 3), :])
                rs = [FF(rows.hi[:, t, :], rows.lo[:, t, :])
                      for t in range(3)]
            else:
                kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
                o = kk - kk8
                bh = pltpu.roll(oHhi[:, pl.ds(kk8, 16), :], -o, 1)
                bl = pltpu.roll(oHlo[:, pl.ds(kk8, 16), :], -o, 1)
                rs = [FF(bh[:, t, :], bl[:, t, :]) for t in range(3)]
            outs = []
            for r in range(3):  # out_r = sum_s F[s, r] rows[s]  (F^T @)
                acc = ff.mul(FF(el(M.hi, 0, r), el(M.lo, 0, r)), rs[0])
                for t in range(1, 3):
                    acc = ff.add(acc, ff.mul(
                        FF(el(M.hi, t, r), el(M.lo, t, r)), rs[t]))
                outs.append(acc)
            # factor-0 boundary-column restore at the window head
            lane = _lane_iota(outs[0].hi.shape, 1)
            fct = lax.broadcasted_iota(jnp.int32, outs[0].hi.shape, 0)
            keep = (lane == kk - 1) & (kk == m) & (fct == 0)
            outs = [FF(jnp.where(keep, rs[t].hi, outs[t].hi),
                       jnp.where(keep, rs[t].lo, outs[t].lo))
                    for t in range(3)]
            new = ff.stack(outs, 1)
            if lanes <= 128:
                oHhi[:, pl.ds(kk, 3), :] = new.hi
                oHlo[:, pl.ds(kk, 3), :] = new.lo
            else:
                bh = jnp.concatenate([new.hi, bh[:, 3:, :]], axis=1)
                bl = jnp.concatenate([new.lo, bl[:, 3:, :]], axis=1)
                oHhi[:, pl.ds(kk8, 16), :] = pltpu.roll(bh, o, 1)
                oHlo[:, pl.ds(kk8, 16), :] = pltpu.roll(bl, o, 1)
            return jnp.int32(0)

        def group(t, _):
            # same aligned-slab group walk as kernel B; F^T chains hit
            # rows kk..kk+2 of every factor with the factor's OWN logs
            b = pl.multiple_of(g0 + t * jnp.int32(8), 8)
            v = R0[:, pl.ds(b, 8), :]  # (p, 8, 18)
            Mjs = [FF(v[:, j, 0:9], v[:, j, 9:18]) for j in range(8)]
            g = _compose_group8(Mjs, m, i, b)
            # keep_lane reproduces the per-step window-head restore: the
            # group's steps only read slab rows >= m, which hold the
            # boundary-column zeros at lane m-1 of factor 0
            _banded_group_rmw(oHhi, oHlo, b, g, keep_lane=(m - 1, 0))
            return jnp.int32(0)

        if NB == 1 and N > 128 and mode == "banded" \
                and (not hbm_inputs or hbm_ok):
            g0 = pl.multiple_of(m & jnp.int32(-8), 8)
            ngroups = (i - g0 + jnp.int32(7)) >> 3
            lax.fori_loop(jnp.int32(0), ngroups, group, jnp.int32(0))
        else:
            for b in range(NB):
                @pl.when(jnp.int32(b) < on)
                def _run(b=b):
                    lax.fori_loop(m, i, functools.partial(step, b=b),
                                  jnp.int32(0))

    return kernel


def _el9m(M: FF, s: int, r: int) -> FF:
    """Static slice into a row-major flat (p, 9) transform log."""
    q = s * 3 + r
    return FF(M.hi[:, q:q + 1], M.lo[:, q:q + 1])


def _compose_group8(Mjs, m, i, b):
    """Compose a group's 8 step transforms into banded operator rows.

    Returns rows 0..9 of G = E7^T ... E0^T (each E_j = M_j embedded at
    slab rows j..j+2; rows 10..15 of G are untouched identities) as FF
    (p, 16) lane vectors.  Built in ds with the SAME 3-term accumulation
    as the per-step apply; a step outside [m, i-1] composes as the exact
    identity.  Row t of G depends on columns 0..t+2 only (each E_j mixes
    rows j..j+2), so the banded apply is a ~72-term expansion with no
    serial j chain.  Equally backward-stable as the sequential
    in-register chain but NOT bitwise (summation order differs).
    """
    pn = Mjs[0].hi.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (pn, 16), 1)
    zeros = jnp.zeros((pn, 16), jnp.float32)
    g = [FF((lane == t).astype(jnp.float32), zeros) for t in range(10)]
    for j in range(8):
        kk = b + jnp.int32(j)
        act = (kk >= m) & (kk <= i - 1)
        M = Mjs[j]
        rs = [g[j], g[j + 1], g[j + 2]]
        for r in range(3):
            acc = ff.mul(_el9m(M, 0, r), rs[0])
            for s in range(1, 3):
                acc = ff.add(acc, ff.mul(_el9m(M, s, r), rs[s]))
            g[j + r] = FF(jnp.where(act, acc.hi, rs[r].hi),
                          jnp.where(act, acc.lo, rs[r].lo))
    return g


def _banded_rows(rows, g):
    """out_r = sum_s g[r][s] * rows[s] for the 10 affected slab rows.

    All outputs are independent (the banded expansion removed the
    sequential step chain); row r only reads rows 0..r+2 (band of G).
    """
    def _gel(gr, s):
        return FF(gr.hi[:, s:s + 1], gr.lo[:, s:s + 1])

    outs = []
    for r in range(10):
        smax = min(r + 2, 9)
        acc = ff.mul(_gel(g[r], 0), rows[0])
        for s in range(1, smax + 1):
            acc = ff.add(acc, ff.mul(_gel(g[r], s), rows[s]))
        outs.append(acc)
    return outs


def _banded_group_rmw(hi_ref, lo_ref, b, g, hi_lane=None, keep_lane=None):
    """One aligned 16-row slab RMW applying composed group rows.

    ``hi_lane``: only lanes <= hi_lane updated (kernel B's H^T row-bound
    device).  ``keep_lane``: (lane_index, factor_index) whose lane keeps
    its input rows in that factor — kernel B0's window-head boundary
    column m-1 of factor 0.  Equivalent to the per-step restore: the
    composed steps only read slab rows >= m at that lane, which hold the
    window-boundary zeros, so keeping the inputs reproduces the
    sequential keep-at-step-m result exactly (rows above the window are
    identity rows of G either way).
    """
    bh = hi_ref[:, pl.ds(b, 16), :]
    bl = lo_ref[:, pl.ds(b, 16), :]
    rows = [FF(bh[:, t, :], bl[:, t, :]) for t in range(10)]
    outs = _banded_rows(rows, g)
    if hi_lane is not None:
        lane = _lane_iota(outs[0].hi.shape, 1)
        outs = [FF(jnp.where(lane <= hi_lane, outs[r].hi, rows[r].hi),
                   jnp.where(lane <= hi_lane, outs[r].lo, rows[r].lo))
                for r in range(10)]
    if keep_lane is not None:
        kl, kf = keep_lane
        lane = _lane_iota(outs[0].hi.shape, 1)
        fct = lax.broadcasted_iota(jnp.int32, outs[0].hi.shape, 0)
        keep = (lane == kl) & (fct == kf)
        outs = [FF(jnp.where(keep, rows[r].hi, outs[r].hi),
                   jnp.where(keep, rows[r].lo, outs[r].lo))
                for r in range(10)]
    new_hi = jnp.stack([o.hi for o in outs]
                       + [bh[:, t, :] for t in range(10, 16)], 1)
    new_lo = jnp.stack([o.lo for o in outs]
                       + [bl[:, t, :] for t in range(10, 16)], 1)
    hi_ref[:, pl.ds(b, 16), :] = new_hi
    lo_ref[:, pl.ds(b, 16), :] = new_lo


def _make_apply_kernel(p: int, N: int, want_z: bool,
                       hbm_inputs: bool = False, NB: int = 1,
                       mode: str = "step", hbm_ok: bool = False):
    """Kernel B: apply logged right-transform chains to H^T (and Z^T).

    Target factor g receives source ((g+1) mod p)'s transforms (the chase
    updates H[f-1]'s columns with factor f's reflectors; H[p-1] with the
    H[0] bulge reflector); Z[f] receives its own factor's transforms.
    A column update cols <- cols @ M becomes rows <- M^T @ rows on the
    transposed storage.
    """

    def _load_logs(R, kk, n2, b=0):
        # returns ROW-MAJOR FLAT (p, n2) hi/lo pairs (no reshape: Mosaic
        # cannot shape-cast); _apply indexes elements by s*k+r
        v = R[:, pl.ds(kk, 1), :]  # (p, 1, NB*2*n2)
        hi = v[:, 0, b * 2 * n2:b * 2 * n2 + n2]
        lo = v[:, 0, b * 2 * n2 + n2:b * 2 * n2 + 2 * n2]
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
        elif _ROLL_ROWS:
            # aligned 16-row block rolled by the in-block offset: rows of
            # interest at static offsets (Mosaic requires provably
            # 8-aligned dynamic sublane starts once N > 128)
            kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
            o = kk - kk8
            bh = pltpu.roll(hi_ref[:, pl.ds(kk8, 16), :], -o, 1)
            bl = pltpu.roll(lo_ref[:, pl.ds(kk8, 16), :], -o, 1)
            rs = [FF(bh[:, s, :], bl[:, s, :]) for s in range(k)]
        else:
            kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
            o = kk - kk8
            bh = hi_ref[:, pl.ds(kk8, 16), :]
            bl = lo_ref[:, pl.ds(kk8, 16), :]
            sub = lax.broadcasted_iota(jnp.int32, bh.shape, 1)
            zf = jnp.float32(0.0)
            rs = [FF(jnp.sum(jnp.where(sub == o + s, bh, zf), axis=1),
                     jnp.sum(jnp.where(sub == o + s, bl, zf), axis=1))
                  for s in range(k)]
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
        new = ff.stack(outs, 1)
        if lanes <= 128:
            hi_ref[:, pl.ds(kk, k), :] = new.hi
            lo_ref[:, pl.ds(kk, k), :] = new.lo
        elif _ROLL_ROWS:
            bh = jnp.concatenate([new.hi, bh[:, k:, :]], axis=1)
            bl = jnp.concatenate([new.lo, bl[:, k:, :]], axis=1)
            hi_ref[:, pl.ds(kk8, 16), :] = pltpu.roll(bh, o, 1)
            lo_ref[:, pl.ds(kk8, 16), :] = pltpu.roll(bl, o, 1)
        else:
            for s in range(k):
                msk = sub == o + s
                bh = jnp.where(msk, outs[s].hi[:, None, :], bh)
                bl = jnp.where(msk, outs[s].lo[:, None, :], bl)
            hi_ref[:, pl.ds(kk8, 16), :] = bh
            lo_ref[:, pl.ds(kk8, 16), :] = bl

    def _el9(M: FF, s: int, r: int) -> FF:
        # static slice into a row-major flat (p, 9) log (matches _apply's
        # _el expression tree: bitwise-identical accumulation)
        q = s * 3 + r
        return FF(M.hi[:, q:q + 1], M.lo[:, q:q + 1])

    def _group_apply(hi_ref, lo_ref, b, Mjs, m, i, hi_lane=None):
        """8 consecutive steps' transforms on ONE aligned 16-row slab.

        Step kk = b + j (j = 0..7) applies Mjs[j]^T to slab rows
        j..j+2 IN REGISTERS, exactly the order the per-step path
        executes them — consecutive steps overlap rows (k..k+2 vs
        k+1..k+3), and the sequential in-register chain produces the
        same values as the write-then-reread chain.  Inactive steps
        (kk outside [m, i-1]) keep the rows unchanged.  One slab
        read + one write per 8 steps replaces 8 rolled RMWs — kernel B
        is the sweep's dominant per-step device cost (probe_kernels:
        0.34 ms/step of 0.47 at p=16, n=256)."""
        bh = hi_ref[:, pl.ds(b, 16), :]
        bl = lo_ref[:, pl.ds(b, 16), :]
        rows = [FF(bh[:, t, :], bl[:, t, :]) for t in range(16)]
        for j in range(8):
            kk = b + jnp.int32(j)
            act = (kk >= m) & (kk <= i - 1)
            M = Mjs[j]
            rs = [rows[j], rows[j + 1], rows[j + 2]]
            outs = []
            for r in range(3):
                acc = ff.mul(_el9(M, 0, r), rs[0])
                for s in range(1, 3):
                    acc = ff.add(acc, ff.mul(_el9(M, s, r), rs[s]))
                outs.append(acc)
            if hi_lane is not None:
                lane = _lane_iota(outs[0].hi.shape, 1)
                outs = [FF(jnp.where(lane <= hi_lane, outs[s].hi,
                                     rs[s].hi),
                           jnp.where(lane <= hi_lane, outs[s].lo,
                                     rs[s].lo))
                        for s in range(3)]
            for s in range(3):
                rows[j + s] = FF(jnp.where(act, outs[s].hi, rs[s].hi),
                                 jnp.where(act, outs[s].lo, rs[s].lo))
        hi_ref[:, pl.ds(b, 16), :] = jnp.stack([r.hi for r in rows], 1)
        lo_ref[:, pl.ds(b, 16), :] = jnp.stack([r.lo for r in rows], 1)

    def kernel(scal, HThi, HTlo, ZThi, ZTlo, R0,
               oHThi, oHTlo, oZThi, oZTlo, *sems):
        m = scal[0]
        i = scal[1]
        on = scal[2]
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

        def step(kk, _, b=0):
            M0 = _load_logs(R0, kk, 9, b)
            _apply(oHThi, oHTlo, kk, _roll1(M0), hi_lane=i)
            if want_z:
                _apply(oZThi, oZTlo, kk, M0)
            return jnp.int32(0)

        def group(t, _):
            # slab [b, b+16) is 8-aligned (g0 is) and in-bounds: steps
            # reach row kk+2 <= b+9, and the wrapper pads N >= n+16
            b = pl.multiple_of(g0 + t * jnp.int32(8), 8)
            v = R0[:, pl.ds(b, 8), :]  # (p, 8, 18)
            Mjs = [FF(v[:, j, 0:9], v[:, j, 9:18]) for j in range(8)]
            if mode == "banded":
                # composition commutes with the factor roll (both are
                # per-factor): build G once, roll its rows for H^T
                g = _compose_group8(Mjs, m, i, b)
                _banded_group_rmw(oHThi, oHTlo, b,
                                  [_roll1(x) for x in g], hi_lane=i)
                if want_z:
                    _banded_group_rmw(oZThi, oZTlo, b, g)
            else:
                _group_apply(oHThi, oHTlo, b, [_roll1(M) for M in Mjs],
                             m, i, hi_lane=i)
                if want_z:
                    _group_apply(oZThi, oZTlo, b, Mjs, m, i)
            return jnp.int32(0)

        # grouped path when every array is VMEM-resident; with hbm_inputs
        # (headline N=528 p=16) the 4 output buffers plus the group's
        # in-register live rows need ~119.15M of scoped vmem — beyond the
        # default limit, so _apply_call raises vmem_limit_bytes to 127 MiB
        # for that combination, gated on hbm_ok
        if NB == 1 and N > 128 and mode != "step" \
                and (not hbm_inputs or hbm_ok):
            g0 = pl.multiple_of(m & jnp.int32(-8), 8)
            ngroups = (i - g0 + jnp.int32(7)) >> 3
            lax.fori_loop(jnp.int32(0), ngroups, group, jnp.int32(0))
        else:
            for b in range(NB):
                @pl.when(jnp.int32(b) < on)
                def _run(b=b):
                    lax.fori_loop(m, i, functools.partial(step, b=b),
                                  jnp.int32(0))

    def kernel_noz(scal, HThi, HTlo, R0, oHThi, oHTlo, *sems):
        kernel(scal, HThi, HTlo, None, None, R0, oHThi, oHTlo, None,
               None, *sems)

    return kernel if want_z else kernel_noz


def _vmem_bytes(p, N, n_arrays):
    lanes = -(-N // 128) * 128
    rows = -(-N // 8) * 8
    return n_arrays * p * rows * lanes * 4


@functools.lru_cache(maxsize=32)
def _sweep_call(p: int, N: int, interpret: bool):
    # generation-only kernel: H inputs + 2 C scratch buffers; past ~96 MiB
    # the H inputs move to HBM and are DMA'd into C
    hbm_inputs = _vmem_bytes(p, N, 4) > 96 * (1 << 20) and not interpret
    kern = _make_sweep_kernel(p, N, hbm_inputs)
    n_res = 2 if hbm_inputs else 4
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 40 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.VMEM((p, N, N), jnp.float32),
               pltpu.VMEM((p, N, N), jnp.float32)]
    if hbm_inputs:
        scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((p, N, 18), jnp.float32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=h_space),
                  pl.BlockSpec(memory_space=h_space)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=32)
def _sweep_call_mb(p: int, N: int, NB: int, GAP: int, interpret: bool):
    hbm_inputs = _vmem_bytes(p, N, 4) > 96 * (1 << 20) and not interpret
    kern = _make_sweep_kernel_mb(p, N, NB, GAP, hbm_inputs)
    n_res = 2 if hbm_inputs else 4
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * NB * 40 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.VMEM((p, N, N), jnp.float32),
               pltpu.VMEM((p, N, N), jnp.float32)]
    if hbm_inputs:
        scratch += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((p, N, NB * 18), jnp.float32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [pl.BlockSpec(memory_space=h_space)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=32)
def _left_call(p: int, N: int, interpret: bool, NB: int = 1,
               mode: str = "step", hbm_ok: bool = False):
    hbm_inputs = _vmem_bytes(p, N, 4) > 96 * (1 << 20) and not interpret
    kern = _make_left_kernel(p, N, hbm_inputs, NB, mode, hbm_ok)
    n_res = 2 if hbm_inputs else 4
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 40 * 4 + (8 << 20)
    if NB == 1 and N > 128 and mode == "banded" \
            and (not hbm_inputs or hbm_ok):
        # banded group live rows + compiler stack: measured scoped need
        # 46.44M at p=16 N=272 (VMEM-resident) and 111.83M at p=16 N=528
        # (HBM-staged) — ask for (nearly) the whole 128 MiB core VMEM;
        # these kernels have no double-buffered DMA to starve
        vmem = max(vmem, 127 * (1 << 20))
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA] \
        if hbm_inputs else []
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((p, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((p, N, N), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=h_space),
                  pl.BlockSpec(memory_space=h_space),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=scratch,
        input_output_aliases={} if hbm_inputs else {1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=32)
def _apply_call(p: int, N: int, want_z: bool, interpret: bool, NB: int = 1,
                mode: str = "step", hbm_ok: bool = False):
    n_out = 4 if want_z else 2
    n_arr = 2 * n_out
    hbm_inputs = _vmem_bytes(p, N, n_arr) > 96 * (1 << 20) and not interpret
    kern = _make_apply_kernel(p, N, want_z, hbm_inputs, NB, mode, hbm_ok)
    n_res = n_out if hbm_inputs else n_arr
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 40 * 4 + (8 << 20)
    if NB == 1 and N > 128 and mode != "step" \
            and (not hbm_inputs or hbm_ok) \
            and (mode == "banded" or hbm_inputs):
        # grouped/banded paths: the group's live rows on top of the VMEM
        # outputs measured 119.15M of scoped vmem at N=528 p=16 (HBM-
        # staged); the banded composition also overruns the proportional
        # limit at VMEM-resident sizes (B0 measured +11.6M at p=16 N=272)
        # — ask for (nearly) the whole 128 MiB core VMEM
        vmem = max(vmem, 127 * (1 << 20))
    big_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.SemaphoreType.DMA] * n_out if hbm_inputs else []
    call = pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                        for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=big_space)] * n_out
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
    return call


def chase_sweep_ff(H: FF, ZT, m, i, v0: FF, *, want_z: bool,
                   interpret: bool = False, mode: str = None,
                   hbm_grouped: bool = None):
    """One full double-shift QR sweep over the window [m, i] in ds precision.

    Args:
      H: (p, N, N) FF stack (N = n + 1 ghost-padded), H[0] Hessenberg.
      ZT: (p, N, N) FF stack of TRANSPOSED Schur vector factors (or None).
      m, i: traced int32 window bounds (sweep chases k = m..i-1).
      v0: FF (3,) normalized first shifted column.
      want_z: static; update ZT.
      interpret: run kernels through the Pallas interpreter (CPU tests).
      mode: kernel-B application mode ("step"/"seq"/"banded"; see the
        module note) — sourced from AlgoConfig.sweep_mode by the cores;
        None falls back to the PSD_GROUP_MODE env default.
      hbm_grouped: allow the grouped/banded paths when inputs are
        HBM-staged (AlgoConfig.sweep_hbm_grouped; None = env default).

    Returns (H, ZT) updated.  Structural sub-triangular entries are exact
    zeros on output.
    """
    if mode is None:
        mode = _GROUP_MODE
    if hbm_grouped is None:
        hbm_grouped = _GROUP_HBM
    p, N, _ = H.hi.shape
    scal = jnp.stack([jnp.asarray(m, jnp.int32), jnp.asarray(i, jnp.int32),
                      jnp.int32(1)])
    v0f = jnp.concatenate([v0.hi, v0.lo]).astype(jnp.float32)

    # kernels are traced WITHOUT EFT barriers (Mosaic cannot lower them and
    # provably does not need them); the surrounding XLA glue keeps them
    with ff.no_barriers():
        (R0,) = _sweep_call(p, N, interpret)(scal, v0f, H.hi, H.lo)
        Hhi, Hlo = _left_call(p, N, interpret, 1, mode, hbm_grouped)(
            scal, H.hi, H.lo, R0)

    HThi = jnp.swapaxes(Hhi, 1, 2)
    HTlo = jnp.swapaxes(Hlo, 1, 2)
    if want_z:
        with ff.no_barriers():
            outs = _apply_call(p, N, True, interpret, 1, mode, hbm_grouped)(
                scal, HThi, HTlo, ZT.hi, ZT.lo, R0)
        HThi, HTlo, ZThi, ZTlo = outs
        ZT = FF(ZThi, ZTlo)
    else:
        with ff.no_barriers():
            HThi, HTlo = _apply_call(p, N, False, interpret, 1, mode,
                                     hbm_grouped)(scal, HThi, HTlo, R0)
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


def chase_sweep_ff_mb(H: FF, ZT, m, i, v0: FF, sig, scs, nbact, *,
                      NB: int, GAP: int = 3, want_z: bool,
                      interpret: bool = False):
    """Multi-bulge double-shift QR sweep: NB bulges chased in one kernel-A
    pass (batched generation chains), logs applied bulge-major.

    Args beyond :func:`chase_sweep_ff`:
      sig: (NB*6,) f32 — per-bulge ds shift pairs
        [rt1r.hi, rt1r.lo, rt1i.hi, rt1i.lo, rt2r.hi, rt2r.lo] in the
        glue's scaled band-product domain (bulge 0's slot is unused: its
        first column arrives pre-computed as ``v0``).
      scs: (p,) f32 — the glue's per-factor power-of-two band scale
        schedule (scs[0] unused), so the in-kernel leading-product shifts
        share the band scale.
      nbact: traced int32 in [1, NB] — bulges actually chased (window-
        size / exceptional-shift clamp).

    Bulge-major application is exact: bulge b's transform at column q
    commutes with every LATER (tick-order) transform of bulges b' < b,
    which sit at columns > q + 2 by the GAP >= 3 spacing.
    """
    p, N, _ = H.hi.shape
    mi = jnp.asarray(m, jnp.int32)
    ii = jnp.asarray(i, jnp.int32)
    nb = jnp.asarray(nbact, jnp.int32)
    scal = jnp.stack([mi, ii, nb])
    v0f = jnp.concatenate([v0.hi, v0.lo]).astype(jnp.float32)

    # kernels B0/B iterate the NB bulge chains INSIDE one launch each
    # (bulge-major; `scal[2]` = active count gates trailing chains), so the
    # full-state copies and launch overhead stay independent of NB
    with ff.no_barriers():
        (R0,) = _sweep_call_mb(p, N, NB, GAP, interpret)(
            scal, v0f, sig, scs, H.hi, H.lo)
        Hhi, Hlo = _left_call(p, N, interpret, NB)(scal, H.hi, H.lo, R0)

    HThi = jnp.swapaxes(Hhi, 1, 2)
    HTlo = jnp.swapaxes(Hlo, 1, 2)
    with ff.no_barriers():
        if want_z:
            HThi, HTlo, ZThi, ZTlo = _apply_call(p, N, True, interpret, NB)(
                scal, HThi, HTlo, ZT.hi, ZT.lo, R0)
            ZT = FF(ZThi, ZTlo)
        else:
            HThi, HTlo = _apply_call(p, N, False, interpret, NB)(
                scal, HThi, HTlo, R0)
    H = FF(jnp.swapaxes(HThi, 1, 2), jnp.swapaxes(HTlo, 1, 2))

    h0 = FF(jnp.triu(H.hi[0], -1), jnp.triu(H.lo[0], -1))
    if p > 1:
        rest = FF(jnp.triu(H.hi[1:]), jnp.triu(H.lo[1:]))
        H = FF(jnp.concatenate([h0.hi[None], rest.hi]),
               jnp.concatenate([h0.lo[None], rest.lo]))
    else:
        H = FF(h0.hi[None], h0.lo[None])
    return H, ZT
