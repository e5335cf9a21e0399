"""Pallas TPU kernels: fused ds split-complex single-shift QZ sweep.

The XLA-glue sweep of `pqz_complex_ff.act_sweep` traces ~30 slab-op
dispatches per (step, factor) into one giant while-body HLO; at p >= 6
the axon REMOTE compile of that graph wedges the worker for 20+ minutes
(three reproducible hangs recorded in BASELINE.md, driver round 2).
These kernels replace the whole sweep with three `pallas_call`s — exactly
the real core's ops/pallas_sweep.py split — which both fixes the compile
blowup (tiny XLA graph + small Mosaic kernels) and removes the us-level
per-dispatch cost of the glue sweep.

Semantics: the single-shift QZ sweep of the reference's complex GPSD
(/root/reference/src/generalized.jl:806-852), identical to
`pqz_complex_ff.act_sweep`'s fori body, reorganized for the TPU memory
model.  Working value = CXF: 4 f32 slabs (re.hi, re.lo, im.hi, im.lo).

* kernel A ("sweep") walks k = m..i-1 once over a VMEM working copy C:
  per step it generates the chase Givens from C (register-carried
  generation fragments — the sequential chain never waits on slab
  write/re-read), maintains C's band (left updates as 2-row slabs,
  right updates band-only on aligned slabs), and LOGS three 2x2
  transforms per (factor, step):
    - L[l, k]: the left rotation hitting H[l] rows k:k+2
      (factor 0: the chase rotation; S+ factor: its re-triangularization
      lmat(cn, sn); S- factor: the incoming carry lmat(c, s)),
    - R[l, k]: the right transform hitting H[l] cols k:k+2
      (factor 0: the ring-closing rmat_adj; S+: the incoming
      rmat_adj(c, s); S-: its own lmat(cn, sn) applied on the right),
    - ZR[l, k]: rmat_adj of the factor's OUTGOING carry (what Z[l] gets).
  S is a static tuple, so the factor ring unrolls with no lax.cond.
* kernel B0 applies the logged L chains to H's rows, batched over the p
  factors (one (p, 16, N) rolled slab RMW per step).  The factor-0
  window-boundary column m-1 is restored at step k == m (the shift
  rotation must not touch the boundary subdiagonal; regen steps
  REPRODUCE the forced (r, 0) column up to ds roundoff).
* kernel B applies the logged R chains to the TRANSPOSED H (a column
  update cols <- cols @ M is rows <- M^T @ rows on H^T; lanes are H's
  rows, bounded by hi_lane = ilast so converged boundary subdiagonals
  stay untouched) and the ZR chains to Z^T.

Deferred-application exactness: identical commuting argument to the real
sweep (ops/pallas_sweep.py) — per step the left rotation of factor l
touches rows k:k+2 only and the right rotation columns k:k+2 only, so
H_final = Lc @ H0 @ Rc by associativity regardless of interleaving.  The
interleaved core's forced structural writes re-emerge to ds roundoff and
are scrubbed by the wrapper's triu masks.  NOTE the full-lane/full-row
application here is REQUIRED (not just harmless): the core's row bounds
(hi=k+2 etc.) skip entries that are zero in the interleaved intermediate
but genuinely nonzero in the commuted Lc@H intermediate.

want_t windowing: the kernels always maintain the full T (the real ds
path does the same); the XLA-glue sweep remains the want_t=False
fast path on CPU.

`interpret=True` runs the kernels through the Pallas interpreter (CPU
test suite); the TPU path compiles via Mosaic.
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

from . import cxff, ff
from .cxff import CXF, conj, givens_cxff, neg
from .ff import FF

if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)


def _lane_iota(shape, dim=1):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _cxs(c: FF) -> CXF:
    """Scalar real FF -> scalar CXF."""
    return CXF(c, ff.zeros(()))


def _lmat_s(c: FF, s: CXF):
    """[[c, s], [-conj(s), c]] as a 2x2 tuple of scalar CXF entries."""
    return ((_cxs(c), s), (neg(conj(s)), _cxs(c)))


def _rmat_adj_s(c: FF, s: CXF):
    """[[c, -s], [conj(s), c]] (the adjoint right action)."""
    return ((_cxs(c), neg(s)), (conj(s), _cxs(c)))


def _flat16(M):
    """16 f32 log lanes from a 2x2 scalar-CXF tuple: row-major entry
    order, component blocks [re.hi(4) | re.lo(4) | im.hi(4) | im.lo(4)]
    (matches kernel B/B0's _log_entry static slicing)."""
    ents = [M[r][c] for r in range(2) for c in range(2)]
    return jnp.stack([e.re.hi for e in ents] + [e.re.lo for e in ents]
                     + [e.im.hi for e in ents] + [e.im.lo for e in ents])


# ---------------------------------------------------------------------------
# 4-component slab access (mirrors pallas_sweep._read_rows/_write_rows:
# Mosaic requires provably 8-aligned dynamic sublane starts once the lane
# dim exceeds one 128-tile, so those sizes go through rolled 16-row blocks)


def _read_rows_cx(refs, f, k, r, N) -> CXF:
    rh, rl, ih, il = refs
    if N <= 128:
        def rd(x):
            return x[f, pl.ds(k, r), :]
        return CXF(FF(rd(rh), rd(rl)), FF(rd(ih), rd(il)))
    k8 = pl.multiple_of(k & jnp.int32(-8), 8)
    o = k - k8

    def rd(x):
        return pltpu.roll(x[f, pl.ds(k8, 16), :], -o, 0)[:r]

    return CXF(FF(rd(rh), rd(rl)), FF(rd(ih), rd(il)))


def _write_rows_cx(refs, f, k, vals: CXF, N):
    r = vals.re.hi.shape[0]
    rh, rl, ih, il = refs
    comps = ((rh, vals.re.hi), (rl, vals.re.lo),
             (ih, vals.im.hi), (il, vals.im.lo))
    if N <= 128:
        for ref, v in comps:
            ref[f, pl.ds(k, r), :] = v
        return
    k8 = pl.multiple_of(k & jnp.int32(-8), 8)
    o = k - k8
    for ref, v in comps:
        b = pltpu.roll(ref[f, pl.ds(k8, 16), :], -o, 0)
        b = jnp.concatenate([v, b[r:]], axis=0)
        ref[f, pl.ds(k8, 16), :] = pltpu.roll(b, o, 0)


def _read_rows_raw_cx(refs, f, k, r) -> CXF:
    rh, rl, ih, il = refs

    def rd(x):
        return x[f, pl.ds(k, r), :]

    return CXF(FF(rd(rh), rd(rl)), FF(rd(ih), rd(il)))


def _write_rows_raw_cx(refs, f, k, vals: CXF):
    r = vals.re.hi.shape[0]
    rh, rl, ih, il = refs
    rh[f, pl.ds(k, r), :] = vals.re.hi
    rl[f, pl.ds(k, r), :] = vals.re.lo
    ih[f, pl.ds(k, r), :] = vals.im.hi
    il[f, pl.ds(k, r), :] = vals.im.lo


def _lane_extract_cx(rows: CXF, j) -> CXF:
    """(r,) CXF column fragment at traced lane j of an (r, N) CXF slab."""
    mask = _lane_iota(rows.re.hi.shape) == j
    z = jnp.float32(0.0)

    def ex(x):
        return jnp.sum(jnp.where(mask, x, z), axis=1)

    return CXF(FF(ex(rows.re.hi), ex(rows.re.lo)),
               FF(ex(rows.im.hi), ex(rows.im.lo)))


def _sub_scalar_cx(acc: CXF, mask) -> CXF:
    """Scalar CXF from a rank-1 CXF via a single-nonzero masked sum."""
    z = jnp.float32(0.0)

    def ex(x):
        return jnp.sum(jnp.where(mask, x, z))

    return CXF(FF(ex(acc.re.hi), ex(acc.re.lo)),
               FF(ex(acc.im.hi), ex(acc.im.lo)))


def _row_of(rows: CXF, t: int) -> CXF:
    return CXF(FF(rows.re.hi[t], rows.re.lo[t]),
               FF(rows.im.hi[t], rows.im.lo[t]))


def _where_cx_m(mask, a: CXF, b: CXF) -> CXF:
    return CXF(FF(jnp.where(mask, a.re.hi, b.re.hi),
                  jnp.where(mask, a.re.lo, b.re.lo)),
               FF(jnp.where(mask, a.im.hi, b.im.hi),
                  jnp.where(mask, a.im.lo, b.im.lo)))


# ---------------------------------------------------------------------------
# kernel-A building blocks


def _row2_apply_cx(refs, f, k, M, N, force_lane=None, force_vals=None,
                   force_act=None, gen_lanes=None):
    """C[f][k:k+2, :] <- M @ rows, with optional forced lane / register-
    carried generation extraction from the in-register accumulators.

    ``force_vals``: (v_row0, v_row1) scalar CXF written at lane
    ``force_lane`` when ``force_act``.
    ``gen_lanes``: (j0, j1) traced lanes; returns the NEW row 1 values at
    those lanes as two scalar CXF (the S- generation inputs (f, g)),
    extracted from the accumulators exactly as a slab re-read would
    produce them.
    """
    rows = _read_rows_cx(refs, f, k, 2, N)
    r0 = _row_of(rows, 0)
    r1 = _row_of(rows, 1)
    n0 = cxff.add(cxff.mul(M[0][0], r0), cxff.mul(M[0][1], r1))
    n1 = cxff.add(cxff.mul(M[1][0], r0), cxff.mul(M[1][1], r1))
    gens = None
    if gen_lanes is not None:
        li = lax.broadcasted_iota(jnp.int32, n1.re.hi.shape, 0)
        gens = (_sub_scalar_cx(n1, li == gen_lanes[0]),
                _sub_scalar_cx(n1, li == gen_lanes[1]))
    if force_lane is not None:
        li = lax.broadcasted_iota(jnp.int32, n0.re.hi.shape, 0)
        fm = (li == force_lane) & force_act

        def frc(nv, fv):
            return CXF(FF(jnp.where(fm, fv.re.hi, nv.re.hi),
                          jnp.where(fm, fv.re.lo, nv.re.lo)),
                       FF(jnp.where(fm, fv.im.hi, nv.im.hi),
                          jnp.where(fm, fv.im.lo, nv.im.lo)))

        n0 = frc(n0, force_vals[0])
        n1 = frc(n1, force_vals[1])
    new = CXF(FF(jnp.stack([n0.re.hi, n1.re.hi]),
                 jnp.stack([n0.re.lo, n1.re.lo])),
              FF(jnp.stack([n0.im.hi, n1.im.hi]),
                 jnp.stack([n0.im.lo, n1.im.lo])))
    _write_rows_cx(refs, f, k, new, N)
    return gens


def _band_col_apply_cx(refs, g, k, M, N, gen_row0=None,
                       force_row=None, force_vals=None):
    """C[g][band, k:k+2] <- band @ M on an aligned row slab.

    Maintains the working copy's band under a right transform; only the
    rows a later generation can read need to be current (values at cols
    k:k+2 live at rows <= k+2; the 8/16-row slab covering k-2..k+5 is the
    same device as pallas_sweep._band_col_apply).

    ``gen_row0``: also return the NEW column k values at rows gen_row0,
    gen_row0+1 as two scalar CXF (register-carried generation inputs).
    ``force_row`` / ``force_vals``: overwrite global row ``force_row`` of
    the two new columns with the given scalar CXF pair (the S- factors'
    structural row force).
    """
    if N <= 128:
        W = min(8, N)
        rb = jnp.maximum(jnp.int32(0), jnp.minimum(k - 2, jnp.int32(N - W)))
    else:
        W = 16
        rb = pl.multiple_of(
            jnp.maximum(jnp.int32(0), k - 2) & jnp.int32(-8), 8)
    slab = _read_rows_raw_cx(refs, g, rb, W)
    cols = [_lane_extract_cx(slab, k + c) for c in range(2)]
    it = _lane_iota(slab.re.hi.shape)
    comps = [slab.re.hi, slab.re.lo, slab.im.hi, slab.im.lo]
    gens = None
    for c in range(2):
        acc = cxff.add(cxff.mul(cols[0], M[0][c]), cxff.mul(cols[1], M[1][c]))
        sub = lax.broadcasted_iota(jnp.int32, acc.re.hi.shape, 0)
        if gen_row0 is not None and c == 0:
            gens = (_sub_scalar_cx(acc, sub == gen_row0 - rb),
                    _sub_scalar_cx(acc, sub == gen_row0 + 1 - rb))
        if force_row is not None:
            fm = sub == force_row - rb
            fv = force_vals[c]
            acc = CXF(FF(jnp.where(fm, fv.re.hi, acc.re.hi),
                         jnp.where(fm, fv.re.lo, acc.re.lo)),
                      FF(jnp.where(fm, fv.im.hi, acc.im.hi),
                         jnp.where(fm, fv.im.lo, acc.im.lo)))
        mask = it == (k + c)
        avs = [acc.re.hi, acc.re.lo, acc.im.hi, acc.im.lo]
        comps = [jnp.where(mask, a[:, None], b) for a, b in zip(avs, comps)]
    _write_rows_raw_cx(refs, g, rb, CXF(FF(comps[0], comps[1]),
                                        FF(comps[2], comps[3])))
    return gens


# ---------------------------------------------------------------------------
# kernel A: generation + working-copy maintenance + transform logging


def _make_qz_sweep_kernel(p: int, N: int, S: Tuple[bool, ...],
                          hbm_inputs: bool = False):
    def kernel(scal, cs0, Hrh, Hrl, Hih, Hil, R0, Crh, Crl, Cih, Cil,
               *sems):
        m = scal[0]
        i = scal[1]
        if hbm_inputs:
            cps = [pltpu.make_async_copy(a, b, s) for a, b, s in
                   zip((Hrh, Hrl, Hih, Hil), (Crh, Crl, Cih, Cil), sems)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        else:
            Crh[:] = Hrh[:]
            Crl[:] = Hrl[:]
            Cih[:] = Hih[:]
            Cil[:] = Hil[:]
        refs = (Crh, Crl, Cih, Cil)
        # shift rotation via SMEM scalars (c real FF, s CXF)
        c0 = FF(cs0[0], cs0[1])
        s0 = CXF(FF(cs0[2], cs0[3]), FF(cs0[4], cs0[5]))
        zscal = cxff.zeros(())

        def step(kk, carry):
            g0, g1 = carry
            first = kk == m
            # factor-0 chase rotation: regen from the register-carried
            # bulge column (lane kk-1, rows kk:kk+2), or the SMEM shift
            # rotation at the window head
            cn, sn, r = givens_cxff(g0, g1)
            c = ff.where(first, c0, cn)
            s = cxff.where(first, s0, sn)
            _row2_apply_cx(refs, 0, kk, _lmat_s(c, s), N,
                           force_lane=kk - 1, force_vals=(r, zscal),
                           force_act=~first)
            R0[0, kk, 0:16] = _flat16(_lmat_s(c, s))
            R0[0, kk, 32:48] = _flat16(_rmat_adj_s(c, s))

            # ring l = p-1..1 (S static: unrolled, no lax.cond)
            for l in range(p - 1, 0, -1):
                if S[l]:
                    Rm = _rmat_adj_s(c, s)
                    gg = _band_col_apply_cx(refs, l, kk, Rm, N,
                                            gen_row0=kk)
                    cn, sn, r = givens_cxff(gg[0], gg[1])
                    Lm = _lmat_s(cn, sn)
                    _row2_apply_cx(refs, l, kk, Lm, N, force_lane=kk,
                                   force_vals=(r, zscal),
                                   force_act=jnp.bool_(True))
                    R0[l, kk, 0:16] = _flat16(Lm)
                    R0[l, kk, 16:32] = _flat16(Rm)
                    R0[l, kk, 32:48] = _flat16(_rmat_adj_s(cn, sn))
                    c, s = cn, sn
                else:
                    Lm = _lmat_s(c, s)
                    gl = _row2_apply_cx(refs, l, kk, Lm, N,
                                        gen_lanes=(kk + 1, kk))
                    cn, sn, r = givens_cxff(gl[0], gl[1])
                    Rm = _lmat_s(cn, sn)
                    _band_col_apply_cx(refs, l, kk, Rm, N,
                                       force_row=kk + 1,
                                       force_vals=(zscal, r))
                    snn = neg(sn)
                    R0[l, kk, 0:16] = _flat16(Lm)
                    R0[l, kk, 16:32] = _flat16(Rm)
                    R0[l, kk, 32:48] = _flat16(_rmat_adj_s(cn, snn))
                    c, s = cn, snn

            # ring close on factor 0; the new column kk at rows kk+1:kk+3
            # is the next step's generation fragment (register-carried)
            Rm = _rmat_adj_s(c, s)
            gg = _band_col_apply_cx(refs, 0, kk, Rm, N, gen_row0=kk + 1)
            R0[0, kk, 16:32] = _flat16(Rm)
            return gg

        lax.fori_loop(m, i, step, (zscal, zscal))

    return kernel


# ---------------------------------------------------------------------------
# kernels B0 / B: batched application of the logged chains


def _log_entry(v, base: int, r: int, c: int) -> CXF:
    """(p, 1) CXF entry (r, c) of the logged 2x2 at lane block ``base``
    (static slices into the row-major flat log; see _flat16)."""
    q = r * 2 + c
    return CXF(FF(v[:, 0, base + q:base + q + 1],
                  v[:, 0, base + 4 + q:base + 4 + q + 1]),
               FF(v[:, 0, base + 8 + q:base + 8 + q + 1],
                  v[:, 0, base + 12 + q:base + 12 + q + 1]))


def _read_prows(refs4, kk, N):
    """(p, 2, N) rows kk:kk+2 of a 4-component (p, N, N) buffer, plus the
    roll context needed to write them back."""
    if N <= 128:
        rows = [r[:, pl.ds(kk, 2), :] for r in refs4]
        return rows, None
    kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
    o = kk - kk8
    blocks = [pltpu.roll(r[:, pl.ds(kk8, 16), :], -o, 1) for r in refs4]
    return blocks, (kk8, o)


def _write_prows(refs4, kk, news, ctx, blocks):
    if ctx is None:
        for r, nv in zip(refs4, news):
            r[:, pl.ds(kk, 2), :] = nv
        return
    kk8, o = ctx
    for r, nv, b in zip(refs4, news, blocks):
        b2 = jnp.concatenate([nv, b[:, 2:, :]], axis=1)
        r[:, pl.ds(kk8, 16), :] = pltpu.roll(b2, o, 1)


def _apply_logged(refs4, kk, v, base: int, N, transpose: bool,
                  hi_lane=None, keep=None):
    """rows kk:kk+2 of a (p, N, N) 4-component buffer <- M @ rows (or
    M^T @ rows when ``transpose``), M from log lane block ``base``.

    ``hi_lane``: only lanes <= hi_lane updated (kernel B's H^T window
    bound).  ``keep``: (lane, factor, when) — restore those input lanes
    (kernel B0's factor-0 window-head boundary column).
    """
    blocks, ctx = _read_prows(refs4, kk, N)
    rs = [CXF(FF(blocks[0][:, t, :], blocks[1][:, t, :]),
              FF(blocks[2][:, t, :], blocks[3][:, t, :])) for t in range(2)]

    def el(rr, cc):
        if transpose:
            rr, cc = cc, rr
        return _log_entry(v, base, rr, cc)

    outs = []
    for rr in range(2):
        acc = cxff.add(cxff.mul(el(rr, 0), rs[0]), cxff.mul(el(rr, 1), rs[1]))
        outs.append(acc)
    if hi_lane is not None:
        lane = _lane_iota(outs[0].re.hi.shape, 1)
        outs = [_where_cx_m(lane <= hi_lane, o, r)
                for o, r in zip(outs, rs)]
    if keep is not None:
        kl, kf, kw = keep
        lane = _lane_iota(outs[0].re.hi.shape, 1)
        fct = lax.broadcasted_iota(jnp.int32, outs[0].re.hi.shape, 0)
        kmask = (lane == kl) & kw & (fct == kf)
        outs = [_where_cx_m(kmask, r, o) for o, r in zip(outs, rs)]
    news = [jnp.stack([outs[0].re.hi, outs[1].re.hi], 1),
            jnp.stack([outs[0].re.lo, outs[1].re.lo], 1),
            jnp.stack([outs[0].im.hi, outs[1].im.hi], 1),
            jnp.stack([outs[0].im.lo, outs[1].im.lo], 1)]
    _write_prows(refs4, kk, news, ctx, blocks)


def _group_apply2(refs4, b, v8, base: int, N, m, i, transpose: bool,
                  hi_lane=None, keep_head=None):
    """8 consecutive steps' 2x2 transforms on ONE aligned 16-row slab.

    Step kk = b + t (t = 0..7) applies its logged transform to slab rows
    t:t+2 IN REGISTERS, exactly the order the per-step path executes
    them — consecutive steps overlap one row, and the sequential
    in-register chain is bitwise-identical to the write-then-reread
    chain.  Inactive steps (kk outside [m, i-1]) keep rows unchanged.
    One slab read + one write per 8 steps replaces 8 rolled RMWs (the
    dominant per-step device cost; see ops/pallas_sweep.py's group note).

    ``keep_head``: restore factor-0's input lane kk-1 at the step
    kk == m (kernel B0's window-boundary column device) — valid in the
    grouped chain because no earlier in-group step writes that lane's
    rows below m.
    """
    blocks = [r[:, pl.ds(b, 16), :] for r in refs4]
    rows = [CXF(FF(blocks[0][:, t, :], blocks[1][:, t, :]),
                FF(blocks[2][:, t, :], blocks[3][:, t, :]))
            for t in range(16)]
    lane = _lane_iota(rows[0].re.hi.shape, 1)
    fct = lax.broadcasted_iota(jnp.int32, rows[0].re.hi.shape, 0)
    for t in range(8):
        kk = b + jnp.int32(t)
        act = (kk >= m) & (kk <= i - 1)
        v = v8[:, t:t + 1, :]

        def el(rr, cc):
            if transpose:
                rr, cc = cc, rr
            return _log_entry(v, base, rr, cc)

        rs = [rows[t], rows[t + 1]]
        outs = []
        for rr in range(2):
            acc = cxff.add(cxff.mul(el(rr, 0), rs[0]),
                           cxff.mul(el(rr, 1), rs[1]))
            outs.append(acc)
        if hi_lane is not None:
            outs = [_where_cx_m(lane <= hi_lane, o, r)
                    for o, r in zip(outs, rs)]
        if keep_head is not None:
            kmask = (lane == kk - 1) & (kk == m) & (fct == 0)
            outs = [_where_cx_m(kmask, r, o) for o, r in zip(outs, rs)]
        for rr in range(2):
            rows[t + rr] = _where_cx_m(act, outs[rr], rs[rr])
    news = [jnp.stack([r.re.hi for r in rows], 1),
            jnp.stack([r.re.lo for r in rows], 1),
            jnp.stack([r.im.hi for r in rows], 1),
            jnp.stack([r.im.lo for r in rows], 1)]
    for ref, nv in zip(refs4, news):
        ref[:, pl.ds(b, 16), :] = nv


def _make_qz_left_kernel(p: int, N: int, hbm_inputs: bool = False):
    """Kernel B0: logged L chains on H's rows, batched over factors."""

    def kernel(scal, Hrh, Hrl, Hih, Hil, R0, oRh, oRl, oIh, oIl, *sems):
        m = scal[0]
        i = scal[1]
        ins = (Hrh, Hrl, Hih, Hil)
        outs4 = (oRh, oRl, oIh, oIl)
        if hbm_inputs:
            cps = [pltpu.make_async_copy(a, b, s) for a, b, s in
                   zip(ins, outs4, sems)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        else:
            for a, b in zip(ins, outs4):
                b[:] = a[:]

        def step(kk, _):
            v = R0[:, pl.ds(kk, 1), :]
            _apply_logged(outs4, kk, v, 0, N, transpose=False,
                          keep=(kk - 1, 0, kk == m))
            return jnp.int32(0)

        def group(t, _):
            b = pl.multiple_of(g0 + t * jnp.int32(8), 8)
            v8 = R0[:, pl.ds(b, 8), :]
            _group_apply2(outs4, b, v8, 0, N, m, i, transpose=False,
                          keep_head=True)
            return jnp.int32(0)

        if N > 128 and not hbm_inputs:
            g0 = pl.multiple_of(m & jnp.int32(-8), 8)
            ngroups = (i - g0 + jnp.int32(7)) >> 3
            lax.fori_loop(jnp.int32(0), ngroups, group, jnp.int32(0))
        else:
            lax.fori_loop(m, i, step, jnp.int32(0))

    return kernel


def _make_qz_apply_kernel(p: int, N: int, want_z: bool,
                          hbm_inputs: bool = False):
    """Kernel B: logged R chains on H^T (hi_lane = ilast) + ZR on Z^T."""

    def kernel(scal, HTrh, HTrl, HTih, HTil, ZTrh, ZTrl, ZTih, ZTil, R0,
               oHrh, oHrl, oHih, oHil, oZrh, oZrl, oZih, oZil, *sems):
        m = scal[0]
        i = scal[1]
        h_in = (HTrh, HTrl, HTih, HTil)
        h_out = (oHrh, oHrl, oHih, oHil)
        z_in = (ZTrh, ZTrl, ZTih, ZTil)
        z_out = (oZrh, oZrl, oZih, oZil)
        pairs = list(zip(h_in, h_out))
        if want_z:
            pairs += list(zip(z_in, z_out))
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

        def step(kk, _):
            v = R0[:, pl.ds(kk, 1), :]
            _apply_logged(h_out, kk, v, 16, N, transpose=True, hi_lane=i)
            if want_z:
                _apply_logged(z_out, kk, v, 32, N, transpose=True)
            return jnp.int32(0)

        def group(t, _):
            b = pl.multiple_of(g0 + t * jnp.int32(8), 8)
            v8 = R0[:, pl.ds(b, 8), :]
            _group_apply2(h_out, b, v8, 16, N, m, i, transpose=True,
                          hi_lane=i)
            if want_z:
                _group_apply2(z_out, b, v8, 32, N, m, i, transpose=True)
            return jnp.int32(0)

        if N > 128 and not hbm_inputs:
            g0 = pl.multiple_of(m & jnp.int32(-8), 8)
            ngroups = (i - g0 + jnp.int32(7)) >> 3
            lax.fori_loop(jnp.int32(0), ngroups, group, jnp.int32(0))
        else:
            lax.fori_loop(m, i, step, jnp.int32(0))

    def kernel_noz(scal, HTrh, HTrl, HTih, HTil, R0,
                   oHrh, oHrl, oHih, oHil, *sems):
        kernel(scal, HTrh, HTrl, HTih, HTil, None, None, None, None, R0,
               oHrh, oHrl, oHih, oHil, None, None, None, None, *sems)

    return kernel if want_z else kernel_noz


# ---------------------------------------------------------------------------
# pallas_call wrappers


def _vmem_bytes(p, N, n_arrays):
    lanes = -(-N // 128) * 128
    rows = -(-N // 8) * 8
    return n_arrays * p * rows * lanes * 4


@functools.lru_cache(maxsize=32)
def _qz_sweep_call(p: int, N: int, S: Tuple[bool, ...], interpret: bool):
    hbm_inputs = _vmem_bytes(p, N, 8) > 96 * (1 << 20) and not interpret
    kern = _make_qz_sweep_kernel(p, N, S, hbm_inputs)
    n_res = 4 if hbm_inputs else 8
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 48 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.VMEM((p, N, N), jnp.float32) for _ in range(4)]
    if hbm_inputs:
        scratch += [pltpu.SemaphoreType.DMA] * 4
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((p, N, 48), jnp.float32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=h_space)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _qz_left_call(p: int, N: int, interpret: bool):
    hbm_inputs = _vmem_bytes(p, N, 8) > 96 * (1 << 20) and not interpret
    kern = _make_qz_left_kernel(p, N, hbm_inputs)
    n_res = 4 if hbm_inputs else 8
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 48 * 4 + (8 << 20)
    h_space = pltpu.ANY if hbm_inputs else pltpu.VMEM
    scratch = [pltpu.SemaphoreType.DMA] * 4 if hbm_inputs else []
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                        for _ in range(4)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=h_space)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=scratch,
        input_output_aliases={} if hbm_inputs else
        {1 + j: j for j in range(4)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * (1 << 20))),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _qz_apply_call(p: int, N: int, want_z: bool, interpret: bool):
    n_out = 8 if want_z else 4
    hbm_inputs = _vmem_bytes(p, N, 2 * n_out) > 96 * (1 << 20) \
        and not interpret
    kern = _make_qz_apply_kernel(p, N, want_z, hbm_inputs)
    n_res = n_out if hbm_inputs else 2 * n_out
    vmem = _vmem_bytes(p, N, n_res) + 2 * p * N * 48 * 4 + (8 << 20)
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


def qz_sweep_cxff(H: CXF, Z: Optional[CXF], m, i, c0: FF, s0: CXF, *,
                  S: Tuple[bool, ...], want_z: bool,
                  interpret: bool = False):
    """One full single-shift QZ sweep over the window [m, i] in ds
    split-complex arithmetic (three fused Pallas kernels).

    Args:
      H: (p, n, n) CXF stack, H[0] Hessenberg, rest triangular.
      Z: (p, n, n) CXF unitary stack (NOT transposed) or None.
      m, i: traced int32 window bounds (sweep runs k = m..i-1).
      c0, s0: the shift rotation (scalar FF real c, scalar CXF s),
        exceptional randomness already applied by the caller.
      S: static signature tuple (S[0] True).
      want_z: static; update Z.

    Returns (H, Z) updated, with exact structural zeros (triu scrub).
    """
    p, n, _ = H.re.hi.shape
    if n + 1 <= 128:
        N = n + 1
    else:
        N = ((n + 16 + 7) // 8) * 8
    scal = jnp.stack([jnp.asarray(m, jnp.int32), jnp.asarray(i, jnp.int32)])
    cs0 = jnp.stack([c0.hi, c0.lo, s0.re.hi, s0.re.lo,
                     s0.im.hi, s0.im.lo]).astype(jnp.float32)
    comps = [_pad_to(x, N) for x in
             (H.re.hi, H.re.lo, H.im.hi, H.im.lo)]

    with ff.no_barriers():
        (R0,) = _qz_sweep_call(p, N, S, interpret)(scal, cs0, *comps)
        comps = list(_qz_left_call(p, N, interpret)(scal, *comps, R0))

    compsT = [jnp.swapaxes(x, 1, 2) for x in comps]
    if want_z:
        zT = [jnp.swapaxes(_pad_to(x, N), 1, 2) for x in
              (Z.re.hi, Z.re.lo, Z.im.hi, Z.im.lo)]
        with ff.no_barriers():
            outs = _qz_apply_call(p, N, True, interpret)(
                scal, *compsT, *zT, R0)
        compsT = outs[:4]
        zT = outs[4:]
        zc = [jnp.swapaxes(x, 1, 2)[:, :n, :n] for x in zT]
        Z = CXF(FF(zc[0], zc[1]), FF(zc[2], zc[3]))
    else:
        with ff.no_barriers():
            compsT = _qz_apply_call(p, N, False, interpret)(
                scal, *compsT, R0)
    comps = [jnp.swapaxes(x, 1, 2)[:, :n, :n] for x in compsT]

    # structural enforcement: deferred-ordering junk lands strictly below
    # the subdiagonal of H[0] / the diagonal of the triangular factors
    def scrub(x):
        h0 = jnp.triu(x[:1], -1)
        return jnp.concatenate([h0] + ([jnp.triu(x[1:])] if p > 1 else []),
                               axis=0)

    comps = [scrub(x) for x in comps]
    H = CXF(FF(comps[0], comps[1]), FF(comps[2], comps[3]))
    return H, Z


# ---------------------------------------------------------------------------
# Kernel S: the per-iteration shift-rotation chain, fused.
#
# act_sweep's XLA-glue shift chain (p factor givens_cxff rounds + the
# closing H0 givens, reference src/generalized.jl:763-805) is ~2.7k
# optimization-barrier layers executed EVERY sweep iteration — a large
# slice of the cx core's ~20 ms/iteration fixed cost (round-5 census).
# This kernel runs the chain as ONE Mosaic launch over two tiny row
# slabs (rows ifirst:ifirst+2 and ilast, sliced by the glue), with the
# identical ds op sequence (bitwise vs the glue, test_pallas_cx.py).


def _make_shift_kernel(p: int, N: int, S):
    from . import cxff as _cxff

    def kernel(iscal, *refs):
        # inputs: rowsA (p, 2, N) x4 comps (rows ifirst, ifirst+1),
        #         rowsB (p, 1, N) x4 comps (row ilast); output (1, 8) f32
        ra = refs[0:4]
        rb = refs[4:8]
        out = refs[8]
        ifirst = iscal[0]
        ilast = iscal[1]

        def elA(l, r, c):
            vals = []
            for x in ra:
                rows = x[l]  # (2, N)
                mask = _lane_iota_cx(rows.shape) == c
                vals.append(jnp.sum(jnp.where(mask, rows, jnp.float32(0.0)),
                                    axis=1)[r])
            return CXF(FF(vals[0], vals[1]), FF(vals[2], vals[3]))

        def elB(l, c):
            vals = []
            for x in rb:
                rows = x[l]  # (1, N)
                mask = _lane_iota_cx(rows.shape) == c
                vals.append(jnp.sum(jnp.where(mask, rows, jnp.float32(0.0)),
                                    axis=1)[0])
            return CXF(FF(vals[0], vals[1]), FF(vals[2], vals[3]))

        one_c = _cxff.cxf(jnp.float32(1.0))
        c, s, _ = givens_cxff(one_c, one_c)
        # glue: fori t = 0..p-2 with l = p-1-t (factors p-1 down to 1),
        # lax.cond on S[l] — statically unrolled here (same selected ops)
        for l in range(p - 1, 0, -1):
            hf = elA(l, 0, ifirst)
            hl = elB(l, ilast)
            if S[l]:
                c, s = (lambda cs: cs)(
                    givens_cxff(_cxff.mul_ff(hf, c),
                                _cxff.mul(hl, conj(s)))[:2])
            else:
                c2, s2, _ = givens_cxff(_cxff.mul_ff(hl, c),
                                        neg(_cxff.mul(hf, conj(s))))
                c, s = c2, neg(s2)
        h0f = elA(0, 0, ifirst)
        h0l = elB(0, ilast)
        h0sub = elA(0, 1, ifirst)
        c, s, _ = givens_cxff(
            _cxff.sub(_cxff.mul_ff(h0f, c), _cxff.mul(h0l, conj(s))),
            _cxff.mul_ff(h0sub, c))
        out[...] = jnp.stack([c.hi, c.lo, s.re.hi, s.re.lo,
                              s.im.hi, s.im.lo, jnp.float32(0.0),
                              jnp.float32(0.0)])[None, :]

    return kernel


def _lane_iota_cx(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


@functools.lru_cache(maxsize=32)
def _qz_shift_call(p: int, N: int, S, interpret: bool):
    kern = _make_shift_kernel(p, N, S)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, 8), jnp.float32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        interpret=interpret,
    )


def qz_shift_cxff(H: CXF, ifirst, ilast, *, S, interpret: bool = False):
    """Fused shift-rotation chain; returns (c: FF, s: CXF) — the glue
    applies the exceptional-shift overlay itself."""
    p, n, _ = H.re.hi.shape
    z32 = jnp.int32(0)
    i0 = jnp.clip(jnp.asarray(ifirst, jnp.int32), 0, n - 2)
    i1 = jnp.clip(jnp.asarray(ilast, jnp.int32), 0, n - 1)

    def sl(x, r0, k):
        return jax.lax.dynamic_slice(x, (z32, r0, z32), (p, k, n))

    comps = (H.re.hi, H.re.lo, H.im.hi, H.im.lo)
    ra = [sl(x, i0, 2) for x in comps]
    rb = [sl(x, i1, 1) for x in comps]
    iscal = jnp.stack([i0, i1])
    with ff.no_barriers():
        (o,) = _qz_shift_call(p, n, tuple(S), interpret)(iscal, *ra, *rb)
    c = FF(o[0, 0], o[0, 1])
    s = CXF(FF(o[0, 2], o[0, 3]), FF(o[0, 4], o[0, 5]))
    return c, s
