"""Pallas TPU kernel: the WHOLE ds periodic Hessenberg reduction, fused.

The XLA-glue reduction (ops/hessenberg_ff.py) traces 3p full-matrix ds
rank-1 updates per column into barrier-separated slab ops; at the p=16
n=512 headline that is ~250k tiny XLA:TPU launches and 1.86 s of the
9.1 s pipeline (BASELINE.md round-4 phase attribution).  This kernel runs
the complete MB03VD-shaped reduction (reference
src/PeriodicSchurDecompositions.jl:199-259) in ONE Mosaic launch:
column loop as an in-kernel fori_loop, factor ring statically unrolled,
H and Q^T resident in VMEM.

TPU-first design notes:
* No transposes and no dynamic lane slicing (Mosaic supports neither):
  - column i extraction and the w-column -> w-row flip ride EXACT MXU
    one-hot/identity contractions (every output element is a sum with a
    single nonzero term; v5e's multi-pass f32 matmul reproduces x*1 + 0
    exactly, and precision=HIGHEST is forced);
  - ds dot products use an in-register fold tree over the reduced axis
    built from pltpu.roll + masked EFT adds (adding an exact zero is
    exact, so masked lanes never perturb the compensated sum).
* All scalars are (1, 1)-shaped FF values (Mosaic-friendly 2D).
* Identical arithmetic to hessenberg_ff.reflector_masked_ff /
  refl_left_ff / refl_right_ff (max-scaled norms, tau-refit
  parametrization, exact ds reciprocals — round-3 bisect: generation
  accuracy is never traded for latency).

Gate: VMEM-resident only (~4 p n^2 f32 bytes + eye + temporaries); the
wrapper falls back to the XLA glue above ~100 MiB (p=16, n=512 uses
~68 MiB).
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
from .ffkern import _safe

# the kernel traces deep ds expression chains (per-column generation +
# p-factor applies inside the fori body); CPython's default recursion
# limit aborts tracing at reduction sizes (observed: n=512 on-chip,
# results_r5.log 17:38) — same raise as the sibling sweep kernels
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)


def _red(x: FF, axis: int, n: int) -> FF:
    """Exact ds fold-tree sum along ``axis`` (masked pltpu.roll levels).

    Returns the (1, M) / (M, 1) slice holding the totals.
    """
    shape = x.hi.shape
    if shape[1 - axis] == 1:
        # Mosaic cannot roll 1-wide arrays (single-row/column tiles,
        # bisected results_r5.log); broadcasting across the unit dim is
        # physically free (an (N, 1) column already occupies full
        # 128-lane tiles) and every lane folds the same exact ds sum
        wide = 128
        bshape = (shape[0], wide) if axis == 0 else (wide, shape[1])
        xb = FF(jnp.broadcast_to(x.hi, bshape),
                jnp.broadcast_to(x.lo, bshape))
        r = _red(xb, axis, n)
        # canonicalize through a fresh single-element reduce: a [0:1, 0:1]
        # slice of the rolled fold result carries a Mosaic layout that
        # later (N, N) broadcasts reject (compile helper exit 1); the
        # jnp.sum-produced scalar broadcasts fine (bisected)
        first = (lax.broadcasted_iota(jnp.int32, r.hi.shape, 0) == 0) & \
            (lax.broadcasted_iota(jnp.int32, r.hi.shape, 1) == 0)
        z32 = jnp.float32(0.0)
        return FF(_s11(jnp.where(first, r.hi, z32)),
                  _s11(jnp.where(first, r.lo, z32)))
    hi, lo = x.hi, x.lo
    iot = lax.broadcasted_iota(jnp.int32, shape, axis)
    s = 1
    while s * 2 < n:
        s *= 2
    cur = x
    size = shape[axis]
    while s >= 1:
        # cyclically equivalent to a -s shift; NEGATIVE roll shifts
        # SIGSEGV the Mosaic compile helper (bisected, results_r5.log
        # 17:52 — positive and size-s shifts compile fine)
        zh = pltpu.roll(cur.hi, jnp.int32(size - s), axis)
        zl = pltpu.roll(cur.lo, jnp.int32(size - s), axis)
        mask = (iot < s) & (iot + s < n)
        cur = ff.add(cur, ff.where(mask, FF(zh, zl),
                                   ff.zeros(shape)))
        s //= 2
    if axis == 0:
        return FF(cur.hi[0:1, :], cur.lo[0:1, :])
    return FF(cur.hi[:, 0:1], cur.lo[:, 0:1])


def _exact_mxu(a, b):
    """a @ b where every output element has a single nonzero term."""
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def _colvec(M: FF, ei) -> FF:
    """Column of M selected by the (N, 1) one-hot ``ei`` (exact MXU)."""
    return FF(_exact_mxu(M.hi, ei), _exact_mxu(M.lo, ei))


def _rowflip(w: FF, eye) -> FF:
    """(N, 1) column -> (1, N) row via the exact identity contraction."""
    return FF(lax.dot_general(w.hi, eye, (((0,), (0,)), ((), ())),
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32),
              lax.dot_general(w.lo, eye, (((0,), (0,)), ((), ())),
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32))


def _s11(v) -> jnp.ndarray:
    return jnp.sum(v, keepdims=True).reshape(1, 1)


def _make_hess_kernel(p: int, n: int, want_q: bool):
    N = n

    def kernel(*refs):
        # aliased in/out: [Ahi, Alo, (Qhi, Qlo)] inputs then same outputs;
        # operate on the output refs (they share buffers with the inputs)
        nin = 4 if want_q else 2
        oA_hi, oA_lo = refs[nin], refs[nin + 1]
        if want_q:
            oQ_hi, oQ_lo = refs[nin + 2], refs[nin + 3]

        rr1 = lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        rr = lax.broadcasted_iota(jnp.int32, (N, N), 0)
        cc = lax.broadcasted_iota(jnp.int32, (N, N), 1)
        eye = jnp.where(rr == cc, jnp.float32(1.0), jnp.float32(0.0))
        zcol = ff.zeros((N, 1))

        def gen(M: FF, i, lo):
            """reflector_masked_ff on column i, window rows >= lo."""
            ei = jnp.where(lax.broadcasted_iota(jnp.int32, (N, 1), 0) == i,
                           jnp.float32(1.0), jnp.float32(0.0))
            x = _colvec(M, ei)
            at_lo = rr1 == lo
            tail = rr1 > lo
            alpha = FF(_s11(jnp.where(at_lo, x.hi, jnp.float32(0.0))),
                       _s11(jnp.where(at_lo, x.lo, jnp.float32(0.0))))
            tx = ff.where(tail, x, zcol)
            m = jnp.max(jnp.abs(tx.hi)).reshape(1, 1)
            msafe = jnp.where(m == 0, jnp.float32(1.0), m)
            scl = ff.mul(tx, ff.recip(ff.ff(jnp.broadcast_to(msafe,
                                                             (N, 1)))))
            ssq = _red(ff.sq(scl), 0, N)  # (1, 1)
            xnorm = ff.mul(FF(m, jnp.zeros_like(m)), ff.sqrt(ssq))
            trivial = ff.eq0(xnorm)

            beta = ff.neg(ff.copysign(ff.hypot2(alpha, xnorm), alpha.hi))
            tau = ff.div(ff.sub(beta, alpha), _safe(beta))
            dinv = ff.recip(_safe(ff.sub(alpha, beta)))
            vtail = ff.mul(tx, FF(jnp.broadcast_to(dinv.hi, (N, 1)),
                                  jnp.broadcast_to(dinv.lo, (N, 1))))
            tau = ff.where(trivial, ff.zeros((1, 1)), tau)
            beta = ff.where(trivial, alpha, beta)
            w = ff.where(tail & jnp.logical_not(trivial), vtail,
                         ff.zeros((N, 1)))
            w = FF(jnp.where(at_lo, jnp.float32(1.0), w.hi),
                   jnp.where(at_lo, jnp.float32(0.0), w.lo))
            return w, tau, beta

        def left(M: FF, w: FF, tau: FF) -> FF:
            t = _red(ff.mul(FF(w.hi, w.lo), M), 0, N)        # (1, N)
            tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (N, 1)),
                           jnp.broadcast_to(tau.lo, (N, 1))), w)
            return ff.sub(M, ff.mul(tw, t))

        def right(M: FF, wrow: FF, tau: FF) -> FF:
            u = _red(ff.mul(M, wrow), 1, N)                   # (N, 1)
            tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (1, N)),
                           jnp.broadcast_to(tau.lo, (1, N))), wrow)
            return ff.sub(M, ff.mul(u, tw))

        def fixcol(M: FF, i, beta: FF, piv) -> FF:
            sel = cc == i
            keep = rr < piv
            at_piv = rr == piv
            bh = jnp.broadcast_to(beta.hi, (N, N))
            bl = jnp.broadcast_to(beta.lo, (N, N))
            nh = jnp.where(keep, M.hi,
                           jnp.where(at_piv, bh, jnp.float32(0.0)))
            nl = jnp.where(keep, M.lo,
                           jnp.where(at_piv, bl, jnp.float32(0.0)))
            return FF(jnp.where(sel, nh, M.hi), jnp.where(sel, nl, M.lo))

        def rdA(j):
            return FF(oA_hi[j], oA_lo[j])

        def wrA(j, M: FF):
            oA_hi[j] = M.hi
            oA_lo[j] = M.lo

        def colstep(i, carry):
            # factor ring as an in-kernel fori with dynamic batch-axis ref
            # indexing, NOT statically unrolled: the unrolled body's MLIR
            # (~860 KB at p=16) SIGSEGVs the remote Mosaic compile helper
            # (1 MiB fiber stacks; results_r5.log 17:52) — the rolled loop
            # is ~p times smaller and compiles
            if p > 1:
                def facstep(t, c):
                    j = jnp.int32(p - 1) - t
                    Aj = FF(oA_hi[j], oA_lo[j])
                    w, tau, beta = gen(Aj, i, i)
                    Aj = left(Aj, w, tau)
                    Aj = fixcol(Aj, i, beta, i)
                    oA_hi[j], oA_lo[j] = Aj.hi, Aj.lo
                    wrow = _rowflip(w, eye)
                    Am = right(FF(oA_hi[j - 1], oA_lo[j - 1]), wrow, tau)
                    oA_hi[j - 1], oA_lo[j - 1] = Am.hi, Am.lo
                    if want_q:
                        Qj = left(FF(oQ_hi[j], oQ_lo[j]), w, tau)
                        oQ_hi[j], oQ_lo[j] = Qj.hi, Qj.lo
                    return c
                lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), facstep,
                              jnp.int32(0))
            A0 = rdA(0)
            w, tau, beta = gen(A0, i, i + 1)
            A0 = left(A0, w, tau)
            A0 = fixcol(A0, i, beta, i + 1)
            wrA(0, A0)
            wrow = _rowflip(w, eye)
            jlast = p - 1 if p > 1 else 0
            wrA(jlast, right(rdA(jlast), wrow, tau))
            if want_q:
                Q0 = left(FF(oQ_hi[0], oQ_lo[0]), w, tau)
                oQ_hi[0], oQ_lo[0] = Q0.hi, Q0.lo
            return carry

        # seed outputs from the (aliased) inputs: with aliasing this is a
        # no-op copy Mosaic elides; without (interpret) it materializes
        for k in range(nin):
            refs[nin + k][...] = refs[k][...]
        lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), colstep,
                      jnp.int32(0))

    return kernel


def _vmem_bytes_hess(p, n, want_q):
    comps = 4 if want_q else 2
    return comps * p * n * n * 4


@functools.lru_cache(maxsize=16)
def _hess_call(p: int, n: int, want_q: bool, interpret: bool):
    kern = _make_hess_kernel(p, n, want_q)
    nin = 4 if want_q else 2
    vmem = _vmem_bytes_hess(p, n, want_q) + n * n * 4 * 6 + (8 << 20)
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, n, n), jnp.float32)
                        for _ in range(nin)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nin,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(nin)),
        input_output_aliases={j: j for j in range(nin)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 127 * (1 << 20))),
        interpret=interpret,
    )


def hess_kernel_fits(p: int, n: int, want_q: bool = True) -> bool:
    """True when the fused kernel's state fits the VMEM budget."""
    return _vmem_bytes_hess(p, n, want_q) + n * n * 4 * 6 <= 100 * (1 << 20)


def phessenberg_kernel_ff(Ahi, Alo, want_q: bool = True,
                          interpret: bool = False):
    """Fused-kernel ds periodic Hessenberg reduction (same contract as
    hessenberg_ff.phessenberg_core_ff; triu scrubs applied here)."""
    p, n, _ = Ahi.shape
    if want_q:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
        args = (Ahi, Alo, eye, jnp.zeros((p, n, n), jnp.float32))
    else:
        args = (Ahi, Alo)
    with ff.no_barriers():
        outs = _hess_call(p, n, want_q, interpret)(*args)
    Hhi, Hlo = outs[0], outs[1]
    Hhi = Hhi.at[0].set(jnp.triu(Hhi[0], -1))
    Hlo = Hlo.at[0].set(jnp.triu(Hlo[0], -1))
    if p > 1:
        Hhi = Hhi.at[1:].set(jnp.triu(Hhi[1:]))
        Hlo = Hlo.at[1:].set(jnp.triu(Hlo[1:]))
    if want_q:
        return Hhi, Hlo, outs[2], outs[3]
    return Hhi, Hlo, None, None
