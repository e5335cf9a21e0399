"""Periodic Hessenberg reduction in float-float (ds) precision.

ds port of ops/hessenberg.phessenberg_core (MB03VD semantics, reference
src/PeriodicSchurDecompositions.jl:199-259) for the TPU pipeline: the
reduction contributes to the backward error exactly like the iteration, so
the <=1e-12 on-chip contract requires it in ds arithmetic as well.  Each
reflector application is a full-width ds rank-1 update (error-free products
+ tree-summed dot products); the unitary factors are accumulated
TRANSPOSED (Q^T), matching the iteration core's Z^T convention.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import ff
from .ff import FF
from .ffkern import _safe


def reflector_masked_ff(x: FF, lo):
    """xLARFG on the window ``x[lo:]`` of a static-length ds vector.

    Returns (w, tau, beta): w full-length with w[lo] = 1, essential part
    above lo, zeros elsewhere.  Mirrors ops/householder.reflector_masked
    (real case) in ds arithmetic with max-scaled norms.
    """
    n = x.hi.shape[0]
    idx = lax.iota(jnp.int32, n)
    at_lo = idx == lo
    tail_mask = idx > lo
    alpha = FF(jnp.sum(jnp.where(at_lo, x.hi, 0.0)),
               jnp.sum(jnp.where(at_lo, x.lo, 0.0)))
    tx = ff.where(tail_mask, x, ff.zeros((n,)))
    m = jnp.max(jnp.abs(tx.hi))
    msafe = jnp.where(m == 0, jnp.float32(1.0), m)
    scl = ff.mul(tx, ff.recip(ff.ff(jnp.broadcast_to(msafe, (n,)))))
    ssq = ff.sum_(ff.sq(scl), 0)
    xnorm = ff.mul(FF(m, jnp.zeros_like(m)), ff.sqrt(ssq))
    trivial = ff.eq0(xnorm)

    beta = ff.neg(ff.copysign(ff.hypot2(alpha, xnorm), alpha.hi))
    tau = ff.div(ff.sub(beta, alpha), _safe(beta))
    dinv = ff.recip(_safe(ff.sub(alpha, beta)))
    vtail = ff.mul(tx, FF(jnp.broadcast_to(dinv.hi, (n,)),
                          jnp.broadcast_to(dinv.lo, (n,))))

    tau = ff.where(trivial, ff.zeros(()), tau)
    beta = ff.where(trivial, alpha, beta)
    w = ff.where(tail_mask, ff.where(trivial, ff.zeros((n,)), vtail),
                 ff.zeros((n,)))
    w = FF(jnp.where(at_lo, 1.0, w.hi), jnp.where(at_lo, 0.0, w.lo))
    return w, tau, beta


def _bc(s: FF, shape) -> FF:
    return FF(jnp.broadcast_to(s.hi, shape), jnp.broadcast_to(s.lo, shape))


def refl_left_ff(A: FF, w: FF, tau: FF) -> FF:
    """A <- (I - tau w w^T) A  (ds rank-1 update)."""
    n = A.hi.shape[0]
    t = ff.sum_(ff.mul(FF(w.hi[:, None], w.lo[:, None]), A), 0)  # w^T A
    tw = ff.mul(_bc(tau, (n,)), w)
    upd = ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                 FF(t.hi[None, :], t.lo[None, :]))
    return ff.sub(A, upd)


def refl_right_ff(A: FF, w: FF, tau: FF) -> FF:
    """A <- A (I - tau w w^T)."""
    n = A.hi.shape[0]
    t = ff.sum_(ff.mul(A, FF(w.hi[None, :], w.lo[None, :])), 1)  # A w
    tw = ff.mul(_bc(tau, (n,)), w)
    upd = ff.mul(FF(t.hi[:, None], t.lo[:, None]),
                 FF(tw.hi[None, :], tw.lo[None, :]))
    return ff.sub(A, upd)


def _fix_column_ff(M: FF, i, beta: FF, zero_below) -> FF:
    n = M.hi.shape[0]
    i = jnp.asarray(i, jnp.int32)
    rows = lax.iota(jnp.int32, n)
    piv = zero_below - 1
    colhi = lax.dynamic_slice(M.hi, (jnp.int32(0), i), (n, 1))[:, 0]
    collo = lax.dynamic_slice(M.lo, (jnp.int32(0), i), (n, 1))[:, 0]
    newhi = jnp.where(rows < piv, colhi,
                      jnp.where(rows == piv, beta.hi, 0.0))
    newlo = jnp.where(rows < piv, collo,
                      jnp.where(rows == piv, beta.lo, 0.0))
    return FF(lax.dynamic_update_slice(M.hi, newhi[:, None],
                                       (jnp.int32(0), i)),
              lax.dynamic_update_slice(M.lo, newlo[:, None],
                                       (jnp.int32(0), i)))


def _getcol(M: FF, i) -> FF:
    n = M.hi.shape[0]
    i = jnp.asarray(i, jnp.int32)
    return FF(lax.dynamic_slice(M.hi, (jnp.int32(0), i), (n, 1))[:, 0],
              lax.dynamic_slice(M.lo, (jnp.int32(0), i), (n, 1))[:, 0])


def _kernel_auto(p: int, n: int, want_q: bool) -> bool:
    """Default routing for the fused Pallas reduction kernel.

    On the chip the fused single-launch kernel (ops/pallas_hess.py)
    replaces ~250k barrier-separated XLA glue launches; on CPU the glue
    path stays the default (the kernel is interpret-tested separately).
    Env override PSD_HESS_KERNEL=0/1 forces either path.
    """
    import os

    env = os.environ.get("PSD_HESS_KERNEL", "")
    if env in ("0", "1"):
        if env == "0":
            return False
        from .pallas_hess import hess_kernel_fits
        return hess_kernel_fits(p, n, want_q)
    # Auto-routing stays OFF on measurement: after the three Mosaic
    # compile workarounds (pallas_hess module doc) the kernel compiles
    # and is CORRECT on chip (recon 6.94e-14, orth 6.79e-14 at p=16
    # n=512) but measured NO WIN over the XLA glue (glue 1.9-2.5 s vs
    # kernel 2.4-3.1 s per reduction, results_r5.log 22:07) — same
    # outcome class as kernel G.  Opt in with PSD_HESS_KERNEL=1.
    return False


@partial(jax.jit, static_argnames=("want_q", "use_kernel"))
def phessenberg_core_ff(Ahi: jax.Array, Alo: jax.Array, want_q: bool = True,
                        use_kernel=None):
    """ds periodic Hessenberg reduction.

    Args:
      Ahi, Alo: (p, n, n) f32 pair.
      use_kernel: None (auto: fused Pallas kernel on the chip when it
        fits VMEM, XLA glue otherwise) / True / False / "interpret"
        (kernel through the Pallas interpreter, CPU tests).

    Returns (Hhi, Hlo, QThi, QTlo): H[0] Hessenberg, H[1:] triangular,
    Q^T stacked TRANSPOSED (Q[j]^T A[j] Q[(j+1)%p] = H[j]); QT None pair
    if not requested.
    """
    p, n, _ = Ahi.shape
    if use_kernel is None:
        use_kernel = _kernel_auto(p, n, want_q)
    if use_kernel and n > 1:
        from .pallas_hess import phessenberg_kernel_ff
        return phessenberg_kernel_ff(Ahi, Alo, want_q=want_q,
                                     interpret=use_kernel == "interpret")
    A = FF(Ahi, Alo)
    if n <= 1:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n))
        return (Ahi, Alo, eye, jnp.zeros_like(eye)) if want_q else \
            (Ahi, Alo, None, None)

    QT = FF(jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (p, n, n)),
            jnp.zeros((p, n, n), jnp.float32)) if want_q else \
        FF(jnp.zeros((p, 1, 1), jnp.float32), jnp.zeros((p, 1, 1),
                                                        jnp.float32))

    def fget(X: FF, j) -> FF:
        return FF(X.hi[j], X.lo[j])

    def fset(X: FF, j, M: FF) -> FF:
        return FF(X.hi.at[j].set(M.hi), X.lo.at[j].set(M.lo))

    def column_step(i, carry):
        A, QT = carry
        for j in range(p - 1, 0, -1):
            Aj = fget(A, j)
            w, tau, beta = reflector_masked_ff(_getcol(Aj, i), i)
            Aj = refl_left_ff(Aj, w, tau)
            Aj = _fix_column_ff(Aj, i, beta, i + 1)
            A = fset(A, j, Aj)
            A = fset(A, j - 1, refl_right_ff(fget(A, j - 1), w, tau))
            if want_q:
                # Q[j] <- Q[j] P  ==>  Q[j]^T <- P Q[j]^T (P symmetric)
                QT = fset(QT, j, refl_left_ff(fget(QT, j), w, tau))
        A0 = fget(A, 0)
        w, tau, beta = reflector_masked_ff(_getcol(A0, i), i + 1)
        A0 = refl_left_ff(A0, w, tau)
        A0 = _fix_column_ff(A0, i, beta, i + 2)
        A = fset(A, 0, A0)
        jlast = p - 1 if p > 1 else 0
        A = fset(A, jlast, refl_right_ff(fget(A, jlast), w, tau))
        if want_q:
            QT = fset(QT, 0, refl_left_ff(fget(QT, 0), w, tau))
        return A, QT

    A, QT = lax.fori_loop(0, n - 1, column_step, (A, QT))

    Hhi = A.hi.at[0].set(jnp.triu(A.hi[0], -1))
    Hlo = A.lo.at[0].set(jnp.triu(A.lo[0], -1))
    if p > 1:
        Hhi = Hhi.at[1:].set(jnp.triu(Hhi[1:]))
        Hlo = Hlo.at[1:].set(jnp.triu(Hlo[1:]))
    if want_q:
        return Hhi, Hlo, QT.hi, QT.lo
    return Hhi, Hlo, None, None
