"""Periodic Hessenberg reduction (all-positive signature).

Behavioral contract from the reference's `phessenberg!`
(src/PeriodicSchurDecompositions.jl:199-259, an MB03VD-style column sweep):
reduce a cycle ``A[0..p-1]`` by unitary similarity

    Q[j]^H A[j] Q[(j+1) % p] = H[j]

with ``H[0]`` upper Hessenberg and ``H[1..p-1]`` upper triangular.

TPU-native design: one ``lax.fori_loop`` over columns; for each column the
p-cycle of reflector generate/apply steps is unrolled (p is static).  Every
reflector application is a full-width rank-1 update (two matvecs), which XLA
fuses and maps to the MXU/VPU — there are no shrinking submatrices, the
reflector vectors carry the masking.  Complexity O(p n^3) like the reference,
but each flop lives in a large fused matvec instead of a scalar loop.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .householder import refl_left, refl_right, reflector_masked


def _fix_column(M, i, beta, zero_below):
    """Set column i to the reflector's exact image: rows<zero_below kept,
    row ``zero_below-1`` = beta, rows >= zero_below zeroed."""
    n = M.shape[0]
    i = jnp.asarray(i, jnp.int32)
    col = lax.dynamic_slice(M, (jnp.int32(0), i), (n, 1))[:, 0]
    rows = lax.iota(jnp.int32, n)
    piv = zero_below - 1
    newcol = jnp.where(rows < piv, col,
                       jnp.where(rows == piv, jnp.asarray(beta, M.dtype),
                                 jnp.zeros((), M.dtype)))
    return lax.dynamic_update_slice(M, newcol[:, None], (jnp.int32(0), i))


def phessenberg_core(A: jax.Array, want_q: bool = True
                     ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Reduce a stacked cycle to periodic Hessenberg/triangular form.

    Args:
      A: (p, n, n) stacked cycle (real or complex floating dtype).
      want_q: accumulate the unitary factors.

    Returns:
      (H, Q): H is (p, n, n) with H[0] upper Hessenberg and H[1:] upper
      triangular; Q is (p, n, n) with Q[j]^H A[j] Q[(j+1)%p] = H[j]
      (or None if not requested).
    """
    p, n, n2 = A.shape
    assert n == n2, "factors must be square"
    dt = A.dtype
    if n <= 1:
        Q = jnp.broadcast_to(jnp.eye(n, dtype=dt), (p, n, n)) if want_q else None
        return A, Q

    Q0 = jnp.broadcast_to(jnp.eye(n, dtype=dt), (p, n, n)).copy() if want_q else None

    def column_step(i, carry):
        A, Q = carry
        # factors p-1 .. 1: triangularize column i
        for j in range(p - 1, 0, -1):
            col = lax.dynamic_slice(A[j], (jnp.int32(0), jnp.asarray(i, jnp.int32)),
                                    (n, 1))[:, 0]
            w, tau, beta = reflector_masked(col, i)
            Aj = refl_left(A[j], w, jnp.conj(tau))
            Aj = _fix_column(Aj, i, beta, i + 1)
            A = A.at[j].set(Aj)
            A = A.at[j - 1].set(refl_right(A[j - 1], w, tau))
            if want_q:
                Q = Q.at[j].set(refl_right(Q[j], w, tau))
        # factor 0: Hessenberg column i (annihilate below row i+1)
        col = lax.dynamic_slice(A[0], (jnp.int32(0), jnp.asarray(i, jnp.int32)),
                                (n, 1))[:, 0]
        w, tau, beta = reflector_masked(col, i + 1)
        A0 = refl_left(A[0], w, jnp.conj(tau))
        A0 = _fix_column(A0, i, beta, i + 2)
        A = A.at[0].set(A0)
        A = A.at[p - 1 if p > 1 else 0].set(refl_right(A[p - 1 if p > 1 else 0], w, tau))
        if want_q:
            Q = Q.at[0].set(refl_right(Q[0], w, tau))
        return A, Q

    # note the p == 1 subtlety: the right-coupling of factor 0 wraps onto
    # itself, which column_step handles by indexing factor p-1 == 0 after the
    # left application (same as the reference's cyclic coupling).
    A, Q0 = lax.fori_loop(0, n - 1, column_step, (A, Q0))

    # scrub roundoff outside the guaranteed-zero structure (the reference
    # does the same via triu, src/PeriodicSchurDecompositions.jl:149)
    tri = jnp.triu(A[1:], 0) if p > 1 else A[1:]
    H = jnp.concatenate([jnp.triu(A[:1], -1), tri], axis=0)
    return H, Q0
