"""Intra-matrix (row-sharded) operators for the large-N Krylov path.

SURVEY.md §2 names three parallel axes for periodic Schur workloads; this
module implements axis (c), sharding WITHIN the n×n factors, for the one
place it pays off at scale: the operator applications of `partial_pschur`
(the only O(n²)-per-step device work in the Krylov stack — everything else
is O(k²·p) host-side dense work, reference src/krylov.jl:266,327).

Layout: every factor A[l] is sharded by ROW BLOCKS over a 1-D mesh axis;
a matvec keeps the input vector replicated, computes the local
(n/d, n) @ (n,) block product with NO communication, and all-gathers the
(n/d,) partials into the replicated result — one ICI all-gather of n
floats per application, the minimal possible for a dense matvec with
replicated vectors.  The returned callables plug directly into
``partial_pschur(ops, ...)`` (which accepts per-factor callables), so the
whole periodic Krylov–Schur stack runs with cycle factors too large for
one device's memory.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def sharded_dense_ops(A, mesh: Optional[Mesh] = None, axis: str = "rows"):
    """Row-shard a stacked (p, n, n) cycle and return matvec callables.

    Args:
      A: (p, n, n) array-like (real or complex); n must be divisible by the
        mesh size.
      mesh: 1-D device mesh (defaults to all devices on one axis ``rows``).

    Returns:
      (ops, n, dtype): ``ops[l]`` maps a replicated (n,) vector to the
      replicated product ``A[l] @ v``; suitable for ``partial_pschur(ops,
      nev, which, n=n, dtype=dtype)``.
    """
    A = jnp.asarray(A)
    p, n, n2 = A.shape
    assert n == n2
    if mesh is None:
        mesh = make_mesh(names=(axis,))
    d = mesh.shape[axis]
    if n % d != 0:
        raise ValueError(f"n={n} not divisible by mesh size {d}")
    row_sharding = NamedSharding(mesh, P(None, axis, None))
    rep = NamedSharding(mesh, P())
    A_sh = jax.device_put(A, row_sharding)

    @jax.jit
    def _mv(Al, v):
        # row-block local matmul; XLA inserts the all-gather of the output
        # rows to satisfy the replicated result sharding
        out = Al @ v
        return jax.lax.with_sharding_constraint(out, rep)

    def make_op(l):
        Al = A_sh[l]

        def op(v):
            v = jax.device_put(jnp.asarray(v), rep)
            return _mv(Al, v)

        return op

    return [make_op(l) for l in range(p)], n, np.dtype(A.dtype)
