"""Masked slab updates on float-float (hi, lo) matrix pairs — XLA glue.

ds mirrors of ops/rotations.py's rowsk/colsk/getel/... used by the
between-sweep logic of the float-float real periodic QR core (deflation
repair chains, 2x2 deflation, forced structural writes).  These run as
plain XLA ops (dynamic slices on any axis are fine outside Pallas); the
hot bulge-chase path uses the Pallas kernels in ops/pallas_sweep.py
instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import ff
from .ff import FF
from .ffkern import matmul3_ff, matmul_right3_ff


def _ds2(H: FF, start, sizes) -> FF:
    return FF(lax.dynamic_slice(H.hi, start, sizes),
              lax.dynamic_slice(H.lo, start, sizes))


def _dus2(H: FF, vals: FF, start) -> FF:
    return FF(lax.dynamic_update_slice(H.hi, vals.hi, start),
              lax.dynamic_update_slice(H.lo, vals.lo, start))


def rowsk_ff(H: FF, i, M: FF, lo=None, hi=None, active=None) -> FF:
    """H[i:i+k, lo:hi] = M @ H[i:i+k, lo:hi] in ds; i/lo/hi traced."""
    k = M.hi.shape[0]
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - k)
    rows = _ds2(H, (i, jnp.int32(0)), (k, n))
    new = matmul3_ff(M, rows)
    if lo is not None or hi is not None:
        col = lax.iota(jnp.int32, n)
        mask = jnp.ones((n,), bool)
        if lo is not None:
            mask &= col >= lo
        if hi is not None:
            mask &= col < hi
        new = ff.where(mask[None, :], new, rows)
    if active is not None:
        new = ff.where(active, new, rows)
    return _dus2(H, new, (i, jnp.int32(0)))


def colsk_ff(H: FF, j, M: FF, lo=None, hi=None, active=None) -> FF:
    """H[lo:hi, j:j+k] = H[lo:hi, j:j+k] @ M in ds."""
    k = M.hi.shape[0]
    m, n = H.hi.shape
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - k)
    cols = _ds2(H, (jnp.int32(0), j), (m, k))
    new = matmul_right3_ff(cols, M)
    if lo is not None or hi is not None:
        row = lax.iota(jnp.int32, m)
        mask = jnp.ones((m,), bool)
        if lo is not None:
            mask &= row >= lo
        if hi is not None:
            mask &= row < hi
        new = ff.where(mask[:, None], new, cols)
    if active is not None:
        new = ff.where(active, new, cols)
    return _dus2(H, new, (jnp.int32(0), j))


def getel_ff(H: FF, i, j) -> FF:
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    v = _ds2(H, (i, j), (1, 1))
    return FF(v.hi[0, 0], v.lo[0, 0])


def setel_ff(H: FF, i, j, val: FF, active=None) -> FF:
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    old = _ds2(H, (i, j), (1, 1))
    new = FF(jnp.reshape(val.hi, (1, 1)), jnp.reshape(val.lo, (1, 1)))
    if active is not None:
        new = ff.where(active, new, old)
    return _dus2(H, new, (i, j))


def getcol_ff(H: FF, i, j, k) -> FF:
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - k)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    v = _ds2(H, (i, j), (k, 1))
    return FF(v.hi[:, 0], v.lo[:, 0])


def setcol_ff(H: FF, i, j, vals: FF, active=None) -> FF:
    k = vals.hi.shape[0]
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - k)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - 1)
    new = FF(vals.hi.reshape(k, 1), vals.lo.reshape(k, 1))
    if active is not None:
        old = _ds2(H, (i, j), (k, 1))
        new = ff.where(active, new, old)
    return _dus2(H, new, (i, j))


def getrow_ff(H: FF, i, j, k) -> FF:
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - k)
    v = _ds2(H, (i, j), (1, k))
    return FF(v.hi[0, :], v.lo[0, :])


def setrow_ff(H: FF, i, j, vals: FF, active=None) -> FF:
    k = vals.hi.shape[0]
    m, n = H.hi.shape
    i = jnp.clip(jnp.asarray(i, jnp.int32), 0, m - 1)
    j = jnp.clip(jnp.asarray(j, jnp.int32), 0, n - k)
    new = FF(vals.hi.reshape(1, k), vals.lo.reshape(1, k))
    if active is not None:
        old = _ds2(H, (i, j), (1, k))
        new = ff.where(active, new, old)
    return _dus2(H, new, (i, j))


def fac_get(H: FF, f) -> FF:
    """Dynamic factor slice H[f] from a stacked (p, n, n) FF."""
    p, m, n = H.hi.shape
    f = jnp.clip(jnp.asarray(f, jnp.int32), 0, p - 1)
    z = jnp.int32(0)
    v = FF(lax.dynamic_slice(H.hi, (f, z, z), (1, m, n)),
           lax.dynamic_slice(H.lo, (f, z, z), (1, m, n)))
    return FF(v.hi[0], v.lo[0])


def fac_set(H: FF, f, M: FF) -> FF:
    p, m, n = H.hi.shape
    f = jnp.clip(jnp.asarray(f, jnp.int32), 0, p - 1)
    z = jnp.int32(0)
    return FF(lax.dynamic_update_slice(H.hi, M.hi[None], (f, z, z)),
              lax.dynamic_update_slice(H.lo, M.lo[None], (f, z, z)))


def at_set(H: FF, idx, M: FF) -> FF:
    """Static-index .at[].set on both components."""
    return FF(H.hi.at[idx].set(M.hi), H.lo.at[idx].set(M.lo))


def triu_ff(H: FF, k: int = 0) -> FF:
    return FF(jnp.triu(H.hi, k), jnp.triu(H.lo, k))
