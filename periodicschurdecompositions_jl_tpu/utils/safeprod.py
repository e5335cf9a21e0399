"""Overflow-safe signed products in (mantissa, exponent) form.

Behavioral contract from the reference's `_safeprod`
(src/generalized.jl:933-976 and src/utils.jl:90-120): represent

    prod_l x[l]^(±1)  as  alpha / beta * 2^scale

with ``|alpha| ∈ [1,2) ∪ {0}``, ``beta ∈ {0,1}`` (``beta = 0`` encodes an
infinite eigenvalue arising from a zero diagonal in an inverted factor;
``alpha = beta = 0`` encodes 0/0 from a zero in a direct factor meeting a
zero in an inverted one).

The reference renormalizes with repeated multiply/divide-by-2 loops; here the
renormalization is an exact power-of-two rescale via frexp/ldexp, applied
after every factor exactly like the reference so intermediate products never
over/underflow even for p in the thousands.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _ldexp_any(x, k):
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.ldexp(x.real, k) + 1j * jnp.ldexp(x.imag, k)
    return jnp.ldexp(x, k)


def _renorm(alpha, scale):
    """Rescale so |alpha| ∈ [1,2) (alpha == 0 resets scale, like the ref)."""
    mag = jnp.abs(alpha)
    _, e = jnp.frexp(jnp.where(mag == 0, jnp.ones_like(mag), mag))
    # |alpha| = m * 2^e with m in [0.5, 1)  ->  multiply by 2^(1-e)
    k = (1 - e).astype(jnp.int32)
    alpha2 = _ldexp_any(alpha, k)
    scale2 = scale + (e - 1).astype(jnp.int32)
    iszero = mag == 0
    alpha_out = jnp.where(iszero, jnp.zeros_like(alpha), alpha2)
    scale_out = jnp.where(iszero, jnp.zeros_like(scale), scale2)
    return alpha_out, scale_out


def safeprod_signed(x, S: Sequence[bool]) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scaled product of ``x[l] ** (+1 if S[l] else -1)``.

    ``x``: (p,) array (real or complex); ``S``: static sequence of bool.
    Returns (alpha, beta, scale[int32]).  Vectorize with vmap for batches.
    """
    p = x.shape[0]
    assert len(S) == p
    dt = x.dtype
    rdt = jnp.finfo(dt).dtype
    alpha = jnp.ones((), dt)
    beta = jnp.ones((), rdt)
    scale = jnp.zeros((), jnp.int32)
    for l in range(p):
        xl = x[l]
        if S[l]:
            alpha = alpha * xl
        else:
            iszero = xl == 0
            beta = jnp.where(iszero, jnp.zeros_like(beta), beta)
            alpha = jnp.where(iszero, alpha, alpha / jnp.where(iszero, jnp.ones_like(xl), xl))
        alpha, scale = _renorm(alpha, scale)
    return alpha, beta, scale


def safeprod(x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scaled product of all entries (all-positive signature)."""
    return safeprod_signed(x, (True,) * int(x.shape[0]))


def safeprod_signed_split(xre, xim, S) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                jnp.ndarray, jnp.ndarray]:
    """Split-complex ``safeprod_signed``: complex input as (re, im) pairs.

    The axon TPU has no complex dtype; the split QZ core
    (ops/pqz_complex_split.py) accumulates its eigenvalue products through
    this variant.  Returns (alpha_re, alpha_im, beta, scale).
    """
    p = xre.shape[0]
    assert len(S) == p
    rdt = xre.dtype
    ar = jnp.ones((), rdt)
    ai = jnp.zeros((), rdt)
    beta = jnp.ones((), rdt)
    scale = jnp.zeros((), jnp.int32)
    for l in range(p):
        xr, xi = xre[l], xim[l]
        if S[l]:
            ar, ai = ar * xr - ai * xi, ar * xi + ai * xr
        else:
            iszero = (xr == 0) & (xi == 0)
            beta = jnp.where(iszero, jnp.zeros_like(beta), beta)
            d = xr * xr + xi * xi
            ds = jnp.where(iszero, jnp.ones_like(d), d)
            nr = (ar * xr + ai * xi) / ds
            ni = (ai * xr - ar * xi) / ds
            ar = jnp.where(iszero, ar, nr)
            ai = jnp.where(iszero, ai, ni)
        # renorm |alpha| into [1, 2)
        mag = jnp.hypot(ar, ai)
        _, e = jnp.frexp(jnp.where(mag == 0, jnp.ones_like(mag), mag))
        k = (1 - e).astype(jnp.int32)
        ar2, ai2 = jnp.ldexp(ar, k), jnp.ldexp(ai, k)
        scale2 = scale + (e - 1).astype(jnp.int32)
        iszero = mag == 0
        ar = jnp.where(iszero, jnp.zeros_like(ar), ar2)
        ai = jnp.where(iszero, jnp.zeros_like(ai), ai2)
        scale = jnp.where(iszero, jnp.zeros_like(scale), scale2)
    return ar, ai, beta, scale
