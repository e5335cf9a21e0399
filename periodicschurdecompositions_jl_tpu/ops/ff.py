"""Float-float (double-single) arithmetic on f32 pairs.

The axon TPU has no native float64: XLA emulates it (x64 rewriter) with a
*weak* addition whose error under cancellation was measured at ~7e-11 —
two decades above the library's <=1e-12 backward-error contract.  This
module provides the contract-grade alternative: every value is an unevaluated
sum ``hi + lo`` of two float32s with ``|lo| <= ulp(hi)/2``, and all operations
use error-free transformations (Knuth two-sum, Dekker/Veltkamp two-product),
giving ~2^-48 unit roundoff at full float32 hardware speed.  Verified exact
on-chip (Mosaic performs no unsafe FP reassociation).

Used by the Pallas sweep kernels (ops/pallas_sweep.py) and the float-float
XLA glue of the TPU-native real periodic QR core (ops/pqr_ff.py).  All
functions are shape-polymorphic (scalars or arrays) and work identically
under XLA and inside Pallas/Mosaic kernels.

Reference parity: these kernels implement the same numerical contracts as
the reference's Float64 element ops (LinearAlgebra primitives used by
/root/reference/src/householder.jl, src/rschur2x2.jl), re-based on a
representation the TPU executes natively.
"""
from __future__ import annotations

import sys as _sys
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Deep trace recursion: the Pallas kernels trace long ds expression
# chains, and kernels traced INSIDE the cores' while/cond nests (the
# fused deflation branch, the rg ladders) stack on top of the cores' own
# trace depth — 20000 frames was exceeded in the round-5 e2e probe
# (results_r5.log 20:26, RecursionError at p=8 n=128).  Raise the Python
# limit AND the main-thread C stack (the frames live there; tests'
# conftest has raised RLIMIT_STACK since round 3 for the same reason).
if _sys.getrecursionlimit() < 100000:
    _sys.setrecursionlimit(100000)
try:
    import resource as _resource
    _soft, _hard = _resource.getrlimit(_resource.RLIMIT_STACK)
    _want = 1 << 28  # 256 MiB
    if _soft != _resource.RLIM_INFINITY and _soft < _want and \
            (_hard == _resource.RLIM_INFINITY or _hard >= _want):
        _resource.setrlimit(_resource.RLIMIT_STACK, (_want, _hard))
except Exception:  # pragma: no cover - platform-dependent
    pass

_SPLIT = 4097.0  # 2^12 + 1: Veltkamp splitter for binary32

# Unit roundoff of normalized double-single arithmetic (conservative).
EPS = 2.0 ** -47
# Smallest safely usable magnitude (float32 subnormals flush to zero on TPU).
TINY = 2.0 ** -120


class FF(NamedTuple):
    """Unevaluated sum hi + lo of two float32 arrays (|lo| <= ulp(hi)/2)."""

    hi: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return self.hi.shape

    def astuple(self):
        return (self.hi, self.lo)


def _f32(x):
    return jnp.asarray(x, jnp.float32)


# ---------------------------------------------------------------------------
# error-free transformations


# Every EFT hides one intermediate behind jax.lax.optimization_barrier:
# XLA's algebraic simplifier applies real-arithmetic rewrites such as
# (a + b) - a -> b, c - (c - a) -> a and sqrt(x)*sqrt(x) -> x that are
# IDENTITIES over the reals but destroy the rounding-error terms these
# transformations exist to capture (measured: f32-level error under jit,
# exact without it).  The barrier generates no code; it only stops
# pattern-matching through the value.


_BARRIERS = True


class no_barriers:
    """Trace-time context: disable EFT optimization barriers.

    Used while tracing Pallas/Mosaic kernels: Mosaic cannot lower
    optimization_barrier AND is verified not to apply the value-changing
    rewrites the barriers guard against.  Everywhere else (XLA:TPU glue)
    the barriers are REQUIRED: the compile environment forces
    --xla_allow_excess_precision=true, under which the algebraic
    simplifier cancels (1+x)-1-style patterns (measured 3e-8 rotation
    normalization error without barriers, 2e-15 with).  XLA:CPU drops
    barriers entirely; the test conftest disables the offending passes
    there instead.
    """

    def __enter__(self):
        global _BARRIERS
        self._saved = _BARRIERS
        _BARRIERS = False

    def __exit__(self, *exc):
        global _BARRIERS
        _BARRIERS = self._saved


def _bar(x):
    if _BARRIERS:
        return jax.lax.optimization_barrier(x)
    return x


def two_sum(a, b):
    """s + e == a + b exactly (Knuth; no magnitude precondition)."""
    a, b = _bar((a, b))
    s = _bar(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (or a == 0)."""
    a, b = _bar((a, b))
    s = _bar(a + b)
    e = b - (s - a)
    return s, e


def split(a):
    """Veltkamp split: a == ahi + alo with 12-bit halves (f32)."""
    a = _bar(a)
    c = _bar(_f32(_SPLIT) * a)
    ahi = c - (c - a)
    alo = a - ahi
    return ahi, alo


def two_prod(a, b):
    """p + e == a * b exactly (Dekker, via Veltkamp splits)."""
    a, b = _bar((a, b))
    p = _bar(a * b)
    ahi, alo = split(a)
    bhi, blo = split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def two_prod_presplit(a, ahi, alo, b, bhi, blo):
    """two_prod with both operands already split (hot-loop amortization)."""
    p = _bar(a * b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# construction / conversion


def ff(hi, lo=None) -> FF:
    hi = _f32(hi)
    return FF(hi, jnp.zeros_like(hi) if lo is None else _f32(lo))


def from_f64(x) -> FF:
    """Split a float64 array (host numpy or jax) into an exact (hi, lo) pair.

    Exact when done in true float64 (CPU); on TPU the x64 rewriter's pair
    representation makes the same split exact as well.
    """
    hi = jnp.asarray(x).astype(jnp.float32)
    lo = (jnp.asarray(x) - hi.astype(x.dtype)).astype(jnp.float32)
    return FF(hi, lo)


def to_f64(x: FF, dtype=jnp.float64):
    return x.hi.astype(dtype) + x.lo.astype(dtype)


def zeros(shape=(), dtype=jnp.float32) -> FF:
    z = jnp.zeros(shape, dtype)
    return FF(z, z)


def full_like(x: FF, v) -> FF:
    return FF(jnp.full_like(x.hi, v), jnp.zeros_like(x.lo))


# ---------------------------------------------------------------------------
# arithmetic (all renormalizing: output satisfies the ds invariant)


def add(x: FF, y: FF) -> FF:
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    s, e = fast_two_sum(s, e)
    return FF(s, e)


def sub(x: FF, y: FF) -> FF:
    return add(x, neg(y))


def neg(x: FF) -> FF:
    return FF(-x.hi, -x.lo)


def abs_(x: FF) -> FF:
    flip = x.hi < 0
    return FF(jnp.where(flip, -x.hi, x.hi), jnp.where(flip, -x.lo, x.lo))


def add_f(x: FF, y) -> FF:
    """x + y with y a plain float32."""
    s, e = two_sum(x.hi, _f32(y))
    e = e + x.lo
    s, e = fast_two_sum(s, e)
    return FF(s, e)


def mul(x: FF, y: FF) -> FF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    p, e = fast_two_sum(p, e)
    return FF(p, e)


def mul_f(x: FF, y) -> FF:
    """x * y with y a plain float32."""
    y = _f32(y)
    p, e = two_prod(x.hi, y)
    e = e + x.lo * y
    p, e = fast_two_sum(p, e)
    return FF(p, e)


def mul_pow2(x: FF, y) -> FF:
    """x * y for y an exact power of two (both components scale exactly)."""
    y = _f32(y)
    return FF(x.hi * y, x.lo * y)


def sq(x: FF) -> FF:
    p, e = two_prod(x.hi, x.hi)
    e = e + 2.0 * (x.hi * x.lo)
    p, e = fast_two_sum(p, e)
    return FF(p, e)


def div(x: FF, y: FF) -> FF:
    yh = jnp.where(y.hi == 0, _f32(1.0), y.hi)
    q1 = x.hi / yh
    r = sub(x, mul_f(y, q1))
    q2 = r.hi / yh
    r2 = sub(r, mul_f(y, q2))
    q3 = r2.hi / yh
    q, e = fast_two_sum(q1, q2)
    e = e + q3
    q, e = fast_two_sum(q, e)
    zero_num = x.hi == 0
    q = jnp.where(zero_num, jnp.zeros_like(q), q)
    e = jnp.where(zero_num, jnp.zeros_like(e), e)
    return FF(q, e)


def recip(y: FF) -> FF:
    one = full_like(y, 1.0)
    return div(one, y)


def recip_fast(y: FF) -> FF:
    """1/y via one ds Newton step from the f32 quotient (~1.5 ulp_ds).

    ONE hardware divide instead of ``div``'s three: q = q1 (1 + r) with
    q1 = fl(1/y.hi) and r = 1 - y q1 captured by EFT — ``1 - p`` is exact
    by Sterbenz (p = fl(y.hi q1) lies in [0.5, 2]), so the residual is
    accurate to ~2^-48 and the corrected quotient to ~1.5 ulp of ds.
    NOT used on the reflector/Givens generation chains: its ~7 ulp_ds
    worst-case lands directly in generated r/beta values that are WRITTEN
    INTO H, which the round-3 accuracy bisect measured at 2.4x end-to-end
    backward error — generation uses the exact ``recip``.  Kept for
    non-accuracy-critical consumers.  Caller guards y != 0 (y.hi == 0
    returns junk, like an unguarded divide).
    """
    yh = jnp.where(y.hi == 0, _f32(1.0), y.hi)
    q1 = _bar(_f32(1.0) / yh)
    p, e = two_prod(yh, q1)
    r = (_f32(1.0) - p) - (e + y.lo * q1)
    q, err = fast_two_sum(q1, q1 * r)
    return FF(q, err)


def div_fast(x: FF, y: FF) -> FF:
    """x/y with two hardware divides (~1.5 ulp_ds) instead of ``div``'s
    three: the dropped third refinement only upgrades ~1 ulp_ds accuracy
    to near-correct rounding, which no generation-chain consumer needs.
    Same zero-numerator exactness as ``div``; caller guards y != 0.
    """
    yh = jnp.where(y.hi == 0, _f32(1.0), y.hi)
    q1 = _bar(x.hi / yh)
    r = sub(x, mul_f(y, q1))
    q2 = (r.hi + r.lo) / yh
    q, e = fast_two_sum(q1, q2)
    zero_num = x.hi == 0
    q = jnp.where(zero_num, jnp.zeros_like(q), q)
    e = jnp.where(zero_num, jnp.zeros_like(e), e)
    return FF(q, e)


def sqrt(x: FF) -> FF:
    """sqrt for x >= 0 (x < 0 is caller error; x == 0 handled exactly)."""
    s1 = jnp.sqrt(x.hi)
    s1 = _bar(s1)
    ssafe = jnp.where(s1 == 0, _f32(1.0), s1)
    # one ds Newton step: s = s1 + (x - s1^2) / (2 s1)
    p, e = two_prod(s1, s1)
    r = add(x, FF(-p, -e))
    d = r.hi / (2.0 * ssafe) + r.lo / (2.0 * ssafe)
    s, e2 = fast_two_sum(s1, d)
    iszero = x.hi == 0
    return FF(jnp.where(iszero, jnp.zeros_like(s), s),
              jnp.where(iszero, jnp.zeros_like(e2), e2))


def fma(a: FF, b: FF, c: FF) -> FF:
    """a * b + c in ds precision."""
    return add(mul(a, b), c)


# ---------------------------------------------------------------------------
# comparisons / selection (inputs assumed normalized)


def lt(x: FF, y: FF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def le(x: FF, y: FF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo <= y.lo))


def gt(x: FF, y: FF):
    return lt(y, x)


def ge(x: FF, y: FF):
    return le(y, x)


def eq0(x: FF):
    return (x.hi == 0) & (x.lo == 0)


def where(c, x: FF, y: FF) -> FF:
    return FF(jnp.where(c, x.hi, y.hi), jnp.where(c, x.lo, y.lo))


def maximum(x: FF, y: FF) -> FF:
    return where(ge(x, y), x, y)


def minimum(x: FF, y: FF) -> FF:
    return where(le(x, y), x, y)


def copysign(mag: FF, sgn) -> FF:
    """|mag| with the sign of the plain array ``sgn`` (>= 0 counts +)."""
    a = abs_(mag)
    return where(sgn >= 0, a, neg(a))


# ---------------------------------------------------------------------------
# reductions / structural helpers


def sum_(x: FF, axis: int) -> FF:
    """ds sum along ``axis`` via a halving tree (len need not be a pow2)."""
    hi = jnp.moveaxis(x.hi, axis, 0)
    lo = jnp.moveaxis(x.lo, axis, 0)
    n = hi.shape[0]
    while n > 1:
        half = n // 2
        a = FF(hi[:half], lo[:half])
        b = FF(hi[half:2 * half], lo[half:2 * half])
        s = add(a, b)
        if n % 2:
            hi = jnp.concatenate([s.hi, hi[2 * half:]], axis=0)
            lo = jnp.concatenate([s.lo, lo[2 * half:]], axis=0)
            n = half + 1
        else:
            hi, lo = s.hi, s.lo
            n = half
    return FF(hi[0], lo[0])


def dot(x: FF, y: FF, axis: int = -1) -> FF:
    """ds inner product along ``axis`` (error-free products, tree sum)."""
    return sum_(mul(x, y), axis if axis >= 0 else x.hi.ndim + axis)


def stack(xs, axis=0) -> FF:
    return FF(jnp.stack([x.hi for x in xs], axis),
              jnp.stack([x.lo for x in xs], axis))


def concat(xs, axis=0) -> FF:
    return FF(jnp.concatenate([x.hi for x in xs], axis),
              jnp.concatenate([x.lo for x in xs], axis))


def index(x: FF, idx) -> FF:
    return FF(x.hi[idx], x.lo[idx])


def scale_rows(x: FF, s: FF) -> FF:
    """Row-broadcast multiply (s shape broadcastable against x)."""
    return mul(x, s)


# ---------------------------------------------------------------------------
# scaled norms (safe against overflow/underflow in the f32 exponent range)


def hypot2(a: FF, b: FF) -> FF:
    aa, ab = abs_(a), abs_(b)
    m = maximum(aa, ab)
    msafe = where(eq0(m), full_like(m, 1.0), m)
    xa = div(aa, msafe)
    xb = div(ab, msafe)
    r = mul(m, sqrt(add(sq(xa), sq(xb))))
    return where(eq0(m), m, r)


def hypot3(a: FF, b: FF, c: FF) -> FF:
    aa, ab, ac = abs_(a), abs_(b), abs_(c)
    m = maximum(maximum(aa, ab), ac)
    msafe = where(eq0(m), full_like(m, 1.0), m)
    xa = div(aa, msafe)
    xb = div(ab, msafe)
    xc = div(ac, msafe)
    r = mul(m, sqrt(add(add(sq(xa), sq(xb)), sq(xc))))
    return where(eq0(m), m, r)
