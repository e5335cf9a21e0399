"""Element kernels in float-float arithmetic: reflectors, Givens, dlanv2.

Double-single ports of ops/householder.py (xLARFG semantics, reference
src/householder.jl:66-108), ops/rotations.givens_real (dlartg semantics)
and ops/lanv2.py (dlanv2, reference src/rschur2x2.jl:9-96), used by the
TPU-native float-float real periodic QR core.  Everything is branchless
(where-selects) and works identically in XLA glue and inside Pallas/Mosaic
kernels.

The LAPACK underflow-rescue loop is replaced by max-scaling throughout:
the ds exponent range is float32's, and all norms/divisions scale by the
max magnitude first, which covers the representable range without the
rescue iteration (matrices reaching the cores are O(norm) scaled).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ff
from .ff import FF


def _safe(x: FF) -> FF:
    return ff.where(ff.eq0(x), ff.full_like(x, 1.0), x)


# Generation-input prescaling: ds arithmetic degrades once the lo components
# (and the EFT error terms of squares) reach the f32 subnormal range —
# measured reflector orthogonality 6e-13 at input scale 1e-25, 4e-7 at
# 1e-30, NaN at <=1e-34, which is exactly how near-converged bulge entries
# corrupted Z at n >= 32.  Multiplying by a power of two is EXACT on both
# components, and tau/w/c/s are scale-invariant, so a conditional 2^96
# scale-up restores full ds consistency for all representable inputs.
_SCL_THRESH = 2.0 ** -40
_SCL_UP = 2.0 ** 96
_SCL_DOWN = 2.0 ** -96


def _prescale(mx):
    """(s, inv): exact power-of-two scale factor for tiny generation inputs."""
    s = jnp.where(mx < jnp.float32(_SCL_THRESH), jnp.float32(_SCL_UP),
                  jnp.float32(1.0))
    inv = jnp.where(mx < jnp.float32(_SCL_THRESH), jnp.float32(_SCL_DOWN),
                    jnp.float32(1.0))
    return s, inv


def _sgn_hi(x: FF):
    """Fortran SIGN convention on the hi component (sign(0) == +1)."""
    return jnp.where(x.hi >= 0, jnp.ones_like(x.hi), -jnp.ones_like(x.hi))


def reflector_ff(x: FF):
    """xLARFG on a small static FF vector (pivot first; inactive slots zero).

    Returns (w, tau, beta): w[0] == 1, P = I - tau w w^T, P x = [beta, 0...].
    Mirrors ops/householder.reflector_small (reference src/householder.jl:
    66-108) in ds arithmetic.
    """
    k = x.hi.shape[0]
    s_, inv_ = _prescale(jnp.max(jnp.abs(x.hi)))
    x = FF(x.hi * s_, x.lo * s_)
    alpha = ff.index(x, 0)
    tail = ff.index(x, slice(1, k))
    # scaled tail norm
    if k == 2:
        xnorm = ff.abs_(ff.index(tail, 0))
    elif k == 3:
        xnorm = ff.hypot2(ff.index(tail, 0), ff.index(tail, 1))
    else:
        a = ff.abs_(tail)
        m = FF(jnp.max(a.hi), a.lo[jnp.argmax(a.hi)])
        ms = _safe(m)
        t = ff.div(tail, FF(jnp.broadcast_to(ms.hi, tail.hi.shape),
                            jnp.broadcast_to(ms.lo, tail.lo.shape)))
        xnorm = ff.mul(m, ff.sqrt(ff.sum_(ff.sq(t), 0)))
    trivial = ff.eq0(xnorm)

    beta = ff.neg(ff.copysign(ff.hypot2(alpha, xnorm), alpha.hi))
    denom = _safe(ff.sub(alpha, beta))
    dinv = ff.recip(denom)
    vtail = ff.mul(tail, FF(jnp.broadcast_to(dinv.hi, tail.hi.shape),
                            jnp.broadcast_to(dinv.lo, tail.lo.shape)))
    # tau refit: 2 / ||w||^2 makes P = I - tau w w^T an EXACT reflection
    # for whatever w was computed (P's orthogonality defect ~1 ulp instead
    # of the ~5 ulp the (beta-alpha)/beta formula inherits from the
    # hypot/div chain); in exact arithmetic the two coincide, and the
    # annihilation residual stays O(u|x|) either way.  The per-transform
    # orthogonality defect is what accumulates into Z drift / backward
    # error over the sweep chains.
    w2 = ff.add_f(ff.sum_(ff.sq(vtail), 0), jnp.float32(1.0))
    tau = ff.mul_pow2(ff.recip(w2), jnp.float32(2.0))

    tau = ff.where(trivial, ff.zeros(()), tau)
    vtail = ff.where(trivial, ff.zeros(vtail.hi.shape), vtail)
    beta = ff.where(trivial, alpha, beta)
    beta = FF(beta.hi * inv_, beta.lo * inv_)
    w = ff.concat([ff.ff(jnp.ones((1,), jnp.float32)), vtail], 0)
    return w, tau, beta


def eye32(k: int):
    """f32 identity via int32 iotas: jnp.eye builds an int64 iota under
    x64, and 64-bit types are unlowerable inside Mosaic kernels."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (r == c).astype(jnp.float32)


def reflector3s_ff(x: FF):
    """xLARFG on a 3-slot FF vector, built purely from scalar extracts.

    Mosaic's layout inference crashes on sub-slices/concats of tiny 1D
    vectors inside nested loops; this variant only ever extracts scalars
    and stacks fresh vectors, making it safe inside Pallas kernels.
    Semantics identical to :func:`reflector_ff` with a 3-slot input
    (slot 2 may be zero for the 2-element case).
    """
    s_, inv_ = _prescale(jnp.maximum(jnp.abs(x.hi[0]),
                                     jnp.maximum(jnp.abs(x.hi[1]),
                                                 jnp.abs(x.hi[2]))))
    x0 = FF(x.hi[0] * s_, x.lo[0] * s_)
    x1 = FF(x.hi[1] * s_, x.lo[1] * s_)
    x2 = FF(x.hi[2] * s_, x.lo[2] * s_)
    xnorm = ff.hypot2(x1, x2)
    trivial = ff.eq0(xnorm)
    beta = ff.neg(ff.copysign(ff.hypot2(x0, xnorm), x0.hi))
    dinv = ff.recip(_safe(ff.sub(x0, beta)))
    v1 = ff.mul(x1, dinv)
    v2 = ff.mul(x2, dinv)
    # tau refit to 2/||w||^2: exact-reflection orthogonality (~1 ulp
    # defect) — see reflector_ff
    w2 = ff.add_f(ff.add(ff.sq(v1), ff.sq(v2)), jnp.float32(1.0))
    tau = ff.mul_pow2(ff.recip(w2), jnp.float32(2.0))
    tau = ff.where(trivial, ff.zeros(()), tau)
    beta = ff.where(trivial, x0, beta)
    beta = FF(beta.hi * inv_, beta.lo * inv_)
    zero = ff.zeros(())
    v1 = ff.where(trivial, zero, v1)
    v2 = ff.where(trivial, zero, v2)
    one = ff.ff(jnp.float32(1.0))
    w = FF(jnp.stack([one.hi, v1.hi, v2.hi]),
           jnp.stack([one.lo, v1.lo, v2.lo]))
    return w, tau, beta


def reflector3b_ff(x0: FF, x1: FF, x2: FF):
    """Batched xLARFG on B 3-slot vectors given as (B,)-shaped components.

    Vectorized :func:`reflector3s_ff`: one ds op chain covers all B rows
    (the multi-bulge sweep batches the per-bulge generation chains this
    way — the chain is issue-bound, so B bulges cost one bulge's ops).
    Returns (v1, v2, tau, beta) with the implicit w = [1, v1, v2] per row.
    """
    s_, inv_ = _prescale(jnp.maximum(jnp.abs(x0.hi),
                                     jnp.maximum(jnp.abs(x1.hi),
                                                 jnp.abs(x2.hi))))
    x0 = FF(x0.hi * s_, x0.lo * s_)
    x1 = FF(x1.hi * s_, x1.lo * s_)
    x2 = FF(x2.hi * s_, x2.lo * s_)
    xnorm = ff.hypot2(x1, x2)
    trivial = ff.eq0(xnorm)
    beta = ff.neg(ff.copysign(ff.hypot2(x0, xnorm), x0.hi))
    dinv = ff.recip(_safe(ff.sub(x0, beta)))
    v1 = ff.mul(x1, dinv)
    v2 = ff.mul(x2, dinv)
    # tau refit to 2/||w||^2: exact-reflection orthogonality (~1 ulp
    # defect) — see reflector_ff
    w2 = ff.add_f(ff.add(ff.sq(v1), ff.sq(v2)), jnp.float32(1.0))
    tau = ff.mul_pow2(ff.recip(w2), jnp.float32(2.0))
    zero = ff.zeros(x0.hi.shape)
    tau = ff.where(trivial, zero, tau)
    beta = ff.where(trivial, x0, beta)
    beta = FF(beta.hi * inv_, beta.lo * inv_)
    v1 = ff.where(trivial, zero, v1)
    v2 = ff.where(trivial, zero, v2)
    return v1, v2, tau, beta


def _pow2_normalize(m):
    """(s, inv): EXACT power-of-two pair with ``m * s`` in [2^-4, 2^4).

    Branchless compare ladder (5 levels, ~25 cheap f32 ops) — no divides,
    no transcendentals, Mosaic-safe.  Scaling hi/lo components by an exact
    power of two preserves the ds invariant exactly.  ``m == 0`` (or
    subnormal, which compares == 0 under DAZ) returns (1, 1).
    """
    one = jnp.ones_like(m)
    s = one
    inv = one
    for j in (64, 32, 16, 8, 4):
        up = jnp.float32(2.0 ** j)
        dn = jnp.float32(2.0 ** -j)
        ms = m * s
        big = ms >= up
        small = (ms < dn) & (m > 0)
        s = jnp.where(big, s * dn, jnp.where(small, s * up, s))
        inv = jnp.where(big, inv * up, jnp.where(small, inv * dn, inv))
    return s, inv


def refl3_fused_flat(x0: FF, x1: FF, x2: FF):
    """Fused xLARFG + reflector matrix on 3-vectors, component layout.

    Returns (M, beta): M the 9 row-major FF entries [m00..m22] of
    P = I - s u u^T with u = [x0 - beta, x1, x2] and s = 2/||u||^2,
    so P [x0, x1, x2]^T = [beta, 0, 0]^T.  Shape-polymorphic (scalars for
    the sequential kernel-A chain, (B,) for the batched multi-bulge
    chains).

    Same reflection as reflector3s_ff + refl_mat_s_ff (xLARFG semantics,
    reference src/householder.jl:66-108), in the TAU-REFIT parametrization
    (w = [1, v1, v2], tau = 2/(1 + ||v||^2)) with exact ds reciprocals —
    the record-era generation numerics.  The fused layout still saves the
    two max-scaled hypots (one sqrt on prescaled squares) and builds the
    3x3 directly; only the once-tried s = 2/(r (r + |x0|)) shortcut and
    the fast one-divide reciprocal are gone (each cost ~2x end-to-end
    backward error; round-3 bisect, STATUS.md).  The exact power-of-two
    prescale keeps every square in the normal f32 range.
    """
    m = jnp.maximum(jnp.abs(x0.hi), jnp.maximum(jnp.abs(x1.hi),
                                                jnp.abs(x2.hi)))
    s_, inv_ = _pow2_normalize(m)
    x0 = FF(x0.hi * s_, x0.lo * s_)
    x1 = FF(x1.hi * s_, x1.lo * s_)
    x2 = FF(x2.hi * s_, x2.lo * s_)
    t = ff.add(ff.sq(x1), ff.sq(x2))          # tail norm^2 (>= 0)
    trivial = ff.eq0(t)
    r = ff.sqrt(ff.add(ff.sq(x0), t))          # ||x||
    beta = ff.neg(ff.copysign(r, x0.hi))
    u0 = ff.sub(x0, beta)                      # |u0| = |x0| + r: no cancel
    # tau-refit parametrization (w = [1, v1, v2], tau = 2/(1 + ||v||^2)):
    # the exact leading '1 +' anchors tau's dominant term, so for graded
    # columns (tiny tails) the reflection defect scales with ||v||^2
    # instead of a full-magnitude ds product chain.  The earlier
    # s = 2/(r (r + |x0|)) form measured 2x worse end-to-end (round-3
    # accuracy bisect: pipeline 5.5e-14 -> 1.09e-13 at p=2 n=12), and
    # the fast one-divide reciprocal another 2.4x on top — generation is
    # ~0.09 ms/step of the sweep's 0.47, so exactness wins here.
    dinv = ff.recip(_safe(u0))
    v1 = ff.mul(x1, dinv)
    v2 = ff.mul(x2, dinv)
    w2 = ff.add_f(ff.add(ff.sq(v1), ff.sq(v2)), jnp.float32(1.0))
    tau = ff.mul_pow2(ff.recip(w2), jnp.float32(2.0))
    zero = ff.zeros(x0.hi.shape)
    tau = ff.where(trivial, zero, tau)
    v1 = ff.where(trivial, zero, v1)
    v2 = ff.where(trivial, zero, v2)
    beta = ff.where(trivial, x0, beta)
    beta = FF(beta.hi * inv_, beta.lo * inv_)
    tv1 = ff.mul(tau, v1)
    tv2 = ff.mul(tau, v2)
    one = jnp.float32(1.0)
    m00 = ff.add_f(ff.neg(tau), one)
    m01 = ff.neg(tv1)
    m02 = ff.neg(tv2)
    m11 = ff.add_f(ff.neg(ff.mul(tv1, v1)), one)
    m12 = ff.neg(ff.mul(tv1, v2))
    m22 = ff.add_f(ff.neg(ff.mul(tv2, v2)), one)
    # P is symmetric: m10 = m01, m20 = m02, m21 = m12
    return [m00, m01, m02, m01, m11, m12, m02, m12, m22], beta


def refl2_fused_flat(x0: FF, x1: FF, active=None):
    """2-slot companion of :func:`refl3_fused_flat`.

    Returns (M, beta): M the 4 row-major FF entries [e00, e01, e10, e11]
    of the 2x2 reflection annihilating x1.  ``active`` (bool, same shape):
    rows where False get the identity (the nr3 < 3 chase case).
    """
    m = jnp.maximum(jnp.abs(x0.hi), jnp.abs(x1.hi))
    s_, inv_ = _pow2_normalize(m)
    x0 = FF(x0.hi * s_, x0.lo * s_)
    x1 = FF(x1.hi * s_, x1.lo * s_)
    t = ff.sq(x1)
    trivial = ff.eq0(t)
    r = ff.sqrt(ff.add(ff.sq(x0), t))
    beta = ff.neg(ff.copysign(r, x0.hi))
    u0 = ff.sub(x0, beta)
    # tau-refit parametrization — see refl3_fused_flat (round-3 bisect)
    dinv = ff.recip(_safe(u0))
    v1 = ff.mul(x1, dinv)
    w2 = ff.add_f(ff.sq(v1), jnp.float32(1.0))
    tau = ff.mul_pow2(ff.recip(w2), jnp.float32(2.0))
    zero = ff.zeros(x0.hi.shape)
    dead = trivial if active is None else (trivial | (~active))
    tau = ff.where(dead, zero, tau)
    v1 = ff.where(dead, zero, v1)
    beta = ff.where(trivial, x0, beta)
    beta = FF(beta.hi * inv_, beta.lo * inv_)
    tv1 = ff.mul(tau, v1)
    one = jnp.float32(1.0)
    e00 = ff.add_f(ff.neg(tau), one)
    e01 = ff.neg(tv1)
    e11 = ff.add_f(ff.neg(ff.mul(tv1, v1)), one)
    return [e00, e01, e01, e11], beta


def refl_mat3b_flat(v1: FF, v2: FF, tau: FF):
    """I - tau w w^T for batched w = [1, v1, v2]: 9 row-major (B,) FF
    entries [m00..m22] (flat layout; Mosaic-safe — no tiny 2D arrays)."""
    tw0 = ff.neg(tau)
    tw1 = ff.neg(ff.mul(tau, v1))
    tw2 = ff.neg(ff.mul(tau, v2))
    one = jnp.float32(1.0)
    m00 = ff.add_f(tw0, one)
    m01 = ff.mul(tw0, v1)
    m02 = ff.mul(tw0, v2)
    m10 = tw1
    m11 = ff.add_f(ff.mul(tw1, v1), one)
    m12 = ff.mul(tw1, v2)
    m20 = tw2
    m21 = ff.mul(tw2, v1)
    m22 = ff.add_f(ff.mul(tw2, v2), one)
    return [m00, m01, m02, m10, m11, m12, m20, m21, m22]


def refl_mat2b_flat(v1: FF, tau: FF, active=None):
    """I - tau w w^T for batched w = [1, v1]: 4 row-major (B,) FF entries
    [e00, e01, e10, e11].  ``active`` (bool (B,)): rows where False get the
    identity (the nr3 < 3 case of the chase)."""
    one = jnp.float32(1.0)
    tw1 = ff.neg(ff.mul(tau, v1))
    e00 = ff.add_f(ff.neg(tau), one)
    e01 = ff.mul(ff.neg(tau), v1)
    e10 = tw1
    e11 = ff.add_f(ff.mul(tw1, v1), one)
    if active is not None:
        eye1 = ff.ff(jnp.ones_like(tau.hi))
        zer = ff.zeros(tau.hi.shape)
        e00 = ff.where(active, e00, eye1)
        e01 = ff.where(active, e01, zer)
        e10 = ff.where(active, e10, zer)
        e11 = ff.where(active, e11, eye1)
    return [e00, e01, e10, e11]


def fuse32b_flat(M3, M2):
    """Batched fused per-step transform F = M3 @ E(M2) in flat layout.

    M3: 9 (B,) FF entries, M2: 4 (B,) FF entries (E = diag-embed of M2 on
    rows/cols 1..2).  Returns 9 (B,) FF entries.  Mirrors
    pallas_sweep._fuse32_ff.
    """
    out = []
    for r in range(3):
        e0 = M3[r * 3 + 0]
        e1 = ff.add(ff.mul(M3[r * 3 + 1], M2[0]),
                    ff.mul(M3[r * 3 + 2], M2[2]))
        e2 = ff.add(ff.mul(M3[r * 3 + 1], M2[1]),
                    ff.mul(M3[r * 3 + 2], M2[3]))
        out += [e0, e1, e2]
    return out


def refl_mat_ff(w: FF, tau: FF) -> FF:
    """Dense k x k FF matrix I - tau w w^T."""
    k = w.hi.shape[0]
    tw = ff.mul(FF(jnp.broadcast_to(tau.hi, (k,)),
                   jnp.broadcast_to(tau.lo, (k,))), w)
    outer = ff.mul(FF(tw.hi[:, None], tw.lo[:, None]),
                   FF(w.hi[None, :], w.lo[None, :]))
    return ff.sub(ff.ff(eye32(k)), outer)


def refl_mat_s_ff(w: FF, tau: FF, k: int) -> FF:
    """I - tau w w^T as a (k,k) FF built from scalar extracts only
    (Mosaic-kernel-safe companion of :func:`reflector3s_ff`)."""
    rows_hi, rows_lo = [], []
    for r in range(k):
        eh, el = [], []
        for c in range(k):
            wr = FF(w.hi[r], w.lo[r])
            wc = FF(w.hi[c], w.lo[c])
            e = ff.neg(ff.mul(ff.mul(tau, wr), wc))
            if r == c:
                e = ff.add_f(e, jnp.float32(1.0))
            eh.append(e.hi)
            el.append(e.lo)
        rows_hi.append(jnp.stack(eh))
        rows_lo.append(jnp.stack(el))
    return FF(jnp.stack(rows_hi), jnp.stack(rows_lo))


def matmul3_ff(M: FF, rows: FF) -> FF:
    """(k,k) FF @ (k, ...) FF with k static-small (unrolled ds dot)."""
    k = M.hi.shape[0]
    outs = []
    for r in range(k):
        acc = ff.mul(FF(M.hi[r, 0], M.lo[r, 0]),
                     FF(rows.hi[0], rows.lo[0]))
        for s in range(1, k):
            acc = ff.add(acc, ff.mul(FF(M.hi[r, s], M.lo[r, s]),
                                     FF(rows.hi[s], rows.lo[s])))
        outs.append(acc)
    return ff.stack(outs, 0)


def matmul_right3_ff(cols: FF, M: FF) -> FF:
    """(..., k) FF @ (k,k) FF — column-slab right multiply."""
    k = M.hi.shape[0]
    outs = []
    for c in range(k):
        acc = ff.mul(FF(cols.hi[..., 0], cols.lo[..., 0]),
                     FF(M.hi[0, c], M.lo[0, c]))
        for s in range(1, k):
            acc = ff.add(acc, ff.mul(FF(cols.hi[..., s], cols.lo[..., s]),
                                     FF(M.hi[s, c], M.lo[s, c])))
        outs.append(acc)
    return ff.stack(outs, -1)


def givens_ff(f: FF, g: FF):
    """Real Givens in ds: (c, s, r) with [c s; -s c] [f; g] = [r; 0], c >= 0.

    dlartg semantics as in ops/rotations.givens_real: g == 0 -> (1, 0, f)
    exactly; f == 0 -> (0, sign(g), |g|).
    """
    s_, inv_ = _prescale(jnp.maximum(jnp.abs(f.hi), jnp.abs(g.hi)))
    f = FF(f.hi * s_, f.lo * s_)
    g = FF(g.hi * s_, g.lo * s_)
    af, ag = ff.abs_(f), ff.abs_(g)
    scale = ff.maximum(af, ag)
    sc = _safe(scale)
    # shared-denominator reciprocal + muls; EXACT ds recip — the fast
    # one-divide variant put ~7 ulp_ds into r, which is WRITTEN INTO H
    # (the orthogonality renorm below fixes c/s but not r; round-3
    # accuracy bisect measured the fast-recip commit at 2.4x end-to-end
    # backward error)
    scinv = ff.recip(sc)
    fs, gs = ff.mul(f, scinv), ff.mul(g, scinv)
    d = ff.mul(sc, ff.sqrt(ff.add(ff.sq(fs), ff.sq(gs))))
    dsafe = _safe(d)
    r_gen = ff.where(f.hi >= 0, d, ff.neg(d))
    dinv = ff.recip(dsafe)
    c_gen = ff.mul(af, dinv)
    # s = g / r with r = sign(f) d: fold the sign into the reciprocal
    s_gen = ff.mul(g, ff.where(f.hi >= 0, dinv, ff.neg(dinv)))
    # orthogonality renorm: one Newton step of 1/sqrt about h = c^2+s^2
    # ((3-h)/2, exact to O(u^2)) drops the rotation's orthogonality defect
    # from the ~3-5 ulp of the div/sqrt chain to ~1 ulp — the per-transform
    # defect is what accumulates into Z drift over the sweep chains
    h = ff.add(ff.sq(c_gen), ff.sq(s_gen))
    corr = ff.mul_pow2(ff.sub(ff.ff(jnp.float32(3.0)), h),
                       jnp.float32(0.5))
    c_gen = ff.mul(c_gen, corr)
    s_gen = ff.mul(s_gen, corr)
    one = ff.ff(jnp.float32(1.0))
    zero = ff.zeros(())
    sgn_g = ff.where(g.hi >= 0, one, ff.neg(one))
    g0 = ff.eq0(g)
    f0 = ff.eq0(f)
    c = ff.where(g0, one, ff.where(f0, zero, c_gen))
    s = ff.where(g0, zero, ff.where(f0, sgn_g, s_gen))
    r = ff.where(g0, f, ff.where(f0, ag, r_gen))
    r = FF(r.hi * inv_, r.lo * inv_)
    return c, s, r


def lanv2_ff(a: FF, b: FF, c: FF, d: FF):
    """dlanv2 in ds arithmetic (port of ops/lanv2.lanv2, reference
    src/rschur2x2.jl:9-96).  Returns (a, b, c, d, cs, sn, w1r, w1i, w2r, w2i)
    as FF values; eigenvalues as real/imag pairs (complex-free)."""
    one = ff.ff(jnp.float32(1.0))
    zero = ff.zeros(())
    half = jnp.float32(0.5)
    small = jnp.float32(4.0 * ff.EPS)

    # ---- branch B4 (general case) -------------------------------------
    temp = ff.sub(a, d)
    p = ff.mul_pow2(temp, half)
    ab_, ac_ = ff.abs_(b), ff.abs_(c)
    bcmax = ff.maximum(ab_, ac_)
    bcmis = ff.mul(ff.minimum(ab_, ac_),
                   FF(_sgn_hi(b) * _sgn_hi(c), jnp.zeros_like(b.hi)))
    scale = ff.maximum(ff.abs_(p), bcmax)
    scs = _safe(scale)
    z = ff.add(ff.mul(ff.div(p, scs), p), ff.mul(ff.div(bcmax, scs), bcmis))

    # B4a: z >= small -> real eigenvalues
    zpos = ff.where(z.hi >= 0, z, zero)
    z4a = ff.add(p, ff.copysign(ff.mul(ff.sqrt(scs), ff.sqrt(zpos)), p.hi))
    z4as = _safe(z4a)
    a4a = ff.add(d, z4a)
    d4a = ff.sub(d, ff.mul(ff.div(bcmax, z4as), bcmis))
    tau4a = _safe(ff.hypot2(c, z4a))
    cs4a = ff.div(z4a, tau4a)
    sn4a = ff.div(c, tau4a)
    b4a = ff.sub(b, c)
    c4a = zero

    # B4b: complex or almost-equal real eigenvalues
    sigma = ff.add(b, c)
    tau4b = _safe(ff.hypot2(sigma, temp))
    cs4b = ff.sqrt(ff.mul_pow2(ff.add(one, ff.div(ff.abs_(sigma), tau4b)),
                               half))
    sn4b = ff.neg(ff.mul(ff.div(p, ff.mul(tau4b, _safe(cs4b))),
                         FF(_sgn_hi(sigma), jnp.zeros_like(sigma.hi))))
    aa = ff.add(ff.mul(a, cs4b), ff.mul(b, sn4b))
    bb = ff.add(ff.neg(ff.mul(a, sn4b)), ff.mul(b, cs4b))
    cc = ff.add(ff.mul(c, cs4b), ff.mul(d, sn4b))
    dd = ff.add(ff.neg(ff.mul(c, sn4b)), ff.mul(d, cs4b))
    a_ = ff.add(ff.mul(aa, cs4b), ff.mul(cc, sn4b))
    b_ = ff.add(ff.mul(bb, cs4b), ff.mul(dd, sn4b))
    c_ = ff.add(ff.neg(ff.mul(aa, sn4b)), ff.mul(cc, cs4b))
    d_ = ff.add(ff.neg(ff.mul(bb, sn4b)), ff.mul(dd, cs4b))
    mid = ff.mul_pow2(ff.add(a_, d_), half)
    a_ = mid
    d_ = mid
    sab = ff.sqrt(ff.abs_(b_))
    sac = ff.sqrt(ff.abs_(c_))
    p2 = ff.copysign(ff.mul(sab, sac), c_.hi)
    tau2 = ff.recip(_safe(ff.sqrt(ff.abs_(ff.add(b_, c_)))))
    cs1 = ff.mul(sab, tau2)
    sn1 = ff.mul(sac, tau2)
    cond_real = (~ff.eq0(c_)) & (~ff.eq0(b_)) & (_sgn_hi(b_) == _sgn_hi(c_))
    a4b = ff.where(cond_real, ff.add(mid, p2), a_)
    d4b = ff.where(cond_real, ff.sub(mid, p2), d_)
    b4b = ff.where(cond_real, ff.sub(b_, c_), b_)
    c4b = ff.where(cond_real, zero, c_)
    csr = ff.sub(ff.mul(cs4b, cs1), ff.mul(sn4b, sn1))
    snr = ff.add(ff.mul(cs4b, sn1), ff.mul(sn4b, cs1))
    cs4b2 = ff.where(cond_real, csr, cs4b)
    sn4b2 = ff.where(cond_real, snr, sn4b)
    cond_swap = (~ff.eq0(c_)) & ff.eq0(b_)
    b4b = ff.where(cond_swap, ff.neg(c_), b4b)
    c4b = ff.where(cond_swap, zero, c4b)
    cs4bf = ff.where(cond_swap, ff.neg(sn4b), cs4b2)
    sn4bf = ff.where(cond_swap, cs4b, sn4b2)

    use4a = ff.ge(z, FF(small, jnp.zeros_like(z.hi)))
    aB4 = ff.where(use4a, a4a, a4b)
    bB4 = ff.where(use4a, b4a, b4b)
    cB4 = ff.where(use4a, c4a, c4b)
    dB4 = ff.where(use4a, d4a, d4b)
    csB4 = ff.where(use4a, cs4a, cs4bf)
    snB4 = ff.where(use4a, sn4a, sn4bf)

    # ---- top-level branch select ---------------------------------------
    is_b1 = ff.eq0(c)
    is_b2 = (~is_b1) & ff.eq0(b)
    is_b3 = (~is_b1) & (~is_b2) & ff.eq0(temp) & \
        (ff.mul(b, c).hi < 0)

    af = ff.where(is_b1 | is_b3, a, ff.where(is_b2, d, aB4))
    bf = ff.where(is_b1 | is_b3, b, ff.where(is_b2, ff.neg(c), bB4))
    cf = ff.where(is_b1 | is_b3, c, ff.where(is_b2, zero, cB4))
    df = ff.where(is_b1 | is_b3, d, ff.where(is_b2, a, dB4))
    csf = ff.where(is_b1 | is_b3, one, ff.where(is_b2, zero, csB4))
    snf = ff.where(is_b1 | is_b3, zero, ff.where(is_b2, one, snB4))

    rti = ff.mul(ff.sqrt(ff.abs_(bf)), ff.sqrt(ff.abs_(cf)))
    imagpart = ff.where(ff.eq0(cf), zero, rti)
    return af, bf, cf, df, csf, snf, af, imagpart, df, ff.neg(imagpart)
