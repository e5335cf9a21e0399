"""Large-N (N > 128) sweep-kernel path: the roll-based aligned-block
access (pltpu.roll with dynamic shifts) must preserve the sweep's global
invariants.  Small-n correctness is covered exhaustively by
tests/test_pallas_sweep.py; this module exercises the N > 128 branch the
small suite cannot reach (interpret mode; window kept short — a full
sweep at this size takes minutes per step in the interpreter)."""
import numpy as np
import jax.numpy as jnp

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops import pallas_sweep as ps


def _mk_inputs(rng, p, n, m=None, i=None):
    # ghost-padded exactly like pqr_real_core_ff; a sweep window [m, i]
    # REQUIRES the boundary subdiagonals H[0][m, m-1] and H[0][i+1, i] to
    # be zero (in the iteration, windows are delimited by deflated rows)
    N = ((n + 16 + 7) // 8) * 8
    A = rng.standard_normal((p, n, n))
    A[0] = np.triu(A[0], -1)
    A[1:] = np.triu(A[1:])
    if m is not None and m > 0:
        A[0][m, m - 1] = 0.0
    if i is not None and i + 1 < n:
        A[0][i + 1, i] = 0.0
    H = np.zeros((p, N, N), np.float32)
    H[:, :n, :n] = A.astype(np.float32)
    Hlo = np.zeros_like(H)
    Hlo[:, :n, :n] = (A - H[:, :n, :n].astype(np.float64)).astype(np.float32)
    Z = np.zeros((p, N, N), np.float32)
    Z[:, :n, :n] = np.eye(n, dtype=np.float32)
    return N, FF(jnp.asarray(H), jnp.asarray(Hlo)), \
        FF(jnp.asarray(Z), jnp.zeros((p, N, N), jnp.float32))


def test_banded_groups_match_sequential(rng):
    """The banded group-composed kernel-B path must agree with the
    bitwise-reference sequential in-register group path to ds grade
    (the composition changes summation order, not stability)."""
    p, n, m, i = 2, 136, 2, 30
    N, H, ZT = _mk_inputs(rng, p, n, m=m, i=i)
    v = rng.standard_normal(3)
    v0 = ff.from_f64(jnp.asarray(v / np.abs(v).sum()))
    outs = {}
    mode0 = ps._GROUP_MODE
    try:
        for mode in ("seq", "banded"):
            ps._GROUP_MODE = mode
            ps._apply_call.cache_clear()
            Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(m), jnp.int32(i),
                                        v0, want_z=True, interpret=True)
            outs[mode] = (
                np.asarray(Hn.hi, np.float64) + np.asarray(Hn.lo,
                                                           np.float64),
                np.asarray(ZTn.hi, np.float64) + np.asarray(ZTn.lo,
                                                            np.float64))
    finally:
        ps._GROUP_MODE = mode0
        ps._apply_call.cache_clear()
    scale = np.abs(outs["seq"][0]).max()
    assert np.abs(outs["banded"][0] - outs["seq"][0]).max() < 1e-13 * scale
    assert np.abs(outs["banded"][1] - outs["seq"][1]).max() < 1e-13


def test_chase_sweep_ff_large_window(rng):
    """chase_sweep_ff at N > 128: orthogonal Z chains, H = Z' H0 Z, and
    Hessenberg/triangular structure preserved over a 40-step window
    spanning several aligned blocks (both unaligned-offset branches)."""
    p, n, m, i = 2, 140, 3, 43
    N, H, ZT = _mk_inputs(rng, p, n, m=m, i=i)
    v = rng.standard_normal(3)
    v0 = ff.from_f64(jnp.asarray(v / np.abs(v).sum()))
    H0 = np.asarray(H.hi, np.float64) + np.asarray(H.lo, np.float64)
    Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(m), jnp.int32(i), v0,
                                want_z=True, interpret=True)
    Hd = np.asarray(Hn.hi, np.float64) + np.asarray(Hn.lo, np.float64)
    Zd = np.asarray(ZTn.hi, np.float64) + np.asarray(ZTn.lo, np.float64)
    for l in range(p):
        Q = Zd[l][:n, :n]
        assert np.abs(Q @ Q.T - np.eye(n)).max() < 1e-12
    # reconstruction: H0[l] == Z[l] Hn[l] Z[l+1]' with Z[l] = ZT[l]^T
    for l in range(p):
        Zl = Zd[l][:n, :n].T
        Zn = Zd[(l + 1) % p][:n, :n].T
        Hx = Zl.T @ H0[l][:n, :n] @ Zn
        assert np.abs(Hx - Hd[l][:n, :n]).max() < 1e-11
    # structure: H[0] Hessenberg, others triangular (exact zeros)
    assert np.abs(np.tril(Hd[0][:n, :n], -2)).max() == 0.0
    for l in range(1, p):
        assert np.abs(np.tril(Hd[l][:n, :n], -1)).max() == 0.0
