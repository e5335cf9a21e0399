"""Host-tail finish of the cx and rg chunked drivers (cfg.host_tail).

The real chunked core's host-tail (one native beta=0 window analysis
finishes the leading window) now exists for all three chunked drivers;
these tests force a small tail on CPU and assert oracle-clean results.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu import native
from periodicschurdecompositions_jl_tpu.config import AlgoConfig
from periodicschurdecompositions_jl_tpu.ops import cxff
from periodicschurdecompositions_jl_tpu.ops.hessenberg import (
    phessenberg_signed_core)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native host library unavailable")


def _greedy_match(a, b):
    rest = list(b)
    worst = 0.0
    for x in a:
        j = min(range(len(rest)), key=lambda q: abs(x - rest[q]))
        worst = max(worst, abs(x - rest[j]))
        rest.pop(j)
    return worst


def test_rg_chunked_host_tail(rng):
    from periodicschurdecompositions_jl_tpu.ops.pqz_real import (
        pqz_real_gen_core_chunked)
    p, n = 4, 16
    S = (True, False, True, False)
    A = rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += np.sign(np.linalg.det(A[l])) * 3 * np.eye(n)
    H, Q = phessenberg_signed_core(jnp.asarray(A), S, want_q=True)
    cfg = AlgoConfig(host_tail=10, aed=False)
    T, Z, alr, ali, be, sc, ok = pqz_real_gen_core_chunked(
        jnp.asarray(H), S, Z=Q, want_z=True, cfg=cfg, chunk_iters=8)
    assert bool(ok)
    T, Z = np.asarray(T), np.asarray(Z)
    for l in range(p):
        ln = (l + 1) % p
        R = (Z[l].T @ A[l] @ Z[ln]) if S[l] else (Z[ln].T @ A[l] @ Z[l])
        assert np.abs(R - T[l]).max() < 1e-11
    vals = (np.asarray(alr) + 1j * np.asarray(ali)) / np.asarray(be) * \
        np.exp2(np.asarray(sc, float))
    M = np.eye(n)
    for l in range(p):
        M = M @ (A[l] if S[l] else np.linalg.inv(A[l]))
    wref = np.linalg.eigvals(M)
    assert _greedy_match(vals, wref) < 1e-9 * np.abs(wref).max()


def test_cx_chunked_host_tail(rng):
    from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (
        pqz_complex_core_ff_chunked)
    p, n = 4, 14
    S = (True, False, True, False)
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += 3 * np.eye(n)
    H, Q = phessenberg_signed_core(jnp.asarray(A), S, want_q=True)
    Hc = cxff.from_f64_split(jnp.real(H).astype(jnp.float64),
                             jnp.imag(H).astype(jnp.float64))
    Qc = cxff.from_f64_split(jnp.real(Q).astype(jnp.float64),
                             jnp.imag(Q).astype(jnp.float64))
    cfg = AlgoConfig(host_tail=8, aed=False)
    out = pqz_complex_core_ff_chunked(
        Hc.re.hi, Hc.re.lo, Hc.im.hi, Hc.im.lo, S,
        (Qc.re.hi, Qc.re.lo, Qc.im.hi, Qc.im.lo), want_z=True,
        cfg=cfg, chunk_iters=10)
    (Trh, Trl, Tih, Til, Zrh, Zrl, Zih, Zil, alre, alim, be, sc, ok) = out
    assert bool(ok)
    T = (np.asarray(Trh, np.float64) + np.asarray(Trl, np.float64)) + 1j * (
        np.asarray(Tih, np.float64) + np.asarray(Til, np.float64))
    Z = (np.asarray(Zrh, np.float64) + np.asarray(Zrl, np.float64)) + 1j * (
        np.asarray(Zih, np.float64) + np.asarray(Zil, np.float64))
    for l in range(p):
        ln = (l + 1) % p
        R = (Z[l].conj().T @ A[l] @ Z[ln]) if S[l] \
            else (Z[ln].conj().T @ A[l] @ Z[l])
        assert np.abs(R - T[l]).max() < 1e-11
    vals = (np.asarray(alre) + 1j * np.asarray(alim)) / \
        np.asarray(be, float) * np.exp2(np.asarray(sc, float))
    M = np.eye(n, dtype=complex)
    for l in range(p):
        M = M @ (A[l] if S[l] else np.linalg.inv(A[l]))
    wref = np.linalg.eigvals(M)
    assert _greedy_match(vals, wref) < 1e-9 * np.abs(wref).max()
