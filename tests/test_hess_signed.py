"""Signed Hessenberg-triangular reduction tests (mirrors test/generalized.jl:2-40)."""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops.hessenberg import phessenberg_signed_core

EPS = np.finfo(np.float64).eps


@pytest.mark.parametrize("S", [(True, False), (True, False, True, False),
                               (True, True, False)])
@pytest.mark.parametrize("cplx", [False, True])
def test_signed_hess(rng, S, cplx):
    p, n = len(S), 8
    A = rng.standard_normal((p, n, n))
    if cplx:
        A = A + 1j * rng.standard_normal((p, n, n))
    H, Q = phessenberg_signed_core(jnp.asarray(A), S)
    H, Q = np.asarray(H), np.asarray(Q)
    assert np.abs(np.tril(H[0], -2)).max() == 0.0
    for l in range(1, p):
        assert np.abs(np.tril(H[l], -1)).max() == 0.0
    for l in range(p):
        assert np.abs(Q[l] @ Q[l].conj().T - np.eye(n)).max() < 100 * EPS * n
        ln = (l + 1) % p
        if S[l]:
            Ax = Q[l] @ H[l] @ Q[ln].conj().T
        else:
            Ax = Q[ln] @ H[l] @ Q[l].conj().T
        assert np.abs(Ax - A[l]).max() < 200 * EPS * n * np.abs(A[l]).max(), f"factor {l}"


@pytest.mark.parametrize("S", [(True,), (True, False, True),
                               (True, False, False, True)])
def test_signed_hess_cxff_grouped_matches_interleaved(rng, S):
    """The grouped-chain stage-2 rewrite (ops/hess_grouped.py) must agree
    with the rotation-at-a-time interleaved path to ds grade: rotation
    GENERATION is bitwise-mirrored, only the application summation order
    differs (group-composed unitaries), so the outputs may differ by
    O(2^-48)-level roundoff but nothing more."""
    from periodicschurdecompositions_jl_tpu.ops import cxff
    from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (
        phessenberg_signed_core_cxff)

    p, n = len(S), 10
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    X = cxff.from_f64_split(A.real, A.imag)
    args = (X.re.hi, X.re.lo, X.im.hi, X.im.lo, S)
    o_old = phessenberg_signed_core_cxff(*args, want_q=True, grouped=False)
    o_new = phessenberg_signed_core_cxff(*args, want_q=True, grouped=True)

    def d64(hi, lo):
        return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)

    Hold = d64(o_old[0], o_old[1]) + 1j * d64(o_old[2], o_old[3])
    Hnew = d64(o_new[0], o_new[1]) + 1j * d64(o_new[2], o_new[3])
    Qold = d64(o_old[4], o_old[5]) + 1j * d64(o_old[6], o_old[7])
    Qnew = d64(o_new[4], o_new[5]) + 1j * d64(o_new[6], o_new[7])
    scale = np.abs(Hold).max()
    assert np.abs(Hnew - Hold).max() < 1e-12 * scale
    assert np.abs(Qnew - Qold).max() < 1e-12
    # structure: exact zeros below the Hessenberg / triangular patterns
    assert np.abs(np.tril(Hnew[0], -2)).max() == 0.0
    for l in range(1, p):
        assert np.abs(np.tril(Hnew[l], -1)).max() == 0.0
    for l in range(p):
        assert np.abs(Qnew[l] @ Qnew[l].conj().T
                      - np.eye(n)).max() < 1e-12


def test_signed_hess_cxff_chunked_bitwise(rng):
    """The host-chunked signed reduction must be BITWISE identical to the
    single-shot core: chunk boundaries only split the stage-1/stage-2
    fori ranges, state carries exactly (the chunking exists for the axon
    ~60 s execute kill, not for numerics)."""
    import jax

    from periodicschurdecompositions_jl_tpu.ops import cxff
    from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (
        phessenberg_signed_core_cxff, phessenberg_signed_core_cxff_chunked)

    # this test compiles the signed core 4x (single-shot + the chunked
    # driver's first/middle/final traces) on top of the module's earlier
    # compiles — clear the accumulated XLA:CPU executables first (the
    # allocator abort CLAUDE.md describes killed the full suite here)
    jax.clear_caches()
    S = (True, False, True)
    p, n = len(S), 8
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    X = cxff.from_f64_split(A.real, A.imag)
    args = (X.re.hi, X.re.lo, X.im.hi, X.im.lo, S)
    o1 = phessenberg_signed_core_cxff(*args, want_q=True)
    o2 = phessenberg_signed_core_cxff_chunked(*args, want_q=True,
                                              stage1_factors=1,
                                              chunk_cols=3)
    for a, b in zip(o1, o2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
