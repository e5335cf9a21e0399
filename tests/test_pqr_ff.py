"""ds real periodic QR core vs the float64 core and ground truth.

Runs the Pallas sweeps in interpreter mode on CPU (under disable_jit for
exact EFT semantics — see conftest note on the CPU fusion emitter).
Oracles are backend-independent (SURVEY §4): reconstruction residual,
orthogonality, quasi-triangularity, eigenvalues vs eigvals(prod(A)).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg import phessenberg_core
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff


def _run_ff(H64, Q64, want_z=True):
    Hff = ff.from_f64(jnp.asarray(H64))
    QT = np.swapaxes(np.asarray(Q64), 1, 2)
    QTff = ff.from_f64(jnp.asarray(QT))
    # jitted CPU execution is EFT-exact because conftest disables the XLA
    # fusion pass (the contraction source); interpret mode handles Pallas.
    out = pqr_real_core_ff(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                           want_z=want_z, interpret=True)
    (Thi, Tlo, ZThi, ZTlo, wrh, wrl, wih, wil, ok) = out
    T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
    Z = None
    if want_z:
        Z = np.swapaxes(
            np.asarray(ZThi, np.float64) + np.asarray(ZTlo, np.float64),
            1, 2)
    wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
    wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
    return T, Z, wr, wi, bool(ok)


def _check(A, T, Z, wr, wi, tol=5e-12):
    p, n, _ = A.shape
    # reconstruction: A[l] = Z[l] T[l] Z[l+1]^T
    scale = max(np.abs(A).max(), 1.0)
    for l in range(p):
        R = Z[l] @ T[l] @ Z[(l + 1) % p].T - A[l]
        assert np.abs(R).max() < tol * scale, \
            f"factor {l} residual {np.abs(R).max():.2e}"
        O = Z[l] @ Z[l].T - np.eye(n)
        assert np.abs(O).max() < tol, f"orthogonality {np.abs(O).max():.2e}"
    # structure
    assert np.all(np.abs(np.tril(T[0], -2)) == 0)
    for l in range(1, p):
        assert np.all(np.abs(np.tril(T[l], -1)) == 0)
    # eigenvalues vs product
    prod = np.eye(n)
    for l in range(p):
        prod = prod @ A[l]
    w_ref = np.sort_complex(np.linalg.eigvals(prod))
    w = np.sort_complex(wr + 1j * wi)
    lscale = max(np.abs(w_ref).max(), 1.0)
    assert np.abs(w - w_ref).max() < 2e-9 * lscale, \
        f"eigval err {np.abs(w - w_ref).max():.2e}"


@pytest.mark.parametrize("p,n", [(1, 8), (2, 8), (4, 12), (3, 16)])
def test_pqr_ff_random(p, n):
    rng = np.random.default_rng(11 * p + n)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    T, Z, wr, wi, ok = _run_ff(np.asarray(H64), np.asarray(Q64))
    assert ok
    _check(A, T, Z, wr, wi)


def test_pqr_ff_no_z():
    p, n = 2, 10
    rng = np.random.default_rng(3)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    T, _, wr, wi, ok = _run_ff(np.asarray(H64), np.asarray(Q64),
                               want_z=False)
    assert ok
    prod = np.eye(n)
    for l in range(p):
        prod = prod @ A[l]
    w_ref = np.sort_complex(np.linalg.eigvals(prod))
    w = np.sort_complex(wr + 1j * wi)
    assert np.abs(w - w_ref).max() < 2e-9 * max(np.abs(w_ref).max(), 1.0)


def test_pqr_ff_vs_f64_core():
    """ds core and f64 core agree on T (up to ds roundoff) for a case
    where iteration paths coincide."""
    from periodicschurdecompositions_jl_tpu.ops.pqr_real import pqr_real_core
    p, n = 2, 8
    rng = np.random.default_rng(7)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    T64, Z64, wr64, wi64, ok64 = pqr_real_core(H64, Z=Q64, want_z=True)
    T, Z, wr, wi, ok = _run_ff(np.asarray(H64), np.asarray(Q64))
    assert ok and bool(ok64)
    # same eigenvalues (tolerance: ds input representation + iteration)
    w_ref = np.sort_complex(np.asarray(wr64) + 1j * np.asarray(wi64))
    w = np.sort_complex(wr + 1j * wi)
    assert np.abs(w - w_ref).max() < 1e-9 * max(np.abs(w_ref).max(), 1.0)


def test_pqr_ff_chunked_resume():
    """Chunked execution (axon ~60 s execute kill timer) must be exactly
    resumable: tiny chunks reproduce the single-shot decomposition."""
    from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
        pqr_real_core_ff_chunked)
    p, n = 2, 10
    rng = np.random.default_rng(21)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hff = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QTff = ff.from_f64(jnp.asarray(np.swapaxes(np.asarray(Q64), 1, 2)))
    out1 = pqr_real_core_ff(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                            want_z=True, interpret=True)
    out2 = pqr_real_core_ff_chunked(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                                    want_z=True, interpret=True,
                                    chunk_iters=7)
    for a, b in zip(out1[:8], out2[:8]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert bool(out2[8])


@pytest.mark.parametrize("p,n,nb", [(1, 12, 2), (2, 12, 3), (4, 16, 2),
                                    (2, 6, 4)])
def test_pqr_ff_multibulge(p, n, nb):
    """cfg.nbulges > 1: NB double-shift bulges per Pallas sweep (batched
    generation chains + bulge-major deferred application)."""
    from periodicschurdecompositions_jl_tpu.config import AlgoConfig
    rng = np.random.default_rng(17 * p + n + nb)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hff = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QT = np.swapaxes(np.asarray(Q64), 1, 2)
    QTff = ff.from_f64(jnp.asarray(QT))
    out = pqr_real_core_ff(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                           want_z=True, interpret=True,
                           cfg=AlgoConfig(nbulges=nb))
    (Thi, Tlo, ZThi, ZTlo, wrh, wrl, wih, wil, ok) = out
    T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
    Z = np.swapaxes(
        np.asarray(ZThi, np.float64) + np.asarray(ZTlo, np.float64), 1, 2)
    wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
    wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
    assert bool(ok)
    _check(A, T, Z, wr, wi)


def test_pqr_ff_chunked_host_tail():
    """Host-tail finish (cfg.host_tail): once the active window shrinks
    below the threshold, ONE native-backend window Schur finishes the
    problem (beta = 0, full deflation) through the embedded fixed-shape
    AED apply.  Not bitwise vs the pure-ds run (the tail becomes exact
    f64), but the decomposition oracle and eigenvalues must hold."""
    import dataclasses

    from periodicschurdecompositions_jl_tpu import native
    from periodicschurdecompositions_jl_tpu.config import default_config
    from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
        pqr_real_core_ff_chunked)
    if not native.available():
        import pytest
        pytest.skip("native host backend unavailable")
    p, n = 2, 10
    rng = np.random.default_rng(21)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hff = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QTff = ff.from_f64(jnp.asarray(np.swapaxes(np.asarray(Q64), 1, 2)))
    cfg = dataclasses.replace(default_config, host_tail=6)
    out = pqr_real_core_ff_chunked(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                                   want_z=True, interpret=True,
                                   chunk_iters=7, cfg=cfg, with_info=True)
    info = out[-1]
    assert bool(out[8])
    assert info["host_tail_finished"] >= 2, "tail never fired"
    T = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
    ZT = np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64)
    # the state carries the reduction Q (initial ZT = Q^T), so the
    # reconstruction target is the ORIGINAL A, not the reduced H
    sc = np.abs(A).max()
    for l in range(p):
        R = ZT[l].T @ T[l] @ ZT[(l + 1) % p] - A[l]
        assert np.abs(R).max() / sc < 1e-12, (l, np.abs(R).max() / sc)
    # eigenvalues match the f64 reference core's
    from periodicschurdecompositions_jl_tpu.ops.pqr_real import (
        pqr_real_core)
    _, _, wr64, wi64, ok64 = pqr_real_core(jnp.asarray(np.asarray(H64)),
                                           want_z=True)
    w_ref = np.sort_complex(np.asarray(wr64) + 1j * np.asarray(wi64))
    w = np.sort_complex(
        np.asarray(out[4], np.float64) + np.asarray(out[5], np.float64) +
        1j * (np.asarray(out[6], np.float64) +
              np.asarray(out[7], np.float64)))
    assert np.abs(w - w_ref).max() < 1e-9 * max(np.abs(w_ref).max(), 1.0)


def test_stagnation_relaxation_converges():
    """Regression test for the graded-band stall fix (round 3): with the
    Ahues-Tisseur tightening cranked to at_pwr16=12 (threshold
    ~ulp^1.75 ~ 4e-26 — rejects essentially every product-level
    deflation), the stagnation relaxation must still drive the
    iteration to convergence through the plain dlahqr criterion after
    16 fruitless iterations per window.  Without the relaxation this
    configuration exhausts the iteration budget (the on-chip stall
    class froze whole n=512 draws the same way)."""
    import dataclasses

    from periodicschurdecompositions_jl_tpu.config import default_config
    from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
        pqr_real_core_ff_chunked)
    p, n = 2, 10
    rng = np.random.default_rng(33)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hff = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QTff = ff.from_f64(jnp.asarray(np.swapaxes(np.asarray(Q64), 1, 2)))
    cfg = dataclasses.replace(default_config, at_pwr16=12, host_tail=-1)
    out = pqr_real_core_ff_chunked(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                                   want_z=True, interpret=True,
                                   maxitfac=40, cfg=cfg)
    assert bool(out[8]), "relaxation failed to rescue the tightened test"
    T = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
    ZT = np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64)
    sc = np.abs(A).max()
    for l in range(p):
        R = ZT[l].T @ T[l] @ ZT[(l + 1) % p] - A[l]
        assert np.abs(R).max() / sc < 1e-12, (l, np.abs(R).max() / sc)
