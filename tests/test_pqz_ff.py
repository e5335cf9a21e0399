"""Float-float split-complex QZ core tests (CPU: ds ops are exact under
the conftest's disabled XLA passes).

Oracles mirror tests/test_pqz_split.py: full-pipeline reconstruction
residual at ds grade, eigenvalue agreement with the exact complex128 core,
planted singular factors through the deflate_pos/deflate_neg paths, and
chunked-execution equivalence.  Kept to a small matrix: every (p, n, S)
combination compiles a fresh ds while_loop core (~minutes on CPU).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import periodicschurdecompositions_jl_tpu as psd
from periodicschurdecompositions_jl_tpu.diagnostics import check_psd


def _eig_cmp(P1, P2, tol=1e-12):
    v1 = np.sort_complex(np.asarray(P1.values))
    v2 = np.sort_complex(np.asarray(P2.values))
    finite = np.isfinite(v1) & np.isfinite(v2)
    scale = max(np.abs(v1[finite]).max(), 1.0)
    assert np.abs(v1[finite] - v2[finite]).max() < tol * scale
    assert (np.isfinite(v1) == np.isfinite(v2)).all()


def test_allpos_pipeline(rng):
    """Pure ds pipeline (ds reduction + ds iteration), S all positive."""
    p, n = 2, 10
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    P = psd.pschur(jnp.asarray(A), "R", backend="ff")
    ok, rep = check_psd(P, A, qtol=500.0, tol=2000.0)
    assert ok, rep
    assert rep["residual_rel"] < 1e-12
    Pref = psd.pschur(jnp.asarray(A), "R", backend="complex")
    _eig_cmp(P, Pref)


def test_mixed_signature_and_holes(rng):
    """Mixed S through the ds core, plus planted zero diagonals hitting
    the deflate_pos and deflate_neg ds paths (reference
    test/generalized.jl:80-151 pattern)."""
    p, n = 3, 8
    S = (True, False, True)
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    Pg = psd.pschur(jnp.asarray(A), "R", S=S, backend="ff")
    ok, rep = check_psd(Pg, A, qtol=500.0, tol=2000.0)
    assert ok, rep
    assert rep["residual_rel"] < 1e-12
    _eig_cmp(Pg, psd.pschur(jnp.asarray(A), "R", S=S, backend="complex"))

    # hole in the inverted factor -> infinite eigenvalue via deflate_neg
    A2 = A.copy()
    A2[1] = A2[1] @ np.diag([1.0] * 3 + [0.0] + [1.0] * (n - 4))
    P2 = psd.pschur(jnp.asarray(A2), "R", S=S, backend="ff")
    ok2, rep2 = check_psd(P2, A2, qtol=500.0, tol=2000.0)
    assert ok2, rep2
    assert int(np.sum(np.asarray(P2.beta) == 0)) >= 1

    # hole in a direct factor -> zero eigenvalue via deflate_pos
    A3 = A.copy()
    A3[2] = np.diag([1.0] * 5 + [0.0] + [1.0] * (n - 6)) @ A3[2]
    P3 = psd.pschur(jnp.asarray(A3), "R", S=S, backend="ff")
    ok3, rep3 = check_psd(P3, A3, qtol=500.0, tol=2000.0)
    assert ok3, rep3
    assert np.min(np.abs(np.asarray(P3.values))) < 1e-10


def test_chunked_equivalence(rng):
    """it_cap chunking must reproduce the single-shot run exactly."""
    from periodicschurdecompositions_jl_tpu.models.drivers import \
        _pschur_complex_ff
    p, n = 2, 10
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    S = (True,) * p
    P1 = _pschur_complex_ff(jnp.asarray(A), S, "R", True, True, 30)
    P2 = _pschur_complex_ff(jnp.asarray(A), S, "R", True, True, 30,
                            chunk_iters=3)
    assert np.array_equal(np.asarray(P1.Ts), np.asarray(P2.Ts))
    assert np.array_equal(np.asarray(P1.Zs), np.asarray(P2.Zs))
    assert np.array_equal(np.asarray(P1.alpha), np.asarray(P2.alpha))


def test_pallas_sweep_core(rng):
    """Full ds pipeline with the fused Pallas QZ sweep (interpret mode):
    the production off-CPU sweep path (ops/pallas_sweep_cx.py), checked on
    a mixed-signature cycle against the contract oracle and the exact
    complex128 core's eigenvalues."""
    from periodicschurdecompositions_jl_tpu.models.drivers import \
        _pschur_complex_ff
    p, n = 2, 8
    S = (True, False)
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    P = _pschur_complex_ff(jnp.asarray(A), S, "R", True, True, 30,
                           pallas=True, interpret=True)
    ok, rep = check_psd(P, A, qtol=500.0, tol=2000.0)
    assert ok, rep
    assert rep["residual_rel"] < 1e-12
    _eig_cmp(P, psd.pschur(jnp.asarray(A), "R", S=S, backend="complex"))
