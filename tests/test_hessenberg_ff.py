"""ds periodic Hessenberg reduction: reconstruction + structure oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (
    phessenberg_core_ff)


@pytest.mark.parametrize("p,n", [(1, 8), (2, 8), (5, 12)])
def test_phessenberg_ff(p, n):
    rng = np.random.default_rng(p * 10 + n)
    A = rng.standard_normal((p, n, n))
    Aff = ff.from_f64(jnp.asarray(A))
    Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(Aff.hi, Aff.lo, want_q=True)
    H = np.asarray(Hhi, np.float64) + np.asarray(Hlo, np.float64)
    Q = np.swapaxes(np.asarray(QThi, np.float64)
                    + np.asarray(QTlo, np.float64), 1, 2)
    # structure
    assert np.abs(np.tril(H[0], -2)).max() == 0
    for j in range(1, p):
        assert np.abs(np.tril(H[j], -1)).max() == 0
    # reconstruction + orthogonality
    for j in range(p):
        R = Q[j].T @ A[j] @ Q[(j + 1) % p] - H[j]
        assert np.abs(R).max() < 5e-13 * np.abs(A).max()
        O = Q[j] @ Q[j].T - np.eye(n)
        assert np.abs(O).max() < 5e-13


@pytest.mark.parametrize("p,n,want_q", [(1, 8, True), (3, 12, True),
                                        (4, 33, True), (2, 24, False)])
def test_phessenberg_kernel_ff(p, n, want_q):
    """Fused Pallas reduction kernel (ops/pallas_hess.py, interpret mode):
    same contract as the XLA-glue path."""
    rng = np.random.default_rng(p * 100 + n)
    A = rng.standard_normal((p, n, n))
    Aff = ff.from_f64(jnp.asarray(A))
    Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(
        Aff.hi, Aff.lo, want_q=want_q, use_kernel="interpret")
    H = np.asarray(Hhi, np.float64) + np.asarray(Hlo, np.float64)
    assert np.abs(np.tril(H[0], -2)).max() == 0
    for j in range(1, p):
        assert np.abs(np.tril(H[j], -1)).max() == 0
    if not want_q:
        assert QThi is None
        # oracle vs the glue path's eigen-invariants: product spectrum
        Hg = phessenberg_core_ff(Aff.hi, Aff.lo, want_q=False,
                                 use_kernel=False)
        Hgf = (np.asarray(Hg[0], np.float64)
               + np.asarray(Hg[1], np.float64))
        P1 = np.linalg.multi_dot(list(H)) if p > 1 else H[0]
        P2 = np.linalg.multi_dot(list(Hgf)) if p > 1 else Hgf[0]
        e1 = np.sort_complex(np.linalg.eigvals(P1))
        e2 = np.sort_complex(np.linalg.eigvals(P2))
        scale = max(1.0, np.abs(e1).max())
        assert np.abs(e1 - e2).max() < 1e-9 * scale
        return
    Q = np.swapaxes(np.asarray(QThi, np.float64)
                    + np.asarray(QTlo, np.float64), 1, 2)
    for j in range(p):
        R = Q[j].T @ A[j] @ Q[(j + 1) % p] - H[j]
        assert np.abs(R).max() < 5e-13 * np.abs(A).max()
        O = Q[j] @ Q[j].T - np.eye(n)
        assert np.abs(O).max() < 5e-13
