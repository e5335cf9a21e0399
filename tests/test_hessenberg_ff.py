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
