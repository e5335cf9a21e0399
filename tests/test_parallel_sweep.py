"""Lane-sharded dense sweep vs the single-device ds core.

The multi-device dense path (parallel/sweep_sharded.py) must reproduce the
single-device sweep's results at ds contract grade on the virtual 8-device
CPU mesh: same decomposition, same eigenvalues, oracle-clean reconstruction
(docs/scaling.md §"N-large dense-core design").
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff
from periodicschurdecompositions_jl_tpu.parallel.sweep_sharded import (
    ShardedSweep)


def _mesh():
    devs = np.array(jax.devices("cpu")[:8])
    if devs.size < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return Mesh(devs, ("lanes",))


def _pipeline(A_np, sweep_fn):
    Af = ff.from_f64(jnp.asarray(A_np))
    Hh, Hl, Qh, Ql = phessenberg_core_ff(Af.hi, Af.lo, want_q=True)
    return pqr_real_core_ff(Hh, Hl, Qh, Ql, want_z=True, interpret=True,
                            sweep_fn=sweep_fn)


def test_sharded_core_matches_single_device(rng):
    # n = 31 -> ghost-padded N = 32 divides the 8-lane mesh
    p, n = 3, 31
    A = rng.standard_normal((p, n, n))
    mesh = _mesh()

    out_ref = _pipeline(A, None)
    out_sh = _pipeline(A, ShardedSweep(mesh))

    (Th, Tl, Zh, Zl, *_, ok_r) = out_ref
    (Sh, Sl, Yh, Yl, *_, ok_s) = out_sh
    assert bool(ok_r) and bool(ok_s)
    T_ref = np.asarray(Th, np.float64) + np.asarray(Tl, np.float64)
    T_sh = np.asarray(Sh, np.float64) + np.asarray(Sl, np.float64)
    Z_ref = np.asarray(Zh, np.float64) + np.asarray(Zl, np.float64)
    Z_sh = np.asarray(Yh, np.float64) + np.asarray(Yl, np.float64)
    scale = np.abs(T_ref).max()
    # the sharded application mirrors the step-mode kernels element-for-
    # element; agreement is ds-grade (identical arithmetic, potentially
    # different XLA scheduling)
    assert np.abs(T_sh - T_ref).max() / scale < 1e-12
    assert np.abs(Z_sh - Z_ref).max() < 1e-12

    # independent oracle: reconstruction of the original cycle
    ZT = Z_sh
    Z = np.swapaxes(ZT, 1, 2)
    worst = 0.0
    for l in range(p):
        Ax = Z[l] @ T_sh[l] @ Z[(l + 1) % p].T
        worst = max(worst, np.abs(Ax - A[l]).max() / np.abs(A[l]).max())
    assert worst < 1e-12
    for l in range(p):
        assert np.abs(Z[l].T @ Z[l] - np.eye(n)).max() < 1e-12


def test_sharded_sweep_eigvals(rng):
    # eigenvalues through the sharded path match eigvals(prod(A))
    p, n = 2, 15  # N = 16 divides 8 lanes
    A = rng.standard_normal((p, n, n))
    mesh = _mesh()
    out = _pipeline(A, ShardedSweep(mesh))
    (Th, Tl, Zh, Zl, wrh, wrl, wih, wil, ok) = out
    assert bool(ok)
    wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
    wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
    w = np.sort_complex(wr + 1j * wi)
    w_ref = np.sort_complex(np.linalg.eigvals(A[0] @ A[1]))
    assert np.abs(w - w_ref).max() < 1e-9 * np.abs(w_ref).max()
