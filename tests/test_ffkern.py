"""ds element kernels vs their float64 counterparts."""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ffkern import (
    givens_ff, lanv2_ff, matmul3_ff, refl_mat_ff, reflector_ff)
from periodicschurdecompositions_jl_tpu.ops.ffslab import (
    colsk_ff, getcol_ff, rowsk_ff, setel_ff)
from periodicschurdecompositions_jl_tpu.ops.householder import (
    refl_mat, reflector_small)
from periodicschurdecompositions_jl_tpu.ops.lanv2 import lanv2
from periodicschurdecompositions_jl_tpu.ops.rotations import givens_real


def _to64(x):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_reflector_ff(rng):
    for k in (2, 3):
        for _ in range(20):
            x = rng.standard_normal(k) * 10.0 ** rng.uniform(-8, 8)
            w64, tau64, beta64 = reflector_small(jnp.asarray(x))
            w, tau, beta = reflector_ff(ff.from_f64(jnp.asarray(x)))
            assert np.allclose(_to64(w), np.asarray(w64), rtol=1e-12,
                               atol=1e-13)
            assert np.allclose(_to64(tau), float(tau64), rtol=1e-12)
            assert np.allclose(_to64(beta), float(beta64), rtol=1e-12)
            # reflector annihilation property in f64
            M = np.eye(k) - _to64(tau) * np.outer(_to64(w), _to64(w))
            y = M @ x
            assert abs(y[0] - _to64(beta)) < 1e-12 * max(1, abs(y[0]))
            assert np.abs(y[1:]).max() < 1e-12 * np.abs(x).max()


def test_reflector_ff_zero_tail():
    x = jnp.asarray(np.array([2.5, 0.0, 0.0]))
    w, tau, beta = reflector_ff(ff.from_f64(x))
    assert _to64(tau) == 0 and _to64(beta) == 2.5
    assert np.allclose(_to64(w), [1, 0, 0])


def test_givens_ff(rng):
    for _ in range(30):
        f, g = rng.standard_normal(2) * 10.0 ** rng.uniform(-6, 6)
        c64, s64, r64 = givens_real(jnp.float64(f), jnp.float64(g))
        c, s, r = givens_ff(ff.from_f64(jnp.float64(f)),
                            ff.from_f64(jnp.float64(g)))
        assert np.allclose(_to64(c), float(c64), rtol=1e-12)
        assert np.allclose(_to64(s), float(s64), rtol=1e-12)
        assert np.allclose(_to64(r), float(r64), rtol=1e-12)
    # structural-zero exactness
    c, s, r = givens_ff(ff.from_f64(jnp.float64(3.0)), ff.zeros(()))
    assert _to64(c) == 1 and _to64(s) == 0 and _to64(r) == 3.0


def test_lanv2_ff(rng):
    for _ in range(40):
        a, b, c, d = rng.standard_normal(4)
        ref = lanv2(jnp.float64(a), jnp.float64(b), jnp.float64(c),
                    jnp.float64(d))
        out = lanv2_ff(*(ff.from_f64(jnp.float64(v)) for v in (a, b, c, d)))
        for r64, rff in zip(ref, out):
            assert np.allclose(_to64(rff), float(r64), rtol=1e-10,
                               atol=1e-12)
    # exact-branch cases
    out = lanv2_ff(*(ff.from_f64(jnp.float64(v)) for v in (1.0, 2.0, 0.0, 3.0)))
    assert _to64(out[4]) == 1.0 and _to64(out[5]) == 0.0  # cs, sn identity


def test_rowsk_colsk_ff(rng):
    A = rng.standard_normal((8, 8))
    x = rng.standard_normal(3)
    w64, tau64, _ = reflector_small(jnp.asarray(x))
    M64 = np.asarray(refl_mat(w64, tau64))
    Aff = ff.from_f64(jnp.asarray(A))
    w, tau, _ = reflector_ff(ff.from_f64(jnp.asarray(x)))
    Mff = refl_mat_ff(w, tau)
    assert np.allclose(_to64(Mff), M64, rtol=1e-12, atol=1e-14)

    out = rowsk_ff(Aff, 2, Mff, lo=3)
    ref = A.copy()
    ref[2:5, 3:] = M64 @ A[2:5, 3:]
    assert np.allclose(_to64(out), ref, rtol=1e-12, atol=1e-13)

    out = colsk_ff(Aff, 4, Mff, hi=6)
    ref = A.copy()
    ref[:6, 4:7] = A[:6, 4:7] @ M64
    assert np.allclose(_to64(out), ref, rtol=1e-12, atol=1e-13)

    # masked inactive: unchanged
    out = rowsk_ff(Aff, 2, Mff, active=jnp.asarray(False))
    assert np.allclose(_to64(out), A)

    v = getcol_ff(Aff, 1, 3, 3)
    assert np.allclose(_to64(v), A[1:4, 3])
    out = setel_ff(Aff, 0, 0, ff.from_f64(jnp.float64(9.0)))
    assert _to64(out)[0, 0] == 9.0
