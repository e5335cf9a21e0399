"""Checkpoint round-trip and FacChecker tests."""
import numpy as np
import jax.numpy as jnp

from periodicschurdecompositions_jl_tpu.models.drivers import pschur
from periodicschurdecompositions_jl_tpu.utils.io import (
    load_decomposition, save_decomposition)
from periodicschurdecompositions_jl_tpu.diagnostics import FacChecker


def test_save_load_roundtrip(rng, tmp_path):
    A = rng.standard_normal((3, 6, 6))
    P = pschur(jnp.asarray(A))
    f = str(tmp_path / "psd.npz")
    save_decomposition(f, P)
    P2 = load_decomposition(f)
    assert np.allclose(np.asarray(P.Ts), np.asarray(P2.Ts))
    assert np.allclose(np.asarray(P.Zs), np.asarray(P2.Zs))
    assert np.allclose(np.asarray(P.values), np.asarray(P2.values))
    assert P2.orientation == P.orientation and P2.schurindex == P.schurindex


def test_save_load_generalized(rng, tmp_path):
    A = rng.standard_normal((2, 5, 5)) + 3 * np.eye(5)
    P = pschur(jnp.asarray(A), "R", S=(True, False))
    f = str(tmp_path / "gpsd.npz")
    save_decomposition(f, P)
    P2 = load_decomposition(f)
    assert P2.S == P.S
    assert np.allclose(np.asarray(P.values), np.asarray(P2.values))


def test_facchecker(rng):
    A = rng.standard_normal((3, 6, 6))
    P = pschur(jnp.asarray(A))
    fc = FacChecker(A)
    drift = fc("after pschur", np.asarray(P.Ts), np.asarray(P.Zs),
               verbose=False)
    assert drift < 1e-13
    # corrupting Z must be detected
    Zbad = np.asarray(P.Zs).copy()
    Zbad[0, 0, 0] += 1e-3
    assert fc("corrupt", np.asarray(P.Ts), Zbad, verbose=False) > 1e-5
