"""Fused per-iteration glue kernel (kernel G, ops/pallas_glue.py).

Band-product parity against the emulated-f64 glue, and full-core oracle
equivalence with the kernel driving the iteration (interpret mode).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from periodicschurdecompositions_jl_tpu.config import default_config
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.hessenberg import (
    phessenberg_core)
from periodicschurdecompositions_jl_tpu.ops.pallas_glue import (
    glue_products_scan_shift)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
    _band_products_scaled, pqr_real_core_ff)


def _padded(Hf, p, n):
    N = n + 1
    pad = lambda x: jnp.zeros((p, N, N), jnp.float32).at[:, :n, :n].set(x)
    return FF(pad(Hf.hi), pad(Hf.lo))


def test_glue_kernel_band_parity(rng):
    p, n = 4, 24
    A = rng.standard_normal((p, n, n))
    H64, _ = phessenberg_core(jnp.asarray(A), want_q=False)
    Hp = _padded(ff.from_f64(jnp.asarray(np.asarray(H64))), p, n)

    hd0, hs0, hp0, e0, _ = _band_products_scaled(Hp, n)
    hd1, hs1, hp1, e1, fk, lnew, anyf, v0 = glue_products_scan_shift(
        Hp, n, jnp.int32(0), jnp.int32(n - 1), jnp.int32(1),
        default_config, interpret=True)
    for a, b in ((hd0, hd1), (hs0, hs1), (hp0, hp1)):
        ta = np.asarray(a) * 2.0 ** float(e0)
        tb = np.asarray(b) * 2.0 ** float(np.asarray(e1))
        scale = max(np.abs(ta).max(), 1e-300)
        assert np.abs(tb - ta).max() / scale < 1e-13
    assert int(lnew) == 0 and not bool(anyf)
    assert np.isfinite(np.asarray(v0.hi)).all()
    # v0 is normalized: |v1| + |v2| + |v3| = 1
    s = np.abs(np.asarray(v0.hi, np.float64)
               + np.asarray(v0.lo, np.float64)).sum()
    assert abs(s - 1.0) < 1e-12


def test_glue_kernel_core_oracle(rng):
    p, n = 3, 20
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hf = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QT = ff.from_f64(jnp.asarray(np.swapaxes(np.asarray(Q64), 1, 2)))
    cfg = dataclasses.replace(default_config, glue_kernel=True)
    out = pqr_real_core_ff(Hf.hi, Hf.lo, QT.hi, QT.lo, want_z=True,
                           interpret=True, cfg=cfg)
    (Th, Tl, Zh, Zl, wrh, wrl, wih, wil, ok) = out
    assert bool(ok)
    T = np.asarray(Th, np.float64) + np.asarray(Tl, np.float64)
    Z = np.swapaxes(np.asarray(Zh, np.float64)
                    + np.asarray(Zl, np.float64), 1, 2)
    for l in range(p):
        r = np.abs(Z[l] @ T[l] @ Z[(l + 1) % p].T - A[l]).max()
        assert r / np.abs(A[l]).max() < 1e-12
        assert np.abs(Z[l].T @ Z[l] - np.eye(n)).max() < 1e-12
    wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
    wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
    w = np.sort_complex(wr + 1j * wi)
    wref = np.sort_complex(
        np.linalg.eigvals(np.linalg.multi_dot(list(A))))
    assert np.abs(w - wref).max() < 1e-9 * np.abs(wref).max()


def test_glue_kernel_graded_scale(rng):
    """Graded cycles exercise the in-kernel binary renormalization."""
    p, n = 6, 16
    A = rng.standard_normal((p, n, n)) * (10.0 ** rng.integers(-6, 7, p)
                                          )[:, None, None]
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hf = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QT = ff.from_f64(jnp.asarray(np.swapaxes(np.asarray(Q64), 1, 2)))
    cfg = dataclasses.replace(default_config, glue_kernel=True)
    out = pqr_real_core_ff(Hf.hi, Hf.lo, QT.hi, QT.lo, want_z=True,
                           interpret=True, cfg=cfg)
    (Th, Tl, Zh, Zl, *_rest, ok) = out
    assert bool(ok)
    T = np.asarray(Th, np.float64) + np.asarray(Tl, np.float64)
    Z = np.swapaxes(np.asarray(Zh, np.float64)
                    + np.asarray(Zl, np.float64), 1, 2)
    for l in range(p):
        r = np.abs(Z[l] @ T[l] @ Z[(l + 1) % p].T - A[l]).max()
        assert r / np.abs(A[l]).max() < 1e-12
