"""Pallas ds split-complex QZ sweep kernels vs a complex128 numpy reference.

The numpy reference mirrors `pqz_complex_ff.act_sweep`'s fori body
(reference src/generalized.jl:806-852) in its ORIGINAL interleaved order
with the full (want_t=True) update spans; the Pallas triple applies left
chains eagerly and right chains deferred (commuted), so agreement to
~1e-12 across random mixed-signature problems validates both the
commutation argument and the ds arithmetic.  Runs through the Pallas
interpreter (CPU).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import cxff, ff
from periodicschurdecompositions_jl_tpu.ops.cxff import CXF
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep_cx import \
    qz_sweep_cxff


def givens_np(f, g):
    """zlartg semantics (matches cxff.givens_cxff): c real >= 0,
    [c s; -conj(s) c] @ [f, g] = [r, 0]."""
    if g == 0:
        return 1.0, 0.0 + 0.0j, f
    if f == 0:
        return 0.0, np.conj(g) / abs(g), abs(g)
    d = np.sqrt(abs(f) ** 2 + abs(g) ** 2)
    c = abs(f) / d
    fs = f / abs(f)
    return c, fs * np.conj(g) / d, fs * d


def lmat_np(c, s):
    return np.array([[c, s], [-np.conj(s), c]])


def rmat_adj_np(c, s):
    return np.array([[c, -s], [np.conj(s), c]])


def ref_qz_sweep_np(Hc, Zc, S, m, i, c0, s0):
    """complex128 reference of one single-shift QZ sweep (interleaved)."""
    p, n, _ = Hc.shape
    H = Hc.copy()
    Z = Zc.copy()
    for k in range(m, i):
        if k > m:
            c, s, r = givens_np(H[0][k, k - 1], H[0][k + 1, k - 1])
            H[0][k, k - 1] = r
            H[0][k + 1, k - 1] = 0.0
        else:
            c, s = c0, s0
        H[0][k:k + 2, k:] = lmat_np(c, s) @ H[0][k:k + 2, k:]
        Z[0][:, k:k + 2] = Z[0][:, k:k + 2] @ rmat_adj_np(c, s)
        for l in range(p - 1, 0, -1):
            if S[l]:
                H[l][:k + 2, k:k + 2] = H[l][:k + 2, k:k + 2] @ \
                    rmat_adj_np(c, s)
                c, s, r = givens_np(H[l][k, k], H[l][k + 1, k])
                H[l][k, k] = r
                H[l][k + 1, k] = 0.0
                H[l][k:k + 2, k + 1:] = lmat_np(c, s) @ H[l][k:k + 2, k + 1:]
            else:
                H[l][k:k + 2, k:] = lmat_np(c, s) @ H[l][k:k + 2, k:]
                c, s, r = givens_np(H[l][k + 1, k + 1], H[l][k + 1, k])
                H[l][k + 1, k] = 0.0
                H[l][k + 1, k + 1] = r
                H[l][:k + 1, k:k + 2] = H[l][:k + 1, k:k + 2] @ \
                    lmat_np(c, s)
                s = -s
            Z[l][:, k:k + 2] = Z[l][:, k:k + 2] @ rmat_adj_np(c, s)
        H[0][:min(k + 3, n), k:k + 2] = H[0][:min(k + 3, n), k:k + 2] @ \
            rmat_adj_np(c, s)
    return H, Z


def _mk_problem(p, n, S, rng):
    def cplx(shape):
        return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)

    H = np.zeros((p, n, n), complex)
    H[0] = np.triu(cplx((n, n)), -1)
    for f in range(1, p):
        H[f] = np.triu(cplx((n, n)))
    Z = np.zeros((p, n, n), complex)
    for f in range(p):
        q, _ = np.linalg.qr(cplx((n, n)))
        Z[f] = q
    # a plausibly-scaled shift rotation
    c0, s0, _ = givens_np(cplx(()).item(), cplx(()).item())
    return H, Z, c0, s0


def _enforce(H):
    out = H.copy()
    out[0] = np.triu(out[0], -1)
    out[1:] = np.triu(out[1:])
    return out


def _to_cxf(x):
    return CXF(ff.from_f64(jnp.asarray(x.real)),
               ff.from_f64(jnp.asarray(x.imag)))


def _to_np(X: CXF):
    re = np.asarray(ff.to_f64(X.re))
    im = np.asarray(ff.to_f64(X.im))
    return re + 1j * im


@pytest.mark.parametrize("p,n,S,m,i", [
    (1, 8, (True,), 0, 7),
    (2, 8, (True, True), 0, 7),
    (2, 8, (True, False), 0, 7),
    (4, 10, (True, False, True, False), 0, 9),
    (3, 12, (True, True, False), 2, 8),    # interior window
    (2, 6, (True, False), 2, 3),           # single-step window
])
def test_qz_sweep_matches_cx128_reference(p, n, S, m, i):
    rng = np.random.default_rng(p * 100 + n + sum(S))
    Hc, Zc, c0, s0 = _mk_problem(p, n, S, rng)
    # window-boundary subdiagonals are exact zeros when the core forms an
    # interior window (the deflation scan zeroes them); kernel B's
    # hi_lane = ilast bound relies on it below the window
    if m > 0:
        Hc[0][m, m - 1] = 0.0
    if i + 1 < n:
        Hc[0][i + 1, i] = 0.0
    Href, Zref = ref_qz_sweep_np(Hc, Zc, S, m, i, c0, s0)
    Href = _enforce(Href)

    Hx = _to_cxf(Hc)
    Zx = _to_cxf(Zc)
    c0ff = ff.from_f64(jnp.asarray(c0))
    s0x = CXF(ff.from_f64(jnp.asarray(s0.real)),
              ff.from_f64(jnp.asarray(s0.imag)))
    Hout, Zout = qz_sweep_cxff(Hx, Zx, jnp.int32(m), jnp.int32(i),
                               c0ff, s0x, S=S, want_z=True, interpret=True)
    Hds = _to_np(Hout)
    Zds = _to_np(Zout)

    scale = np.abs(Hc).max()
    assert np.abs(Hds - Href).max() < 5e-12 * scale, \
        f"H mismatch {np.abs(Hds - Href).max():.2e}"
    assert np.abs(Zds - Zref).max() < 5e-12, \
        f"Z mismatch {np.abs(Zds - Zref).max():.2e}"
    # structural zeros are exact
    assert np.all(np.tril(Hds[0], -2) == 0)
    for f in range(1, p):
        assert np.all(np.tril(Hds[f], -1) == 0)


def test_qz_sweep_no_z():
    p, n, S, m, i = 3, 10, (True, False, False), 0, 9
    rng = np.random.default_rng(5)
    Hc, Zc, c0, s0 = _mk_problem(p, n, S, rng)
    Href, _ = ref_qz_sweep_np(Hc, Zc, S, m, i, c0, s0)
    Href = _enforce(Href)
    Hx = _to_cxf(Hc)
    c0ff = ff.from_f64(jnp.asarray(c0))
    s0x = CXF(ff.from_f64(jnp.asarray(s0.real)),
              ff.from_f64(jnp.asarray(s0.imag)))
    Hout, _ = qz_sweep_cxff(Hx, None, jnp.int32(m), jnp.int32(i),
                            c0ff, s0x, S=S, want_z=False, interpret=True)
    Hds = _to_np(Hout)
    assert np.abs(Hds - Href).max() < 5e-12 * np.abs(Hc).max()


def test_qz_sweep_aligned_path_large_n():
    """N > 128 takes the rolled 16-row slab path in all three kernels."""
    p, n, S, m, i = 2, 140, (True, False), 3, 123
    rng = np.random.default_rng(9)
    Hc, Zc, c0, s0 = _mk_problem(p, n, S, rng)
    Hc[0][m, m - 1] = 0.0
    Hc[0][i + 1, i] = 0.0
    Href, Zref = ref_qz_sweep_np(Hc, Zc, S, m, i, c0, s0)
    Href = _enforce(Href)
    Hx = _to_cxf(Hc)
    Zx = _to_cxf(Zc)
    c0ff = ff.from_f64(jnp.asarray(c0))
    s0x = CXF(ff.from_f64(jnp.asarray(s0.real)),
              ff.from_f64(jnp.asarray(s0.imag)))
    Hout, Zout = qz_sweep_cxff(Hx, Zx, jnp.int32(m), jnp.int32(i),
                               c0ff, s0x, S=S, want_z=True, interpret=True)
    Hds = _to_np(Hout)
    Zds = _to_np(Zout)
    scale = np.abs(Hc).max()
    assert np.abs(Hds - Href).max() < 1e-9 * scale
    assert np.abs(Zds - Zref).max() < 1e-9
    for l in range(p):
        assert np.abs(Zds[l] @ Zds[l].conj().T - np.eye(n)).max() < 1e-11
