"""Pallas ds real-generalized chase kernels vs a float64 numpy reference.

The numpy reference mirrors `pqz_real_ff.act_sweep`'s opening + chase
(reference src/rgeneralized.jl:888-1014) in the ORIGINAL interleaved
order with full (want_t=True) spans; the Pallas triple runs only the
chase on the post-opening stacks with deferred (commuted) application.
Runs through the Pallas interpreter (CPU).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep_rg import \
    rg_chase_sweep_ff


def givens_np(f, g):
    if g == 0:
        return 1.0, 0.0, f
    if f == 0:
        return 0.0, np.sign(g), abs(g)
    d = np.hypot(f, g)
    r = d if f >= 0 else -d
    return abs(f) / d, g / r, r


def lmat_np(c, s):
    return np.array([[c, s], [-s, c]])


def rmat_adj_np(c, s):
    return np.array([[c, -s], [s, c]])


def ref_opening_np(H, Z, S, j, ilast, c1, s1, c2, s2):
    """Glue opening (pqz_real_ff.act_sweep's opening block), f64."""
    p, n, _ = H.shape
    H[0][:ilast + 1, j + 1:j + 3] = H[0][:ilast + 1, j + 1:j + 3] @ \
        rmat_adj_np(c2, s2)
    H[0][:ilast + 1, j:j + 2] = H[0][:ilast + 1, j:j + 2] @ \
        rmat_adj_np(c1, s1)
    Z[1 % p][:, j + 1:j + 3] = Z[1 % p][:, j + 1:j + 3] @ \
        rmat_adj_np(c2, s2)
    Z[1 % p][:, j:j + 2] = Z[1 % p][:, j:j + 2] @ rmat_adj_np(c1, s1)
    for l in range(1, p):
        Hl = H[l]
        if S[l]:
            Hl[j + 1:j + 3, j:] = lmat_np(c2, s2) @ Hl[j + 1:j + 3, j:]
            c2, s2, r = givens_np(Hl[j + 2, j + 2], -Hl[j + 2, j + 1])
            Hl[j + 2, j + 2] = r
            Hl[j + 2, j + 1] = 0.0
            Hl[:j + 2, j + 1:j + 3] = Hl[:j + 2, j + 1:j + 3] @ \
                rmat_adj_np(c2, s2)
            Hl[j:j + 2, j:] = lmat_np(c1, s1) @ Hl[j:j + 2, j:]
            c1, s1, r = givens_np(Hl[j + 1, j + 1], -Hl[j + 1, j])
            Hl[j + 1, j + 1] = r
            Hl[j + 1, j] = 0.0
            Hl[:j + 1, j:j + 2] = Hl[:j + 1, j:j + 2] @ rmat_adj_np(c1, s1)
        else:
            Hl[:j + 3, j + 1:j + 3] = Hl[:j + 3, j + 1:j + 3] @ \
                rmat_adj_np(c2, s2)
            c2, s2, r = givens_np(Hl[j + 1, j + 1], Hl[j + 2, j + 1])
            Hl[j + 1, j + 1] = r
            Hl[j + 2, j + 1] = 0.0
            Hl[j + 1:j + 3, j + 2:] = lmat_np(c2, s2) @ \
                Hl[j + 1:j + 3, j + 2:]
            Hl[:j + 2, j:j + 2] = Hl[:j + 2, j:j + 2] @ rmat_adj_np(c1, s1)
            c1, s1, r = givens_np(Hl[j, j], Hl[j + 1, j])
            Hl[j, j] = r
            Hl[j + 1, j] = 0.0
            Hl[j:j + 2, j + 1:] = lmat_np(c1, s1) @ Hl[j:j + 2, j + 1:]
        ln = (l + 1) % p
        Z[ln][:, j + 1:j + 3] = Z[ln][:, j + 1:j + 3] @ rmat_adj_np(c2, s2)
        Z[ln][:, j:j + 2] = Z[ln][:, j:j + 2] @ rmat_adj_np(c1, s1)
    H[0][j + 1:j + 3, j:] = lmat_np(c2, s2) @ H[0][j + 1:j + 3, j:]
    H[0][j:j + 2, j:] = lmat_np(c1, s1) @ H[0][j:j + 2, j:]
    return H, Z


def ref_chase_np(H, Z, S, jlo, ilast):
    """Glue chase steps j = jlo..ilast-2, interleaved f64."""
    p, n, _ = H.shape
    for j in range(jlo, ilast - 1):
        col3 = H[0][j:j + 3, j - 1].copy()
        c2, s2, r2 = givens_np(col3[1], col3[2])
        c1, s1, r1 = givens_np(col3[0], r2)
        H[0][j:j + 3, j - 1] = [r1, 0.0, 0.0]
        H[0][j + 1:j + 3, j:] = lmat_np(c2, s2) @ H[0][j + 1:j + 3, j:]
        H[0][j:j + 2, j:] = lmat_np(c1, s1) @ H[0][j:j + 2, j:]
        Z[0][:, j + 1:j + 3] = Z[0][:, j + 1:j + 3] @ rmat_adj_np(c2, s2)
        Z[0][:, j:j + 2] = Z[0][:, j:j + 2] @ rmat_adj_np(c1, s1)
        for l in range(p - 1, 0, -1):
            Hl = H[l]
            if S[l]:
                Hl[:j + 3, j + 1:j + 3] = Hl[:j + 3, j + 1:j + 3] @ \
                    rmat_adj_np(c2, s2)
                c2, s2, r = givens_np(Hl[j + 1, j + 1], Hl[j + 2, j + 1])
                Hl[j + 1:j + 3, j + 1] = [r, 0.0]
                Hl[j + 1:j + 3, j + 2:] = lmat_np(c2, s2) @ \
                    Hl[j + 1:j + 3, j + 2:]
                Hl[:j + 2, j:j + 2] = Hl[:j + 2, j:j + 2] @ \
                    rmat_adj_np(c1, s1)
                c1, s1, r = givens_np(Hl[j, j], Hl[j + 1, j])
                Hl[j:j + 2, j] = [r, 0.0]
                Hl[j:j + 2, j + 1:] = lmat_np(c1, s1) @ Hl[j:j + 2, j + 1:]
            else:
                Hl[j + 1:j + 3, j:] = lmat_np(c2, s2) @ Hl[j + 1:j + 3, j:]
                fg = Hl[j + 2, j + 1:j + 3].copy()
                c2, s2, r = givens_np(fg[1], -fg[0])
                Hl[j + 2, j + 1:j + 3] = [0.0, r]
                Hl[:j + 2, j + 1:j + 3] = Hl[:j + 2, j + 1:j + 3] @ \
                    rmat_adj_np(c2, s2)
                Hl[j:j + 2, j:] = lmat_np(c1, s1) @ Hl[j:j + 2, j:]
                fg = Hl[j + 1, j:j + 2].copy()
                c1, s1, r = givens_np(fg[1], -fg[0])
                Hl[j + 1, j:j + 2] = [0.0, r]
                Hl[:j + 1, j:j + 2] = Hl[:j + 1, j:j + 2] @ \
                    rmat_adj_np(c1, s1)
            Z[l][:, j + 1:j + 3] = Z[l][:, j + 1:j + 3] @ \
                rmat_adj_np(c2, s2)
            Z[l][:, j:j + 2] = Z[l][:, j:j + 2] @ rmat_adj_np(c1, s1)
        lm = min(j + 3, n - 1)
        H[0][:lm + 1, j + 1:j + 3] = H[0][:lm + 1, j + 1:j + 3] @ \
            rmat_adj_np(c2, s2)
        H[0][:lm + 1, j:j + 2] = H[0][:lm + 1, j:j + 2] @ \
            rmat_adj_np(c1, s1)
    return H, Z


def _mk_problem(p, n, S, rng, ilast):
    H = np.zeros((p, n, n))
    H[0] = np.triu(rng.standard_normal((n, n)), -1)
    for f in range(1, p):
        H[f] = np.triu(rng.standard_normal((n, n)))
    if ilast + 1 < n:
        H[0][ilast + 1, ilast] = 0.0
    Z = np.zeros((p, n, n))
    for f in range(p):
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        Z[f] = q
    c1, s1, _ = givens_np(*rng.standard_normal(2))
    c2, s2, _ = givens_np(*rng.standard_normal(2))
    return H, Z, (c1, s1, c2, s2)


def _scrub(H, ilast):
    out = H.copy()
    keep = out[0][ilast, ilast - 2]
    out[0] = np.triu(out[0], -1)
    out[0][ilast, ilast - 2] = keep
    out[1:] = np.triu(out[1:])
    return out


@pytest.mark.parametrize("p,n,S,ifirst,ilast", [
    (2, 10, (True, False), 0, 9),
    (2, 10, (True, True), 0, 9),
    (3, 12, (True, False, True), 0, 11),
    (3, 12, (True, True, False), 2, 9),    # interior window
    (2, 8, (True, False), 2, 5),           # single chase step
])
def test_rg_chase_matches_f64_reference(p, n, S, ifirst, ilast):
    rng = np.random.default_rng(p * 37 + n + sum(S))
    H, Z, (c1, s1, c2, s2) = _mk_problem(p, n, S, rng, ilast)
    if ifirst > 0:
        H[0][ifirst, ifirst - 1] = 0.0
    Ho, Zo = ref_opening_np(H.copy(), Z.copy(), S, ifirst, ilast,
                            c1, s1, c2, s2)
    Href, Zref = ref_chase_np(Ho.copy(), Zo.copy(), S, ifirst + 1, ilast)
    Href = _scrub(Href, ilast)

    Hff = ff.from_f64(jnp.asarray(Ho))
    Zff = ff.from_f64(jnp.asarray(Zo))
    Hout, Zout = rg_chase_sweep_ff(Hff, Zff, jnp.int32(ifirst + 1),
                                   jnp.int32(ilast), S=S, want_z=True,
                                   interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))
    Zds = np.asarray(ff.to_f64(Zout))
    scale = np.abs(Ho).max()
    assert np.abs(Hds - Href).max() < 5e-12 * scale, \
        f"H mismatch {np.abs(Hds - Href).max():.2e}"
    assert np.abs(Zds - Zref).max() < 5e-12, \
        f"Z mismatch {np.abs(Zds - Zref).max():.2e}"
    # structural zeros exact, closing bulge preserved
    H0 = Hds[0].copy()
    H0[ilast, ilast - 2] = 0.0
    assert np.all(np.tril(H0, -2) == 0)
    for f in range(1, p):
        assert np.all(np.tril(Hds[f], -1) == 0)


def test_rg_chase_no_z_large_n():
    """Rolled 16-row slab path (N > 128), want_z=False."""
    p, n, S, ifirst, ilast = 2, 136, (True, False), 3, 120
    rng = np.random.default_rng(11)
    H, Z, (c1, s1, c2, s2) = _mk_problem(p, n, S, rng, ilast)
    H[0][ifirst, ifirst - 1] = 0.0
    Ho, Zo = ref_opening_np(H.copy(), Z.copy(), S, ifirst, ilast,
                            c1, s1, c2, s2)
    Href, _ = ref_chase_np(Ho.copy(), Zo.copy(), S, ifirst + 1, ilast)
    Href = _scrub(Href, ilast)
    Hff = ff.from_f64(jnp.asarray(Ho))
    Hout, _ = rg_chase_sweep_ff(Hff, None, jnp.int32(ifirst + 1),
                                jnp.int32(ilast), S=S, want_z=False,
                                interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))
    assert np.abs(Hds - Href).max() < 1e-9 * np.abs(Ho).max()
