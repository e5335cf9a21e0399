"""Periodic Krylov-Schur tests (mirrors reference test/krylov.jl strategy)."""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.models.krylov import partial_pschur


def mkmats(rng, p, n, xpnd=1.5, cplx=False):
    """Cycle with known well-spread spectrum from triangular seeds
    (reference mkmats1, test/krylov.jl:35-56)."""
    lams = xpnd ** np.arange(n) * (1.0 + (0.3j if cplx else 0.0))
    dt = complex if cplx else float
    A = []
    Qprev = np.eye(n)
    # build A[l] so that prod(A[p-1]...A[0]) has eigvals lams
    # use T_l = diag(lams**(1/p))-ish triangular with random strict upper
    mu = np.abs(lams) ** (1.0 / p)
    for l in range(p):
        T = np.triu(rng.standard_normal((n, n)) * 0.1, 1).astype(dt)
        d = mu.astype(dt)
        if l == 0 and cplx:
            d = d * (lams / np.abs(lams))  # phases into the first factor
        if l == 0 and not cplx:
            d = d * np.sign(lams.real)
        T += np.diag(d)
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        if cplx:
            q2, _ = np.linalg.qr(rng.standard_normal((n, n))
                                 + 1j * rng.standard_normal((n, n)))
            q = q2
        A.append(q @ T @ Qprev.conj().T if False else T)
    return np.stack(A).astype(dt)


def check_partial(A, ps, tol=1e-6):
    """Residual check: A[l] V[l] = V[(l+1)%p] T[l] columnwise (left orient)."""
    A = np.asarray(A)
    p = A.shape[0]
    V = np.asarray(ps.Vs)
    T = np.asarray(ps.Ts)
    k = V.shape[2]
    assert k > 0
    for l in range(p):
        R = A[l] @ V[l] - V[(l + 1) % p] @ T[l]
        assert np.abs(R).max() < tol * max(1, np.abs(A[l]).max()), (l, np.abs(R).max())
        # orthonormality of bases
        G = V[l].conj().T @ V[l]
        assert np.abs(G - np.eye(k)).max() < 1e-10


@pytest.mark.parametrize("which", ["LM", "LR"])
def test_krylov_real(rng, which):
    p, n, nev = 3, 30, 4
    A = mkmats(rng, p, n)
    ps, hist = partial_pschur(A, nev, which, seed=7)
    assert hist.nconverged >= nev // 2, hist
    check_partial(A, ps)
    # found values must be among the top 2*nev of the true spectrum
    M = np.eye(n)
    for l in range(p):
        M = A[l] @ M
    w = np.linalg.eigvals(M)
    w_sorted = sorted(w, key=lambda z: -abs(z) if which == "LM" else -z.real)
    best = w_sorted[:2 * nev]
    vals = np.asarray(ps.values)
    for v in vals:
        d = min(min(abs(v - b), abs(v - np.conj(b))) for b in best)
        assert d < 1e-6 * max(abs(v), 1), (v, best)


def test_krylov_complex(rng):
    p, n, nev = 2, 24, 3
    A = mkmats(rng, p, n, cplx=True)
    ps, hist = partial_pschur(A, nev, "LM", seed=3)
    assert hist.nconverged >= 1
    check_partial(A, ps)


def test_krylov_matrix_free(rng):
    p, n, nev = 2, 40, 3
    A = mkmats(rng, p, n)
    ops = [lambda x, a=A[l]: a @ x for l in range(p)]
    ps, hist = partial_pschur(ops, nev, "LM", n=n, dtype=np.float64, seed=5)
    assert hist.nconverged >= 1
    check_partial(A, ps)


def test_krylov_large_matrix_free(rng):
    """BASELINE config 5 scale: p=12 operators, N=10000, matrix-free."""
    p, n, nev = 12, 10000, 5
    # cheap structured operators: diagonal + shift coupling (tridiagonal-ish)
    diags = [0.5 + rng.random(n) for _ in range(p)]
    offs = [0.1 * rng.standard_normal(n - 1) for _ in range(p)]
    # make a few dominant modes so LM converges quickly
    for d in diags:
        d[:6] += np.linspace(3.0, 1.5, 6)

    def mk(l):
        def op(x, d=diags[l], o=offs[l]):
            y = d * x
            y[:-1] += o * x[1:]
            return y
        return op

    ops = [mk(l) for l in range(p)]
    ps, hist = partial_pschur(ops, nev, "LM", n=n, dtype=np.float64,
                              mindim=12, maxdim=26, seed=11)
    assert hist.nconverged >= 2, hist
    V = np.asarray(ps.Vs)
    T = np.asarray(ps.Ts)
    k = V.shape[2]
    for l in range(p):
        Av = np.stack([ops[l](V[l][:, j]) for j in range(k)], axis=1)
        R = Av - V[(l + 1) % p] @ T[l]
        assert np.abs(R).max() < 1e-5, (l, np.abs(R).max())
