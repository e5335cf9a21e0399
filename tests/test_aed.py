"""Tests for periodic aggressive early deflation (ops/aed.py).

AED is a beyond-reference convergence accelerator; correctness oracles are
the usual ones (orthogonal transforms, reconstruction, eigenvalues vs the
explicit product) plus equivalence of the accelerated chunked driver with
the plain core.
"""
import numpy as np
import jax.numpy as jnp

from periodicschurdecompositions_jl_tpu.config import AlgoConfig
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.aed import (aed_analyze,
                                                        aed_apply_ff)
from periodicschurdecompositions_jl_tpu.ops.hessenberg import \
    phessenberg_core
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
    pqr_real_core_ff, pqr_real_core_ff_chunked)

EPS = np.finfo(np.float64).eps


def _window(rng, p, w):
    H = np.stack([np.triu(rng.standard_normal((w, w)), -1 if l == 0 else 0)
                  for l in range(p)])
    return H


def test_aed_analyze_tiny_coupling_deflates_all(rng):
    """beta ~ 0: the whole window is converged; AED must adopt its Schur
    form wholesale (d == w) with orthogonal transforms and exact
    eigenvalues."""
    p, w = 3, 10
    Hwin = _window(rng, p, w)
    beta = 1e-25
    tol = EPS * w * np.abs(Hwin[0]).sum(axis=0).max()
    res = aed_analyze(Hwin, beta, tol)
    assert res is not None
    d, Wf, Zt, vals, sph = res
    assert d == w
    # transforms orthogonal
    for l in range(p):
        assert np.abs(Zt[l] @ Zt[l].T - np.eye(w)).max() < 100 * EPS * w
    # reconstruction: Zt[l]^T Hwin[l] Zt[l+1] = Wf[l]
    for l in range(p):
        R = Zt[l].T @ Hwin[l] @ Zt[(l + 1) % p]
        assert np.abs(R - Wf[l]).max() < 1e3 * EPS * np.abs(Hwin[l]).max()
    # eigenvalues match the window product
    wprod = np.linalg.multi_dot(list(Hwin)) if p > 1 else Hwin[0]
    w_ref = np.linalg.eigvals(wprod)
    vs = sorted(vals, key=lambda z: (abs(z), z.imag))
    ws = sorted(w_ref, key=lambda z: (abs(z), z.imag))
    scale = max(np.abs(w_ref).max(), 1.0)
    assert max(abs(a - b) for a, b in zip(vs, ws)) < 1e4 * EPS * scale


def test_aed_analyze_generic_window_mostly_none(rng):
    """O(1) coupling on a random (unconverged) window: spikes are O(beta),
    nothing deflates."""
    p, w = 2, 12
    Hwin = _window(rng, p, w)
    tol = EPS * w * np.abs(Hwin[0]).sum(axis=0).max()
    res = aed_analyze(Hwin, 1.7, tol)
    assert res is None


def test_aed_partial_deflation_structure(rng):
    """Plant a decoupled converged trailing block inside the window plus a
    live leading part: AED must deflate the trailing eigenvalues, keep the
    leading ones, and return a leading part in periodic Hessenberg form
    with the spike compressed to alpha e1."""
    p, w, conv = 3, 12, 5
    Hwin = _window(rng, p, w)
    u0 = w - conv
    # decouple the trailing block and make it already-quasi-triangular by
    # construction (a tiny converged subproblem's Schur form)
    sub = _window(rng, p, conv)
    from periodicschurdecompositions_jl_tpu.ops.pqr_real import pqr_real_core
    T, Z, wr, wi, ok = pqr_real_core(jnp.asarray(sub), want_z=False)
    assert bool(ok)
    Hwin[:, u0:, u0:] = np.asarray(T)
    Hwin[0][u0, u0 - 1] = 0.0
    beta = 0.9
    tol = EPS * w * np.abs(Hwin[0]).sum(axis=0).max()
    res = aed_analyze(Hwin, beta, tol)
    assert res is not None
    d, Wf, Zt, vals, sph = res
    assert d >= conv
    u = w - d
    # leading window back in periodic Hessenberg form
    assert np.abs(np.tril(Wf[0][:u, :u], -2)).max() == 0.0
    for l in range(1, p):
        assert np.abs(np.tril(Wf[l][:u, :u], -1)).max() == 0.0
    # spike compressed: alpha at slot 0, zeros elsewhere
    assert np.all(sph[1:] == 0.0)
    # deflated eigenvalues are (a subset of) the planted block's
    w_ref = np.linalg.eigvals(np.linalg.multi_dot(list(np.asarray(T))))
    for v in vals[u:]:
        assert min(abs(v - z) for z in w_ref) < 1e5 * EPS * max(
            1.0, np.abs(w_ref).max())
    # transforms orthogonal + reconstruction
    for l in range(p):
        assert np.abs(Zt[l] @ Zt[l].T - np.eye(w)).max() < 100 * EPS * w
        R = Zt[l].T @ Hwin[l] @ Zt[(l + 1) % p]
        # spike-zeroing perturbs H0 only at negligible entries; compare
        # away from the first column of the deflated rows
        assert np.abs(R - Wf[l]).max() < 1e3 * EPS * max(
            1.0, np.abs(Hwin[l]).max()) + 2 * tol


def test_aed_apply_ff_matches_host(rng):
    """The ds device application must agree with the f64 host transform."""
    p, n, w, s = 2, 16, 6, 7
    N = n + 1
    H = np.zeros((p, N, N))
    H[:, :n, :n] = _window(rng, p, n)
    ZT = np.zeros((p, N, N))
    ZT[:, :n, :n] = np.broadcast_to(np.eye(n), (p, n, n))
    q = [np.linalg.qr(rng.standard_normal((w, w)))[0] for _ in range(p)]
    Zt = np.stack(q)
    Wf = np.stack([rng.standard_normal((w, w)) for _ in range(p)])
    sp = rng.standard_normal(w)
    Hf = ff.from_f64(jnp.asarray(H))
    Zf = ff.from_f64(jnp.asarray(ZT))
    Hh, Hl, Zh, Zl = aed_apply_ff(Hf.hi, Hf.lo, Zf.hi, Zf.lo,
                                  jnp.asarray(Zt), jnp.asarray(Wf),
                                  jnp.asarray(sp), jnp.int32(s),
                                  want_z=True)
    got = np.asarray(Hh, np.float64) + np.asarray(Hl, np.float64)
    gzt = np.asarray(Zh, np.float64) + np.asarray(Zl, np.float64)
    for l in range(p):
        ref = H[l].copy()
        ref[s:s + w, :] = Zt[l].T @ ref[s:s + w, :]
        ref[:, s:s + w] = ref[:, s:s + w] @ Zt[(l + 1) % p]
        ref[s:s + w, s:s + w] = Wf[l]
        if l == 0:
            ref[s:s + w, s - 1] = sp
        assert np.abs(got[l] - ref).max() < 1e-13 * max(
            1.0, np.abs(ref).max()), l
        zref = ZT[l].copy()
        zref[s:s + w, :] = Zt[l].T @ zref[s:s + w, :]
        assert np.abs(gzt[l] - zref).max() < 1e-13


def test_chunked_aed_end_to_end(rng):
    """Chunked driver with AED: same eigenvalues and contract-grade
    backward error as the plain core, and AED actually fires."""
    p, n = 3, 48
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    Hff = ff.from_f64(jnp.asarray(np.asarray(H64)))
    QTff = ff.from_f64(jnp.asarray(np.swapaxes(np.asarray(Q64), 1, 2)))
    cfg = AlgoConfig(aed=True, aed_window=12, aed_interval=8)
    import periodicschurdecompositions_jl_tpu.ops.aed as aed_mod
    defl0 = aed_mod.stats["deflated"]
    out = pqr_real_core_ff_chunked(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                                   want_z=True, interpret=True, cfg=cfg,
                                   chunk_iters=8)
    assert aed_mod.stats["deflated"] > defl0, "AED never fired"
    T = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
    Z = np.swapaxes(np.asarray(out[2], np.float64) +
                    np.asarray(out[3], np.float64), 1, 2)
    wr = np.asarray(out[4], np.float64) + np.asarray(out[5], np.float64)
    wi = np.asarray(out[6], np.float64) + np.asarray(out[7], np.float64)
    assert bool(out[8])
    # backward error (ds contract)
    scale = np.abs(A).max()
    for l in range(p):
        Ax = Z[l] @ T[l] @ Z[(l + 1) % p].T
        assert np.abs(Ax - A[l]).max() < 1e-12 * scale, l
    # Z orthogonality
    for l in range(p):
        assert np.abs(Z[l] @ Z[l].T - np.eye(n)).max() < 1e-12
    # eigenvalues vs the plain (non-AED) core
    out0 = pqr_real_core_ff(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                            want_z=False, interpret=True)
    wr0 = np.asarray(out0[4], np.float64) + np.asarray(out0[5], np.float64)
    wi0 = np.asarray(out0[6], np.float64) + np.asarray(out0[7], np.float64)
    w1 = np.sort_complex(wr + 1j * wi)
    w0 = np.sort_complex(wr0 + 1j * wi0)
    assert np.abs(w1 - w0).max() < 1e-9 * max(1.0, np.abs(w0).max())


# ---------------------------------------------------------------------------
# complex / generalized variant


def _cwindow(rng, p, w):
    H = np.stack([np.triu(rng.standard_normal((w, w)) +
                          1j * rng.standard_normal((w, w)),
                          -1 if l == 0 else 0) for l in range(p)])
    return H


def test_aed_analyze_cx_tiny_coupling(rng):
    """Complex/generalized window with ~zero coupling: everything
    deflates; reconstruction respects the signature sides."""
    from periodicschurdecompositions_jl_tpu.ops.aed import aed_analyze_cx
    p, w = 3, 8
    S = (True, False, True)
    Hwin = _cwindow(rng, p, w)
    tol = EPS * w * np.abs(Hwin[0]).sum(axis=0).max()
    res = aed_analyze_cx(Hwin, S, 1e-25 + 0j, tol)
    assert res is not None
    d, Wf, Zt, al, be, sc, sph = res
    assert d == w
    for l in range(p):
        assert np.abs(Zt[l] @ Zt[l].conj().T - np.eye(w)).max() < 1e3 * EPS
        ln = (l + 1) % p
        if S[l]:
            R = Zt[l].conj().T @ Hwin[l] @ Zt[ln]
        else:
            R = Zt[ln].conj().T @ Hwin[l] @ Zt[l]
        assert np.abs(R - Wf[l]).max() < 1e4 * EPS * np.abs(Hwin[l]).max()
    # eigenvalues vs the explicit signed product
    M = np.eye(w, dtype=complex)
    for l in range(p):
        M = M @ (Hwin[l] if S[l] else np.linalg.inv(Hwin[l]))
    w_ref = np.linalg.eigvals(M)
    vals = al / be * np.exp2(sc.astype(np.float64))
    rest = list(w_ref)
    for v in vals:
        j = min(range(len(rest)), key=lambda q: abs(v - rest[q]))
        assert abs(v - rest[j]) < 1e4 * EPS * max(1.0, np.abs(w_ref).max())
        rest.pop(j)


def test_chunked_aed_cx_end_to_end(rng):
    """ds complex chunked driver with AED: contract-grade residual and
    eigenvalue agreement with the exact complex128 core; AED fires."""
    from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (
        phessenberg_signed_core_cxff, pqz_complex_core_ff_chunked)
    from periodicschurdecompositions_jl_tpu.ops.pqz_complex import (
        pqz_complex_core)
    from periodicschurdecompositions_jl_tpu.ops.hessenberg import (
        phessenberg_signed_core)
    import periodicschurdecompositions_jl_tpu.ops.aed as aed_mod
    p, n = 2, 36
    S = (True, False)
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))

    def _split(x):
        x = jnp.asarray(x)
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        return hi, lo

    rhi, rlo = _split(A.real)
    ihi, ilo = _split(A.imag)
    out = phessenberg_signed_core_cxff(rhi, rlo, ihi, ilo, S, want_q=True)
    Hrehi, Hrelo, Himhi, Himlo = out[:4]
    Z4 = out[4:]
    cfg = AlgoConfig(aed=True, aed_window=10, aed_interval=8)
    defl0 = aed_mod.stats["deflated"]
    res = pqz_complex_core_ff_chunked(
        Hrehi, Hrelo, Himhi, Himlo, S, Z4, want_z=True, maxitfac=40,
        chunk_iters=8, cfg=cfg)
    assert aed_mod.stats["deflated"] > defl0, "complex AED never fired"
    (Trehi, Trelo, Timhi, Timlo, Zrehi, Zrelo, Zimhi, Zimlo,
     alre, alim, be, sc, ok) = res[:13]
    assert bool(ok)
    T = (np.asarray(Trehi, np.float64) + np.asarray(Trelo, np.float64)) + \
        1j * (np.asarray(Timhi, np.float64) + np.asarray(Timlo, np.float64))
    Z = (np.asarray(Zrehi, np.float64) + np.asarray(Zrelo, np.float64)) + \
        1j * (np.asarray(Zimhi, np.float64) + np.asarray(Zimlo, np.float64))
    scale = np.abs(A).max()
    for l in range(p):
        ln = (l + 1) % p
        if S[l]:
            Ax = Z[l] @ T[l] @ Z[ln].conj().T
        else:
            Ax = Z[ln] @ T[l] @ Z[l].conj().T
        assert np.abs(Ax - A[l]).max() < 1e-12 * scale, l
    # eigenvalues vs the exact complex128 pipeline
    H64, Q64 = phessenberg_signed_core(jnp.asarray(A), S, want_q=False)
    _, _, al0, be0, sc0, ok0 = pqz_complex_core(H64, S, want_z=False)
    assert bool(ok0)
    v0 = np.sort_complex(np.asarray(al0) / np.asarray(be0) *
                         np.exp2(np.asarray(sc0).astype(np.float64)))
    al = np.asarray(alre, np.float64) + 1j * np.asarray(alim, np.float64)
    v1 = np.sort_complex(al / np.asarray(be, np.float64) *
                         np.exp2(np.asarray(sc).astype(np.float64)))
    assert np.abs(v1 - v0).max() < 1e-9 * max(1.0, np.abs(v0).max())


def test_chunked_aed_rg_end_to_end(rng):
    """Real generalized chunked driver with AED: residual + eigenvalue
    agreement with the plain core; AED fires."""
    from periodicschurdecompositions_jl_tpu.ops.hessenberg import (
        phessenberg_signed_core)
    from periodicschurdecompositions_jl_tpu.ops.pqz_real import (
        pqz_real_gen_core, pqz_real_gen_core_chunked)
    import periodicschurdecompositions_jl_tpu.ops.aed as aed_mod
    p, n = 3, 36
    S = (True, False, True)
    A = rng.standard_normal((p, n, n))
    H64, Q64 = phessenberg_signed_core(jnp.asarray(A), S, want_q=True)
    cfg = AlgoConfig(aed=True, aed_window=10, aed_interval=8)
    defl0 = aed_mod.stats["deflated"]
    T, Z, ar, ai, be, sc, ok = pqz_real_gen_core_chunked(
        H64, S, Z=Q64, want_z=True, chunk_iters=8, cfg=cfg)
    assert aed_mod.stats["deflated"] > defl0, "rg AED never fired"
    assert bool(ok)
    T = np.asarray(T)
    Z = np.asarray(Z)
    scale = np.abs(A).max()
    for l in range(p):
        ln = (l + 1) % p
        Ax = (Z[l] @ T[l] @ Z[ln].T) if S[l] else (Z[ln] @ T[l] @ Z[l].T)
        assert np.abs(Ax - A[l]).max() < 1e-11 * n * scale, l
    # eigenvalues vs the plain (non-AED) core
    _, _, ar0, ai0, be0, sc0, ok0 = pqz_real_gen_core(
        H64, S, Z=None, want_z=False)
    assert bool(ok0)
    v0 = np.sort_complex((np.asarray(ar0) + 1j * np.asarray(ai0)) /
                         np.asarray(be0) *
                         np.exp2(np.asarray(sc0).astype(np.float64)))
    v1 = np.sort_complex((np.asarray(ar) + 1j * np.asarray(ai)) /
                         np.asarray(be) *
                         np.exp2(np.asarray(sc).astype(np.float64)))
    assert np.abs(v1 - v0).max() < 1e-8 * max(1.0, np.abs(v0).max())


def test_aed_analyze_randomized_invariants():
    """Randomized stress: whatever AED decides, the invariants must hold —
    orthogonal transforms, reconstruction up to the spike tolerance, and
    deflated eigenvalues drawn from the window product's spectrum."""
    for seed in range(5):
        rng = np.random.default_rng(1000 + seed)
        p, w = 3, 10
        Hwin = _window(rng, p, w)
        # plant a converged trailing block half the time
        if seed % 2 == 0:
            conv = 4
            from periodicschurdecompositions_jl_tpu.ops.pqr_real import (
                pqr_real_core)
            sub = _window(rng, p, conv)
            T, _, _, _, ok = pqr_real_core(jnp.asarray(sub), want_z=False)
            assert bool(ok)
            Hwin[:, w - conv:, w - conv:] = np.asarray(T)
            Hwin[0][w - conv, w - conv - 1] = 0.0
        beta = float(rng.standard_normal())
        tol = EPS * w * np.abs(Hwin[0]).sum(axis=0).max()
        res = aed_analyze(Hwin, beta, tol)
        if res is None:
            continue
        d, Wf, Zt, vals, sph = res
        u = w - d
        w_ref = np.linalg.eigvals(np.linalg.multi_dot(list(Hwin)))
        scale = max(np.abs(w_ref).max(), 1.0)
        for l in range(p):
            assert np.abs(Zt[l] @ Zt[l].T - np.eye(w)).max() < 1e3 * EPS
            R = Zt[l].T @ Hwin[l] @ Zt[(l + 1) % p]
            assert np.abs(R - Wf[l]).max() < 1e3 * EPS * max(
                1.0, np.abs(Hwin[l]).max()) + 2 * tol
        for v in vals[u:]:
            assert min(abs(v - z) for z in w_ref) < 1e6 * EPS * scale
        assert np.all(sph[1:] == 0.0)
        # leading part back in periodic Hessenberg form
        if u > 0:
            assert np.abs(np.tril(Wf[0][:u, :u], -2)).max() == 0.0
            for l in range(1, p):
                assert np.abs(np.tril(Wf[l][:u, :u], -1)).max() == 0.0


def test_aed_apply_rg_ff_matches_host(rng):
    """The ds real-generalized application must agree with the f64 host
    transform (signature-aware sides; Z plain)."""
    from periodicschurdecompositions_jl_tpu.ops.aed import aed_apply_rg_ff
    p, n, w, s = 2, 16, 6, 7
    S = (True, False)
    H = _window(rng, p, n)
    Z = np.broadcast_to(np.eye(n), (p, n, n)).copy()
    q = [np.linalg.qr(rng.standard_normal((w, w)))[0] for _ in range(p)]
    Zt = np.stack(q)
    Wf = np.stack([rng.standard_normal((w, w)) for _ in range(p)])
    sp = rng.standard_normal(w)
    Hf = ff.from_f64(jnp.asarray(H))
    Zf = ff.from_f64(jnp.asarray(Z))
    Hh, Hl, Zh, Zl = aed_apply_rg_ff(Hf.hi, Hf.lo, Zf.hi, Zf.lo,
                                     jnp.asarray(Zt), jnp.asarray(Wf),
                                     jnp.asarray(sp), jnp.int32(s), S,
                                     want_z=True)
    got = np.asarray(Hh, np.float64) + np.asarray(Hl, np.float64)
    gz = np.asarray(Zh, np.float64) + np.asarray(Zl, np.float64)
    for l in range(p):
        ln = (l + 1) % p
        ref = H[l].copy()
        Vl = Zt[l] if S[l] else Zt[ln]
        Vr = Zt[ln] if S[l] else Zt[l]
        ref[s:s + w, :] = Vl.T @ ref[s:s + w, :]
        ref[:, s:s + w] = ref[:, s:s + w] @ Vr
        ref[s:s + w, s:s + w] = Wf[l]
        if l == 0:
            ref[s:s + w, s - 1] = sp
        assert np.abs(got[l] - ref).max() < 1e-13 * max(
            1.0, np.abs(ref).max()), l
        zref = Z[l].copy()
        zref[:, s:s + w] = zref[:, s:s + w] @ Zt[l]
        assert np.abs(gz[l] - zref).max() < 1e-13


def test_chunked_aed_rg_ff_end_to_end(rng):
    """ds real-generalized chunked driver with AED: contract-grade
    residual and eigenvalue agreement with the f64 core; AED fires."""
    import periodicschurdecompositions_jl_tpu.ops.aed as aed_mod
    from periodicschurdecompositions_jl_tpu.ops.pqz_real import (
        pschur_real_gen_pipeline)
    p, n = 2, 36
    S = (True, False)
    A = rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += np.sign(np.linalg.det(A[l])) * 3 * np.eye(n)
    cfg = AlgoConfig(aed=True, aed_window=10, aed_interval=8)
    defl0 = aed_mod.stats["deflated"]
    import periodicschurdecompositions_jl_tpu.ops.pqz_real_ff as rgff
    from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (
        phessenberg_signed_core_cxff)
    Aff = ff.from_f64(jnp.asarray(A))
    zi = jnp.zeros_like(Aff.hi)
    red = phessenberg_signed_core_cxff(Aff.hi, Aff.lo, zi, zi, S,
                                       want_q=True)
    res = rgff.pqz_real_gen_core_ff_chunked(
        red[0], red[1], S, (red[4], red[5]), want_z=True, maxitfac=120,
        chunk_iters=8, cfg=cfg)
    assert aed_mod.stats["deflated"] > defl0, "rg-ff AED never fired"
    (Thi, Tlo, Zhi, Zlo, alr, ali, be, sc, ok) = res
    assert bool(ok)
    T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
    Z = np.asarray(Zhi, np.float64) + np.asarray(Zlo, np.float64)
    scale = np.abs(A).max()
    for l in range(p):
        ln = (l + 1) % p
        Ax = (Z[l] @ T[l] @ Z[ln].T) if S[l] else (Z[ln] @ T[l] @ Z[l].T)
        assert np.abs(Ax - A[l]).max() < 1e-12 * scale, l
    # eigenvalues vs the f64 pipeline
    Pref = pschur_real_gen_pipeline(jnp.asarray(A), S, "R")
    v0 = np.sort_complex(np.asarray(Pref.values))
    al = np.asarray(alr) + 1j * np.asarray(ali)
    v1 = np.sort_complex(al / np.asarray(be, np.float64) *
                         np.exp2(np.asarray(sc).astype(np.float64)))
    assert np.abs(v1 - v0).max() < 1e-9 * max(1.0, np.abs(v0).max())
