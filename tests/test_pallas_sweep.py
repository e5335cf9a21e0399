"""Pallas ds sweep kernels vs a float64 numpy reference of the chase.

The numpy reference mirrors ops/pqr_real.py's `chase_step` (reference
src/PeriodicSchurDecompositions.jl:806-886) in its ORIGINAL interleaved
order with the reference's lo/hi update restrictions; the Pallas pair
applies left updates eagerly and right chains deferred (commuted), so
agreement to ~1e-12 across random problems validates both the commutation
argument and the ds arithmetic.  Runs through the Pallas interpreter (CPU).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep import chase_sweep_ff


def _refl(x):
    alpha, tail = x[0], x[1:]
    xnorm = np.linalg.norm(tail)
    if xnorm == 0:
        return np.concatenate([[1.0], 0 * tail]), 0.0, alpha
    h = np.hypot(alpha, xnorm)
    beta = -h if alpha >= 0 else h
    tau = (beta - alpha) / beta
    v = tail / (alpha - beta)
    return np.concatenate([[1.0], v]), tau, beta


def _mof(x):
    w, tau, beta = _refl(x)
    return np.eye(len(x)) - tau * np.outer(w, w), beta


def ref_sweep_np(Hp, Zp, m, i, v0):
    """f64 reference of one double-shift sweep on ghost-padded stacks."""
    p, N, _ = Hp.shape
    H = Hp.copy()
    Z = Zp.copy()
    for k in range(m, i):
        nr3 = (i - k + 1) >= 3
        col = H[0][k:k + 3, k - 1].copy()
        vk = col.copy() if k > m else v0.copy()
        if not nr3:
            vk[2] = 0.0
        M3, beta = _mof(vk)
        if k > m:
            H[0][k:k + 3, k - 1] = [beta, 0.0, 0.0 if k < i - 1 else col[2]]
        H[0][k:k + 3, k:] = M3 @ H[0][k:k + 3, k:]
        tgt = p - 1 if p > 1 else 0
        hi_r = min(k + 3, i) + 1
        H[tgt][:hi_r, k:k + 3] = H[tgt][:hi_r, k:k + 3] @ M3
        Z[0][:, k:k + 3] = Z[0][:, k:k + 3] @ M3
        for f in range(p - 1, 0, -1):
            colv = H[f][k:k + 3, k].copy()
            if not nr3:
                colv[2] = 0.0
            M3b, beta2 = _mof(colv)
            H[f][k:k + 3, k] = [beta2, 0.0, 0.0]
            H[f][k:k + 3, k + 1:] = M3b @ H[f][k:k + 3, k + 1:]
            H[f - 1][:hi_r, k:k + 3] = H[f - 1][:hi_r, k:k + 3] @ M3b
            Z[f][:, k:k + 3] = Z[f][:, k:k + 3] @ M3b
            if nr3:
                xc = H[f][k + 1:k + 3, k + 1].copy()
                M2, betab = _mof(xc)
                H[f][k + 1:k + 3, k + 1] = [betab, 0.0]
                H[f][k + 1:k + 3, k + 2:] = M2 @ H[f][k + 1:k + 3, k + 2:]
                H[f - 1][:hi_r, k + 1:k + 3] = \
                    H[f - 1][:hi_r, k + 1:k + 3] @ M2
                Z[f][:, k + 1:k + 3] = Z[f][:, k + 1:k + 3] @ M2
    return H, Z


def _mk_problem(p, n, rng, bulged=False):
    N = n + 1
    Hp = np.zeros((p, N, N))
    Hp[0, :n, :n] = np.triu(rng.standard_normal((n, n)), -1)
    for f in range(1, p):
        Hp[f, :n, :n] = np.triu(rng.standard_normal((n, n)))
    Zp = np.zeros((p, N, N))
    for f in range(p):
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        Zp[f, :n, :n] = q
    v0 = rng.standard_normal(3)
    v0 /= np.abs(v0).sum()
    return Hp, Zp, v0


def _enforce(H):
    out = H.copy()
    out[0] = np.triu(out[0], -1)
    out[1:] = np.triu(out[1:])
    return out


@pytest.mark.parametrize("p,n,m,i", [
    (1, 8, 0, 7),
    (2, 8, 0, 7),
    (4, 12, 0, 11),
    (3, 12, 2, 8),     # interior window
    (4, 6, 1, 3),      # tiny window (one nr3 step + closing 2-step)
    (2, 6, 2, 3),      # single 2-reflector step
])
def test_sweep_matches_f64_reference(p, n, m, i):
    rng = np.random.default_rng(p * 100 + n)
    Hp, Zp, v0 = _mk_problem(p, n, rng)
    Href, Zref = ref_sweep_np(Hp, Zp, m, i, v0)
    Href = _enforce(Href)

    Hff = ff.from_f64(jnp.asarray(Hp))
    ZTff = ff.from_f64(jnp.asarray(np.swapaxes(Zp, 1, 2)))
    v0ff = ff.from_f64(jnp.asarray(v0))
    # jitted CPU execution is EFT-exact with the fusion pass disabled
    # (conftest); without that flag XLA:CPU's fusion emitter FMA-contracts
    # through the EFTs.
    Hout, ZTout = chase_sweep_ff(Hff, ZTff, jnp.int32(m), jnp.int32(i),
                                 v0ff, want_z=True, interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))
    Zds = np.swapaxes(np.asarray(ff.to_f64(ZTout)), 1, 2)

    scale = np.abs(Hp).max()
    assert np.abs(Hds - Href).max() < 5e-12 * scale, \
        f"H mismatch {np.abs(Hds - Href).max():.2e}"
    assert np.abs(Zds - Zref).max() < 5e-12, \
        f"Z mismatch {np.abs(Zds - Zref).max():.2e}"
    # structural zeros are exact
    assert np.all(np.tril(Hds[0], -2) == 0)
    for f in range(1, p):
        assert np.all(np.tril(Hds[f], -1) == 0)


def test_sweep_no_z():
    p, n, m, i = (3, 10, 0, 9)
    rng = np.random.default_rng(5)
    Hp, Zp, v0 = _mk_problem(p, n, rng)
    Href, _ = ref_sweep_np(Hp, Zp, m, i, v0)
    Href = _enforce(Href)
    Hff = ff.from_f64(jnp.asarray(Hp))
    v0ff = ff.from_f64(jnp.asarray(v0))
    Hout, _ = chase_sweep_ff(Hff, None, jnp.int32(m), jnp.int32(i), v0ff,
                             want_z=False, interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))
    assert np.abs(Hds - Href).max() < 5e-12 * np.abs(Hp).max()


def test_sweep_aligned_path_large_n():
    """N > 128 takes the 8-aligned 16-row slab access path in both kernels
    (Mosaic requires provably aligned dynamic sublane starts past one lane
    tile); same reconstruction contract, exercised in interpret mode."""
    p, n, m, i = (2, 140, 3, 123)
    rng = np.random.default_rng(9)
    Hp1, Zp1, v0 = _mk_problem(p, n, rng)   # (p, n+1, n+1) padded
    Hp = np.ascontiguousarray(Hp1[:, :n, :n])
    Zp = np.ascontiguousarray(Zp1[:, :n, :n])
    Hp[0][m, m - 1] = 0.0
    Hp[0][i + 1, i] = 0.0
    # pad exactly like pqr_ff does for n + 1 > 128
    N = ((n + 16 + 7) // 8) * 8

    def pad(x):
        out = np.zeros((p, N, N), x.dtype)
        out[:, :n, :n] = x
        return out

    Href, Zref = ref_sweep_np(np.pad(Hp, ((0, 0), (0, 1), (0, 1))),
                              np.pad(Zp, ((0, 0), (0, 1), (0, 1))), m, i, v0)
    Hff = ff.from_f64(jnp.asarray(pad(Hp)))
    ZTff = ff.from_f64(jnp.asarray(pad(np.swapaxes(Zp, 1, 2))))
    v0ff = ff.from_f64(jnp.asarray(v0))
    Hout, ZTout = chase_sweep_ff(Hff, ZTff, jnp.int32(m), jnp.int32(i),
                                 v0ff, want_z=True, interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))[:, :n, :n]
    Zds = np.swapaxes(np.asarray(ff.to_f64(ZTout)), 1, 2)[:, :n, :n]
    scale = np.abs(Hp).max()
    assert np.abs(Hds - Href[:, :n, :n]).max() < 1e-9 * scale
    assert np.abs(Zds - Zref[:, :n, :n]).max() < 1e-9
    for l in range(p):
        assert np.abs(Zds[l] @ Zds[l].T - np.eye(n)).max() < 1e-11


# ---------------------------------------------------------------------------
# multi-bulge sweep (chase_sweep_ff_mb): NB double-shift bulges per pass
# ---------------------------------------------------------------------------
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep import chase_sweep_ff_mb  # noqa: E402


def _lead_v0_np(H, m, scs, sig3):
    """Shifted first column for a trailing bulge, from the window's leading
    3x3 cycle product under the band scale schedule (mirrors the kernel's
    _lead_v0; shifted-column formula of ops/pqr_ff.py's shift block)."""
    p = H.shape[0]
    T = np.eye(3)
    for f in range(1, p):
        T = T @ H[f][m:m + 3, m:m + 3]
        T = T * scs[f]
    P = H[0][m:m + 3, m:m + 3] @ T
    h11, h21, h12, h22, h32 = P[0, 0], P[1, 0], P[0, 1], P[1, 1], P[2, 1]
    rt1r, rt1i, rt2r = sig3
    sv = abs(h11 - rt2r) + abs(rt1i) + abs(h21)
    svs = 1.0 if sv == 0 else sv
    h21s = h21 / svs
    v1 = h21s * h12 + (h11 - rt1r) * ((h11 - rt2r) / svs) \
        + rt1i * (rt1i / svs)
    v2 = h21s * (h11 + h22 - rt1r - rt2r)
    v3 = h21s * h32
    sn = abs(v1) + abs(v2) + abs(v3)
    sns = 1.0 if sn == 0 else sn
    return np.array([v1, v2, v3]) / sns


def ref_sweep_np_mb(Hp, Zp, m, i, v0, sigs, scs, nb, gap):
    """f64 multi-bulge reference: tick-order interleaving, bulge b trails
    b-1 by gap columns; trailing bulges' first columns re-derived at their
    introduction tick from the current leading product."""
    p, N, _ = Hp.shape
    H = Hp.copy()
    Z = Zp.copy()
    for kk in range(m, i + (nb - 1) * gap):
        for b in range(nb):
            k = kk - b * gap
            if k < m or k > i - 1:
                continue
            first = (k == m)
            nr3 = (i - k + 1) >= 3
            col = H[0][k:k + 3, k - 1].copy()
            if first:
                vk = v0.copy() if b == 0 else _lead_v0_np(H, m, scs, sigs[b])
            else:
                vk = col.copy()
            if not nr3:
                vk = vk.copy()
                vk[2] = 0.0
            M3, beta = _mof(vk)
            if not first:
                H[0][k:k + 3, k - 1] = [beta, 0.0,
                                        0.0 if k < i - 1 else col[2]]
            H[0][k:k + 3, k:] = M3 @ H[0][k:k + 3, k:]
            tgt = p - 1 if p > 1 else 0
            hi_r = min(k + 3, i) + 1
            H[tgt][:hi_r, k:k + 3] = H[tgt][:hi_r, k:k + 3] @ M3
            Z[0][:, k:k + 3] = Z[0][:, k:k + 3] @ M3
            for f in range(p - 1, 0, -1):
                colv = H[f][k:k + 3, k].copy()
                if not nr3:
                    colv[2] = 0.0
                M3b, beta2 = _mof(colv)
                H[f][k:k + 3, k] = [beta2, 0.0, 0.0]
                H[f][k:k + 3, k + 1:] = M3b @ H[f][k:k + 3, k + 1:]
                H[f - 1][:hi_r, k:k + 3] = H[f - 1][:hi_r, k:k + 3] @ M3b
                Z[f][:, k:k + 3] = Z[f][:, k:k + 3] @ M3b
                if nr3:
                    xc = H[f][k + 1:k + 3, k + 1].copy()
                    M2, betab = _mof(xc)
                    H[f][k + 1:k + 3, k + 1] = [betab, 0.0]
                    H[f][k + 1:k + 3, k + 2:] = M2 @ H[f][k + 1:k + 3, k + 2:]
                    H[f - 1][:hi_r, k + 1:k + 3] = \
                        H[f - 1][:hi_r, k + 1:k + 3] @ M2
                    Z[f][:, k + 1:k + 3] = Z[f][:, k + 1:k + 3] @ M2
    return H, Z


def _mb_sig(rng, nb):
    sigs3 = [rng.standard_normal(3) * 0.5 for _ in range(nb)]
    flat = []
    for s3 in sigs3:
        for vv in s3:
            vh = np.float32(vv)
            flat += [vh, np.float32(np.float64(vv) - np.float64(vh))]
    return sigs3, np.array(flat, np.float32)


@pytest.mark.parametrize("p,n,m,i,nb", [
    (1, 12, 0, 11, 2),     # p=1: creation band apply targets factor 0
    (2, 12, 0, 11, 2),
    (4, 12, 0, 11, 2),
    (2, 16, 0, 15, 3),
    (3, 12, 2, 8, 2),      # interior window
])
def test_sweep_mb_matches_f64_reference(p, n, m, i, nb):
    gap = 3
    rng = np.random.default_rng(p * 100 + n + nb)
    Hp, Zp, v0 = _mk_problem(p, n, rng)
    sigs3, sigflat = _mb_sig(rng, nb)
    scs = np.ones(p)
    Href, Zref = ref_sweep_np_mb(Hp, Zp, m, i, v0, sigs3, scs, nb, gap)
    Href = _enforce(Href)

    Hff = ff.from_f64(jnp.asarray(Hp))
    ZTff = ff.from_f64(jnp.asarray(np.swapaxes(Zp, 1, 2)))
    v0ff = ff.from_f64(jnp.asarray(v0))
    Hout, ZTout = chase_sweep_ff_mb(
        Hff, ZTff, jnp.int32(m), jnp.int32(i), v0ff,
        jnp.asarray(sigflat), jnp.asarray(scs.astype(np.float32)),
        jnp.int32(nb), NB=nb, GAP=gap, want_z=True, interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))
    Zds = np.swapaxes(np.asarray(ff.to_f64(ZTout)), 1, 2)
    scale = np.abs(Hp).max()
    assert np.abs(Hds - Href).max() < 1e-11 * scale, \
        f"H mismatch {np.abs(Hds - Href).max():.2e}"
    assert np.abs(Zds - Zref).max() < 1e-11, \
        f"Z mismatch {np.abs(Zds - Zref).max():.2e}"


def test_sweep_mb_partial_active():
    """nbact < NB: only the active bulges' chains run; inactive log slices
    are skipped by the gated B kernels."""
    p, n, m, i, nb = 2, 12, 0, 11, 3
    gap = 3
    rng = np.random.default_rng(77)
    Hp, Zp, v0 = _mk_problem(p, n, rng)
    sigs3, sigflat = _mb_sig(rng, nb)
    scs = np.ones(p)
    # reference with only 2 active bulges
    Href, Zref = ref_sweep_np_mb(Hp, Zp, m, i, v0, sigs3[:2], scs, 2, gap)
    Href = _enforce(Href)
    Hff = ff.from_f64(jnp.asarray(Hp))
    ZTff = ff.from_f64(jnp.asarray(np.swapaxes(Zp, 1, 2)))
    v0ff = ff.from_f64(jnp.asarray(v0))
    Hout, ZTout = chase_sweep_ff_mb(
        Hff, ZTff, jnp.int32(m), jnp.int32(i), v0ff,
        jnp.asarray(sigflat), jnp.asarray(scs.astype(np.float32)),
        jnp.int32(2), NB=nb, GAP=gap, want_z=True, interpret=True)
    Hds = np.asarray(ff.to_f64(Hout))
    Zds = np.swapaxes(np.asarray(ff.to_f64(ZTout)), 1, 2)
    assert np.abs(Hds - Href).max() < 1e-11 * np.abs(Hp).max()
    assert np.abs(Zds - Zref).max() < 1e-11
