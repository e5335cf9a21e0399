"""Scalar numpy implementation of the real periodic QR algorithm (MB03WD).

Two purposes:

* the HONEST CPU baseline for bench.py's ``vs_baseline``: the reference
  (RalphAS/PeriodicSchurDecompositions.jl) is scalar Fortran-style Julia;
  Julia is not in this image, so this is the same algorithm shape
  (sequential element-wise Givens/Householder sweeps, LAPACK-grade float64)
  in numpy, timed on the host CPU (reference hot loop:
  /root/reference/src/PeriodicSchurDecompositions.jl:461-1054);
* a float64 step-by-step shadow of the TPU ds core (ops/pqr_ff.py) for
  debugging: with ``ulp``/``smlnum`` overridden to the double-single values
  it takes identical branch decisions, so states can be compared after
  every outer iteration.

Semantics mirror ops/pqr_real.py (which documents its deviations from the
reference); see that module for the reference file:line map.
"""
from __future__ import annotations

import numpy as np

DAT1 = 0.75
DAT2 = -0.4375


def _refl(x):
    """xLARFG on a small vector; returns (w, tau, beta) with w[0] = 1."""
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


def _givens(f, g):
    if g == 0:
        return 1.0, 0.0, f
    if f == 0:
        return 0.0, (1.0 if g >= 0 else -1.0), abs(g)
    d = np.hypot(f, g)
    r = d if f >= 0 else -d
    return abs(f) / d, g / r, r


def _lanv2(a, b, c, d, eps):
    """dlanv2 (mirrors ops/lanv2.py's branch structure)."""
    if c == 0:
        cs, sn = 1.0, 0.0
    elif b == 0:
        a, b, c, d = d, -c, 0.0, a
        cs, sn = 0.0, 1.0
    elif (a - d) == 0 and np.sign(b) != np.sign(c):
        cs, sn = 1.0, 0.0
    else:
        temp = a - d
        p = 0.5 * temp
        bcmax = max(abs(b), abs(c))
        bcmis = min(abs(b), abs(c)) * np.sign(b) * np.sign(c)
        scale = max(abs(p), bcmax)
        z = (p / scale) * p + (bcmax / scale) * bcmis
        if z >= 4.0 * eps:
            z = p + np.sign(p if p != 0 else 1.0) * abs(
                np.sqrt(scale) * np.sqrt(z))
            a_ = d + z
            d_ = d - (bcmax / z) * bcmis
            tau = np.hypot(c, z)
            cs, sn = z / tau, c / tau
            b_ = b - c
            c_ = 0.0
            a, b, c, d = a_, b_, c_, d_
        else:
            sigma = b + c
            tau = np.hypot(sigma, temp)
            cs = np.sqrt(0.5 * (1.0 + abs(sigma) / tau))
            sn = -(p / (tau * cs)) * np.sign(sigma)
            aa = a * cs + b * sn
            bb = -a * sn + b * cs
            cc = c * cs + d * sn
            dd = -c * sn + d * cs
            a_ = aa * cs + cc * sn
            b_ = bb * cs + dd * sn
            c_ = -aa * sn + cc * cs
            d_ = -bb * sn + dd * cs
            mid = 0.5 * (a_ + d_)
            a, b, c, d = mid, b_, c_, mid
            if c != 0:
                if b != 0:
                    if np.sign(b) == np.sign(c):
                        sab = np.sqrt(abs(b))
                        sac = np.sqrt(abs(c))
                        p2 = sab * sac * (1.0 if c > 0 else -1.0)
                        tau2 = 1.0 / np.sqrt(abs(b + c))
                        a = mid + p2
                        d = mid - p2
                        b = b - c
                        c = 0.0
                        cs1 = sab * tau2
                        sn1 = sac * tau2
                        cs, sn = cs * cs1 - sn * sn1, cs * sn1 + sn * cs1
                else:
                    b, c = -c, 0.0
                    cs, sn = -sn, cs
    rti = np.sqrt(abs(b)) * np.sqrt(abs(c)) if c != 0 else 0.0
    return a, b, c, d, cs, sn, a, rti, d, -rti


def _band_products(H, n):
    p = len(H)
    P1 = np.ones(n)
    P2 = np.zeros(n)
    P3 = np.zeros(n)
    for l in range(1, p):
        D = np.diagonal(H[l]).copy()[:n]
        U = np.concatenate([np.diagonal(H[l], 1)[:n - 1], [0.0]])
        V = np.concatenate([np.diagonal(H[l], 2)[:n - 2], [0.0, 0.0]])
        D1 = np.concatenate([D[1:], [0.0]])
        U1 = np.concatenate([U[1:], [0.0]])
        D2 = np.concatenate([D[2:], [0.0, 0.0]])
        P3 = P1 * V + P2 * U1 + P3 * D2
        P2 = P1 * U + P2 * D1
        P1 = P1 * D
    d0 = np.diagonal(H[0]).copy()[:n]
    u0 = np.concatenate([np.diagonal(H[0], 1)[:n - 1], [0.0]])
    s0 = np.concatenate([[0.0], np.diagonal(H[0], -1)[:n - 1]])
    P1m = np.concatenate([[1.0], P1[:-1]])
    P2m = np.concatenate([[0.0], P2[:-1]])
    P3m = np.concatenate([[0.0], P3[:-1]])
    hsub = s0 * P1m
    hdiag = s0 * P2m + d0 * P1
    P11 = np.concatenate([P1[1:], [0.0]])
    hsup = s0 * P3m + d0 * P2 + u0 * P11
    return hdiag, hsub, hsup


class Trace:
    """Optional per-iteration state capture for debugging."""

    def __init__(self):
        self.states = []

    def snap(self, H, Z, i, l, its, tag):
        self.states.append((np.array([h.copy() for h in H]),
                            np.array([z.copy() for z in Z]),
                            int(i), int(l), int(its), tag))


def pqr_real_numpy(H, Z=None, maxitfac=30, ulp=None, smlnum=None,
                   ulpx=None, trace=None):
    """Real periodic QR on Hessenberg/triangular stack H (p, n, n).

    Returns (T, Z, wr, wi, ok).  ``ulp``/``smlnum``/``ulpx`` default to
    float64 values; override with the ds values to shadow the TPU core.
    """
    H = [h.astype(np.float64).copy() for h in H]
    p = len(H)
    n = H[0].shape[0]
    if ulp is None:
        ulp = np.finfo(np.float64).eps
    if smlnum is None:
        smlnum = np.finfo(np.float64).tiny * (n / ulp)
    if ulpx is None:
        ulpx = ulp ** 1.25
    Z = [np.eye(n) if Z is None else Z[f].astype(np.float64).copy()
         for f in range(p)]
    wr = np.zeros(n)
    wi = np.zeros(n)
    maxit = maxitfac * n
    hnorms = ulp * n * np.array([np.abs(h).sum(axis=0).max() for h in H])

    # ghost pad
    N = n + 1
    Hp = [np.zeros((N, N)) for _ in range(p)]
    Zp = [np.zeros((N, N)) for _ in range(p)]
    for f in range(p):
        Hp[f][:n, :n] = H[f]
        Zp[f][:n, :n] = Z[f]
    H, Z = Hp, Zp

    i = n - 1
    l = 0
    its = 1
    jiter = 0
    while i >= 0 and jiter < maxit:
        jiter += 1
        Hn = [h[:n, :n] for h in H]
        hdiag, hsub, hsup = _band_products(Hn, n)

        # deflation scan
        lnew = l if i > l else i
        if i > l:
            found = -1
            for k in range(i, l, -1):
                h11 = hdiag[k - 1]
                h12 = hsup[k - 1]
                h21 = hsub[k]
                h22 = hdiag[k]
                tst1 = abs(h11) + abs(h22)
                ab = max(abs(h21), abs(h12))
                ba = min(abs(h21), abs(h12))
                aa = max(abs(h22), abs(h11 - h22))
                bb = min(abs(h22), abs(h11 - h22))
                s = aa + ab
                ss = 1.0 if s == 0 else s
                ok_at = ba * (ab / ss) <= max(smlnum, ulpx * (bb * (aa / ss)))
                if abs(h21) <= smlnum or (abs(h21) <= ulp * tst1 and ok_at):
                    found = k
                    break
            lnew = found if found >= 0 else l

        # subdiagonal repair
        if lnew > 0 and p > 1 and abs(H[0][lnew, lnew - 1]) > max(
                ulp * (abs(H[0][lnew - 1, lnew - 1])
                       + abs(H[0][lnew, lnew])), smlnum):
            for k in range(i, lnew - 1, -1):
                for f in range(0, p - 1):
                    x0 = H[f][k, k]
                    x1 = H[f][k, k - 1]
                    w, tau, beta = _refl(np.array([x0, x1]))
                    wv = np.array([w[1], 1.0])
                    M2 = np.eye(2) - tau * np.outer(wv, wv)
                    H[f][k, k - 1] = 0.0
                    H[f][k, k] = beta
                    H[f][:k, k - 1:k + 1] = H[f][:k, k - 1:k + 1] @ M2
                    H[f + 1][k - 1:k + 1, k - 1:] = \
                        M2 @ H[f + 1][k - 1:k + 1, k - 1:]
                    Z[f + 1][:, k - 1:k + 1] = Z[f + 1][:, k - 1:k + 1] @ M2
                if k < i:
                    x0 = H[p - 1][k + 1, k + 1]
                    x1 = H[p - 1][k + 1, k]
                    w, tau, beta = _refl(np.array([x0, x1]))
                    wv = np.array([w[1], 1.0])
                    M2 = np.eye(2) - tau * np.outer(wv, wv)
                    H[p - 1][k + 1, k] = 0.0
                    H[p - 1][k + 1, k + 1] = beta
                    H[p - 1][:k + 1, k:k + 2] = H[p - 1][:k + 1, k:k + 2] @ M2
                    H[0][k:k + 2, k:] = M2 @ H[0][k:k + 2, k:]
                    Z[0][:, k:k + 2] = Z[0][:, k:k + 2] @ M2
            H[p - 1][lnew, lnew - 1] = 0.0
        if lnew > 0:
            H[0][lnew, lnew - 1] = 0.0

        if lnew >= i - 1:
            # deflate
            if lnew == i:
                wr[i] = hdiag[i]
                wi[i] = 0.0
            else:
                hp11, hp12, hp22 = 1.0, 0.0, 1.0
                for f in range(1, p):
                    d1 = H[f][i - 1, i - 1]
                    d2 = H[f][i, i]
                    u = H[f][i - 1, i]
                    hp12 = hp11 * u + hp12 * d2
                    hp11 = hp11 * d1
                    hp22 = hp22 * d2
                a11, a12 = H[0][i - 1, i - 1], H[0][i - 1, i]
                a21, a22 = H[0][i, i - 1], H[0][i, i]
                bh11 = a11 * hp11
                bh12 = a11 * hp12 + a12 * hp22
                bh21 = a21 * hp11
                bh22 = a21 * hp12 + a22 * hp22
                (_, _, cc_, _, cs0, sn0,
                 w1r, w1i, w2r, w2i) = _lanv2(bh11, bh12, bh21, bh22, ulp)
                lam_real = cc_ == 0
                wr[i - 1], wi[i - 1] = w1r, w1i
                wr[i], wi[i] = w2r, w2i

                jmin, jmax = -1, -1
                for f in range(1, p):
                    if abs(H[f][i - 1, i - 1]) <= hnorms[f] and jmin < 0:
                        jmin = f
                for f in range(p - 1, 0, -1):
                    if abs(H[f][i, i]) <= hnorms[f] and jmax < 0:
                        jmax = f
                if jmin >= 0 and jmax >= 0:
                    if jmin <= p - jmax:
                        jmax = -1
                    else:
                        jmin = -1

                if jmin >= 1:
                    for f in range(0, jmin - 1):
                        x0 = H[f][i, i]
                        x1 = H[f][i, i - 1]
                        w, tau, beta = _refl(np.array([x0, x1]))
                        wv = np.array([w[1], 1.0])
                        M2 = np.eye(2) - tau * np.outer(wv, wv)
                        H[f][i, i - 1] = 0.0
                        H[f][i, i] = beta
                        H[f][:i, i - 1:i + 1] = H[f][:i, i - 1:i + 1] @ M2
                        H[f + 1][i - 1:i + 1, i - 1:] = \
                            M2 @ H[f + 1][i - 1:i + 1, i - 1:]
                        Z[f + 1][:, i - 1:i + 1] = \
                            Z[f + 1][:, i - 1:i + 1] @ M2
                else:
                    a1 = np.hypot(w1r, w1i)
                    a2 = np.hypot(w2r, w2i)
                    amx, amn = max(a1, a2), min(a1, a2)
                    prod0 = (w1r == 0 and w1i == 0) or (w2r == 0 and
                                                        w2i == 0)
                    tinyrat = amn < ulp * amx
                    replaceG = ((jmax >= 1) and lam_real) or prod0 or \
                        ((not prod0) and lam_real and tinyrat)
                    for _ in range(20):
                        if replaceG:
                            c, s, _ = _givens(H[0][i - 1, i - 1],
                                              H[0][i, i - 1])
                        else:
                            c, s = cs0, sn0
                        L = np.array([[c, s], [-s, c]])
                        Radj = np.array([[c, -s], [s, c]])
                        H[0][i - 1:i + 1, i - 1:] = \
                            L @ H[0][i - 1:i + 1, i - 1:]
                        tgt = p - 1 if p > 1 else 0
                        H[tgt][:i + 1, i - 1:i + 1] = \
                            H[tgt][:i + 1, i - 1:i + 1] @ Radj
                        Z[0][:, i - 1:i + 1] = Z[0][:, i - 1:i + 1] @ Radj
                        for f in range(p - 1, 0, -1):
                            if f < jmax + 1:
                                continue
                            x = np.array([H[f][i - 1, i - 1],
                                          H[f][i, i - 1]])
                            w_, tau_, beta_ = _refl(x)
                            M2 = np.eye(2) - tau_ * np.outer(w_, w_)
                            H[f][i - 1, i - 1] = beta_
                            H[f][i, i - 1] = 0.0
                            H[f][i - 1:i + 1, i:] = \
                                M2 @ H[f][i - 1:i + 1, i:]
                            H[f - 1][:i + 1, i - 1:i + 1] = \
                                H[f - 1][:i + 1, i - 1:i + 1] @ M2
                            Z[f][:, i - 1:i + 1] = \
                                Z[f][:, i - 1:i + 1] @ M2
                        sub = abs(H[0][i, i - 1])
                        if (not replaceG) or sub < max(smlnum, ulp * amx):
                            break
                        replaceG = True
                    if jmax >= 0 or bh21 == 0:
                        H[0][i, i - 1] = 0.0
                    if jmax >= 1:
                        H[jmax][i, i - 1] = 0.0

                l1 = H[0][i - 1, i - 1]
                l2 = H[0][i, i]
                for f in range(1, p):
                    l1 *= H[f][i - 1, i - 1]
                    l2 *= H[f][i, i]
                if lam_real and abs(l1 - wr[i - 1]) > abs(l1 - wr[i]):
                    wr[i - 1], wr[i] = wr[i], wr[i - 1]
            if trace is not None:
                trace.snap(H, Z, lnew - 1, 0, its, "deflate")
            itleft = its
            i = lnew - 1
            l = 0
            its = 1
            continue

        # double-shift sweep
        m = lnew
        exc1 = its == 10
        exc2 = (its % 10 == 0) and not exc1
        exc = exc1 or exc2
        if exc1:
            sE = abs(hsub[min(lnew + 1, n - 1)]) + \
                abs(hsub[min(lnew + 2, n - 1)])
        else:
            sE = abs(hsub[i]) + abs(hsub[max(i - 1, 0)])
        h44E = DAT1 * sE + (hdiag[lnew] if exc1 else hdiag[i])
        h33E = h44E
        h43h34E = DAT2 * sE * sE
        h44 = hdiag[i]
        h33 = hdiag[i - 1]
        h43 = hsub[i]
        h34 = hsup[i - 1]
        ssh = abs(h33) + abs(h34) + abs(h43) + abs(h44)
        if ssh == 0:
            rt1r = rt2r = rt1i = rt2i = 0.0
        else:
            h33n, h44n = h33 / ssh, h44 / ssh
            h34n, h43n = h34 / ssh, h43 / ssh
            trc = (h33n + h44n) * 0.5
            disc = (h33n - trc) * (h44n - trc) - h34n * h43n
            rtdisc = np.sqrt(abs(disc))
            if disc >= 0:
                rt1r = rt2r = trc * ssh
                rt1i = rtdisc * ssh
                rt2i = -rt1i
            else:
                r1, r2 = trc + rtdisc, trc - rtdisc
                pick = r1 if abs(r1 - h44n) <= abs(r2 - h44n) else r2
                rt1r = rt2r = pick * ssh
                rt1i = rt2i = 0.0
        h11 = hdiag[m]
        h12 = hsup[m]
        h21 = hsub[min(m + 1, n - 1)]
        h22 = hdiag[min(m + 1, n - 1)]
        hsub_m2 = hsub[min(m + 2, n - 1)]
        if exc:
            h44s = h44E - h11
            h33s = h33E - h11
            h21s_ = h21 if h21 != 0 else 1.0
            v1 = (h33s * h44s - h43h34E) / h21s_ + h12
            v2 = h22 - h11 - h33s - h44s
            v3 = hsub_m2
        else:
            sv = abs(h11 - rt2r) + abs(rt2i) + abs(h21)
            svs = sv if sv != 0 else 1.0
            h21s = h21 / svs
            v1 = h21s * h12 + (h11 - rt1r) * ((h11 - rt2r) / svs) - \
                rt1i * (rt2i / svs)
            v2 = h21s * (h11 + h22 - rt1r - rt2r)
            v3 = h21s * hsub_m2
        snorm = abs(v1) + abs(v2) + abs(v3)
        if snorm == 0:
            snorm = 1.0
        v0 = np.array([v1, v2, v3]) / snorm

        # the sweep (identical op order to the reference; see
        # tests/test_pallas_sweep.ref_sweep_np)
        for k in range(m, i):
            nr3 = (i - k + 1) >= 3
            col = H[0][k:k + 3, k - 1].copy()
            vk = col.copy() if k > m else v0.copy()
            if not nr3:
                vk[2] = 0.0
            M3, beta = _mof(vk)
            if k > m:
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
        if trace is not None:
            trace.snap(H, Z, i, lnew, its, "sweep")
        l = lnew
        its += 1

    ok = i < 0
    T = np.array([h[:n, :n] for h in H])
    Zo = np.array([z[:n, :n] for z in Z])
    # subdiagonal scrub
    for r in range(1, n):
        if wi[r - 1] == 0:
            T[0][r, r - 1] = 0.0
    for f in range(1, p):
        T[f] = np.triu(T[f])
    return T, Zo, wr, wi, ok
