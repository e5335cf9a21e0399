"""End-to-end PUBLIC-API journey on the chip.

Everything a reference user does, through `pschur`/`ordschur`/`eigvecs`
on the default (TPU) device: real plain, complex mixed-S, and real
mixed-S input classes, each followed by the built-in oracle, a
reordering, and (real plain) eigenvector extraction.  This validates
the API ROUTING on hardware — the ds pipelines off-CPU, host-pinned
reordering on chip-resident outputs — not just the cores.

Usage: python benchmarks/probe_e2e_chip.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import periodicschurdecompositions_jl_tpu as psd  # noqa: E402

rng = np.random.default_rng(2024)
dev = jax.devices()[0]
cpu = jax.devices("cpu")[0]
print(f"[e2e] default device: {dev}", flush=True)
fails = 0


class _cpu_checks:
    """Pin the ORACLE/reorder side to the host CPU.

    The probe validates pschur's TPU routing; check_psd / ordschur /
    eigvecs build their own small jax programs, and every FRESH small
    program needs the remote compile service — observed 2026-08-21
    costing ~30 min/leg (a trivial fresh program compiled in 87 s) and
    dying UNAVAILABLE.  The decomposition itself runs on the chip with
    cached programs; the checks belong on the host anyway.
    """

    def __enter__(self):
        self._ctx = jax.default_device(cpu)
        self._ctx.__enter__()

    def __exit__(self, *exc):
        self._ctx.__exit__(*exc)


def step(tag, fn):
    global fails
    t0 = time.time()
    try:
        msg = fn()
        print(f"[e2e] {tag}: OK {msg} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        fails += 1
        print(f"[e2e] {tag}: FAIL {type(e).__name__}: {e} "
              f"({time.time()-t0:.1f}s)", flush=True)


def real_plain():
    # p=8 n=128, maxitfac=40: the shapes/trace every round-3 probe
    # already compiled — the remote compile service drops NEW programs
    # under tunnel flaps (UNAVAILABLE), so the journey probe sticks to
    # the warm cache
    p, n = 8, 128
    A = rng.standard_normal((p, n, n))
    P = psd.pschur(jnp.asarray(A), "R", maxitfac=40)
    with _cpu_checks():
        P = psd.PeriodicSchur(
            Ts=jnp.asarray(np.asarray(P.Ts)),
            Zs=jnp.asarray(np.asarray(P.Zs)),
            values=jnp.asarray(np.asarray(P.values)),
            orientation=P.orientation, schurindex=P.schurindex)
        ok, rep = psd.check_psd(P, A, qtol=500.0, tol=2000.0)
        assert ok and rep["residual_rel"] < 1e-12, rep
        # reorder the largest quarter to the top
        v = np.abs(np.asarray(P.values))
        sel = list(v >= np.sort(v)[-n // 4])
        P2 = psd.ordschur(P, sel)
        ok2, rep2 = psd.check_psd(P2, A, qtol=500.0, tol=2000.0)
        assert ok2, rep2
        top = np.sort(np.abs(np.asarray(P2.values))[:sum(sel)])
        want = np.sort(v[np.asarray(sel)])
        assert np.allclose(top, want, rtol=1e-8)
        # eigenvectors of the two largest: right orientation satisfies
        # A[l] V[(l+1)%p] = mu V[l] with mu = lam^(1/p) (tests/test_vectors)
        v2 = np.abs(np.asarray(P2.values))
        sel2 = list(v2 >= np.sort(v2)[-2])
        Vs = psd.eigvecs(P2, sel2)
    lams = np.asarray(P2.values)[np.asarray(sel2)]
    for ki in range(Vs[0].shape[1]):
        mu = complex(lams[ki]) ** (1.0 / p)
        for l in range(p):
            lhs = A[l] @ np.asarray(Vs[(l + 1) % p])[:, ki]
            rhs = mu * np.asarray(Vs[l])[:, ki]
            ref = abs(mu) * np.linalg.norm(rhs) + 1e-30
            assert np.linalg.norm(lhs - rhs) < 1e-7 * max(ref, 1), (ki, l)
    return f"resid {rep['residual_rel']:.1e}, reorder+eigvecs ok"


def complex_mixed():
    # (p=6, n=128, alternating S): the EXACT shape/static-arg combination
    # of benchmarks/probe_complex_ff.py's round-3 on-chip record — the
    # remote compile service content-cache can hit its big chunked
    # program.  The original (4, 32) leg needed a fresh ~25 min compile
    # that today's degraded service drops with UNAVAILABLE every time.
    p, n = 6, 128
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += np.sign(np.linalg.det(A[l]).real or 1.0) * 3 * np.eye(n)
    S = (True, False, True, False, True, False)
    # numpy input: a jnp.asarray here would device_put complex128 onto
    # the axon chip (no complex dtype; the runtime stalls UNAVAILABLE).
    # The driver's _stack also pins complex stacking to the CPU now.
    G = psd.pschur(A, "R", S=S)
    with _cpu_checks():
        G = psd.GeneralizedPeriodicSchur(
            S=G.S, schurindex=G.schurindex,
            Ts=jnp.asarray(np.asarray(G.Ts)),
            Zs=jnp.asarray(np.asarray(G.Zs)),
            alpha=jnp.asarray(np.asarray(G.alpha)),
            beta=jnp.asarray(np.asarray(G.beta)),
            alphascale=jnp.asarray(np.asarray(G.alphascale)),
            orientation=G.orientation)
        ok, rep = psd.check_psd(G, A, qtol=500.0, tol=2000.0)
        assert ok and rep["residual_rel"] < 1e-12, rep
        v = np.abs(np.asarray(G.values))
        sel = list(v >= np.sort(v)[-4])
        G2 = psd.ordschur(G, sel)
        ok2, rep2 = psd.check_psd(G2, A, qtol=500.0, tol=2000.0)
        assert ok2, rep2
    return f"resid {rep['residual_rel']:.1e}, reorder ok"


def real_mixed():
    p, n = 4, 32
    A = rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += np.sign(np.linalg.det(A[l])) * 3 * np.eye(n)
    S = (True, False, True, False)
    G = psd.pschur(jnp.asarray(A), "R", S=S)   # ds rg pipeline off-CPU
    with _cpu_checks():
        ok, rep = psd.check_psd(G, A, qtol=500.0, tol=2000.0)
        assert ok and rep["residual_rel"] < 1e-12, rep
    return f"resid {rep['residual_rel']:.1e} (ds rg route)"


import os
step("real plain pschur+ordschur+eigvecs (p=8 n=128)", real_plain)
if os.environ.get("PSD_E2E_ALL", "") == "1":
    # fresh-shape compiles — only when the remote compile service is
    # healthy (each costs a ~5-10 min remote compile)
    step("complex mixed-S pschur+ordschur (p=6 n=128)", complex_mixed)
    step("real mixed-S pschur via ds rg route (p=4 n=32)", real_mixed)
print(f"[e2e] {'ALL OK' if fails == 0 else f'{fails} FAILURES'}",
      flush=True)
sys.exit(0 if fails == 0 else 1)
