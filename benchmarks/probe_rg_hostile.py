"""Adversarial validation of the re-designed rg shift scheme (VERDICT #7).

The repo replaced the reference's MB03AF/MB03AB explicit-shift cascade
(/root/reference/src/rgeneralized.jl:64-66,804-887: 10 implicit / 1
explicit alternation as stagnation insurance) with exact window-product
Wilkinson shifts plus random exceptional rotations every 10 sweeps
(ops/pqz_real.py module docstring).  This harness drives HOSTILE draw
classes through the native C++ core — which runs the SAME shift scheme —
and reports iteration counts against the 120n budget; any draw beyond
60n would justify implementing the explicit-shift fallback.

Classes (SURVEY §4 + the round-3 stall taxonomy):
  * exp-split: Kressner's exponentially split spectrum at p=20 — factor
    diagonals graded fac^1..fac^3 so cycle eigenvalues span fac^p..fac^3p;
  * near-singular inverted factors: inverted-factor diagonals graded down
    to ~1e-10 (just above the deflation threshold, so the nonsingular
    fast path keeps them);
  * graded bands at n=128/192/256: the draw family whose product-band
    grading froze the n=512 real core in round 3 (BASELINE.md).

Usage: python benchmarks/probe_rg_hostile.py [quick]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import os  # noqa: E402
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402
xla_bridge._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu import native  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg import (  # noqa: E402
    phessenberg_signed_core)

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"


def run_case(tag, A, S, budget_frac_warn=0.5):
    p, n, _ = A.shape
    H, _ = phessenberg_signed_core(jnp.asarray(A), S, want_q=False)
    Hn = np.asarray(H)
    t0 = time.time()
    rc, niter, out = native.pqz_real_gen_niter_cpu(Hn, S, want_z=True)
    dt = time.time() - t0
    budget = 120 * n
    status = {0: "ok", 1: "BUDGET-EXHAUSTED", 2: "declined(singular)"}[rc]
    flag = ""
    if rc == 0 and niter > 60 * n:
        flag = "  <-- BEYOND 60n"
    if rc == 0:
        T, Z, alr, ali, be, sc = out
        scale = np.abs(Hn).max()
        worst = 0.0
        for l in range(p):
            ln = (l + 1) % p
            R = (Z[l].T @ Hn[l] @ Z[ln]) if S[l] else (Z[ln].T @ Hn[l] @ Z[l])
            worst = max(worst, np.abs(R - T[l]).max() / scale)
        acc = f" backerr {worst:.1e}"
    else:
        acc = ""
    print(f"[rg-hostile] {tag}: {status} niter={niter} "
          f"({niter / n:.1f}n of {budget // n}n budget, {dt:.2f}s){acc}{flag}",
          flush=True)
    return rc, niter, n


def exp_split(p, n, fac, seed):
    """Exponentially split spectrum (testfuncs.jl:412-421 pattern),
    mixed signature."""
    r = np.random.default_rng(seed)
    A = np.zeros((p, n, n))
    for l in range(p):
        d = fac ** (1 + 2 * r.random(n))
        Tl = np.triu(r.standard_normal((n, n)), 1) * d.max() * 0.1
        np.fill_diagonal(Tl, d)
        q1, _ = np.linalg.qr(r.standard_normal((n, n)))
        q2, _ = np.linalg.qr(r.standard_normal((n, n)))
        A[l] = q1 @ Tl @ q2.T
    S = tuple((l % 2 == 0) or (l == 0) for l in range(p))
    return A, S


def near_singular_inverted(p, n, floor, seed):
    r = np.random.default_rng(seed)
    A = r.standard_normal((p, n, n))
    S = tuple(l % 2 == 0 for l in range(p))
    for l in range(p):
        if not S[l]:
            # graded diagonal down to `floor` via triangular construction
            Tl = np.triu(r.standard_normal((n, n)))
            np.fill_diagonal(
                Tl, np.logspace(0, np.log10(floor), n) * np.sign(
                    r.standard_normal(n)))
            q1, _ = np.linalg.qr(r.standard_normal((n, n)))
            q2, _ = np.linalg.qr(r.standard_normal((n, n)))
            A[l] = q1 @ Tl @ q2.T
    return A, S


def graded_band(p, n, seed):
    """The round-3 stall family: plain Gaussian draws at sizes where the
    product band grades across ~20 decades."""
    r = np.random.default_rng(seed)
    A = r.standard_normal((p, n, n))
    S = tuple(l % 2 == 0 for l in range(p))
    return A, S


def main():
    assert native.available()
    worst = 0.0
    fails = []
    cases = []
    # exp-split p=20 (n small: the reference's own hard class is n=6 p=20)
    for seed in range(5 if QUICK else 10):
        cases.append((f"exp-split p=20 n=8 fac=2 seed={seed}",)
                     + exp_split(20, 8, 2.0, seed))
    for seed in range(3 if QUICK else 6):
        cases.append((f"exp-split p=12 n=16 fac=3 seed={seed}",)
                     + exp_split(12, 16, 3.0, seed))
    # near-singular inverted factors
    for floor in (1e-6, 1e-10):
        for seed in range(2 if QUICK else 4):
            cases.append(
                (f"near-sing-inv p=6 n=24 floor={floor:g} seed={seed}",)
                + near_singular_inverted(6, 24, floor, seed))
    # graded bands
    sizes = [(8, 128)] if QUICK else [(8, 128), (12, 192), (16, 256)]
    for (p, n) in sizes:
        for seed in range(2 if QUICK else 3):
            cases.append((f"graded p={p} n={n} seed={seed}",)
                         + graded_band(p, n, seed))

    for (tag, A, S) in cases:
        rc, niter, n = run_case(tag, A, S)
        if rc == 0:
            worst = max(worst, niter / n)
        elif rc == 1:
            fails.append(tag)
    print(f"[rg-hostile] WORST converged iteration count: {worst:.1f}n "
          f"(budget 120n, explicit-shift trigger bar 60n)", flush=True)
    if fails:
        print(f"[rg-hostile] BUDGET-EXHAUSTED cases: {fails}", flush=True)
        sys.exit(1)
    print("[rg-hostile] ALL CONVERGED", flush=True)


if __name__ == "__main__":
    main()
