"""On-chip partial_pschur smoke: the device-resident Krylov path.

Runs partial_pschur with ShardedCycleOps on the single real TPU device
(1-device mesh): the factor stack and Arnoldi bases live on-chip and
matvec + iterated CGS run as ONE jitted program per step (the production
multi-chip path, reference src/krylov.jl:239,380-391 devarrays branches).
Checks the Ritz values against the known construction spectrum.

Usage: python benchmarks/probe_krylov_chip.py [p] [n] [nev]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 4
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
nev = int(sys.argv[3]) if len(sys.argv) > 3 else 4

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

from periodicschurdecompositions_jl_tpu.models.krylov import \
    partial_pschur  # noqa: E402
from periodicschurdecompositions_jl_tpu.parallel.krylov_ops import \
    ShardedCycleOps  # noqa: E402
from periodicschurdecompositions_jl_tpu.parallel.mesh import \
    make_mesh  # noqa: E402

rng = np.random.default_rng(11)
q = np.linalg.qr(rng.standard_normal((n, n)))[0]
A = []
for l in range(p):
    T = np.triu(rng.standard_normal((n, n)) * 0.05)
    np.fill_diagonal(T, 1.02 ** np.arange(n))
    A.append(q @ T @ q.T)
A = np.stack(A)
lam_top = np.sort((1.02 ** np.arange(n)) ** p)[-nev:]

mesh = make_mesh(1, names=("rows",), devices=jax.devices()[:1])
print(f"[krylov-chip] p={p} n={n} nev={nev} device={jax.devices()[0]}",
      flush=True)
t0 = time.time()
sops = ShardedCycleOps(A, mesh)
ps, hist = partial_pschur(sops, nev, "LM")
t1 = time.time() - t0
v = np.sort(np.abs(np.asarray(ps.values)))[-nev:]
err = np.abs(v - lam_top).max() / lam_top.max()
print(f"[krylov-chip] compile+run {t1:.1f}s nconverged={hist.nconverged} "
      f"nprods={hist.nprods} ritz-vs-construction err {err:.3e}",
      flush=True)
print(f"[krylov-chip] phase timings (s): {hist.timings}", flush=True)
# second run on the warm programs: steady-state wall + attribution
t0 = time.time()
ps2, hist2 = partial_pschur(sops, nev, "LM", seed=4321)
t2 = time.time() - t0
print(f"[krylov-chip] warm run {t2:.1f}s nconverged={hist2.nconverged} "
      f"timings {hist2.timings}", flush=True)
ok = hist.nconverged >= nev and err < 1e-6
print(f"[krylov-chip] {'OK' if ok else 'BAD'}", flush=True)
sys.exit(0 if ok else 1)
