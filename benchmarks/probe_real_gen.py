"""On-chip probe: real generalized (mixed-signature) core, chunked.

The real GPSD core runs in the chip's emulated f64 (no ds variant yet);
this records its ACTUAL on-chip accuracy + wall-clock for the record.

Usage: python benchmarks/probe_real_gen.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops.hessenberg import \
    phessenberg_signed_core  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pqz_real import \
    pqz_real_gen_core_chunked  # noqa: E402

rng = np.random.default_rng(4242)
A = rng.standard_normal((p, n, n))
S = tuple(l % 2 == 0 for l in range(p))
print(f"[probe] real GPSD (emulated f64, chunked) p={p} n={n} S={S}",
      flush=True)

# the reduction also runs on-chip (emulated f64 QR)
t0 = time.time()
H, Q = phessenberg_signed_core(jnp.asarray(A * 0.5), S, want_q=True)
out = pqz_real_gen_core_chunked(H, S, Z=Q)
_ = np.asarray(out[0])
print(f"[probe] compile+first: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
H, Q = phessenberg_signed_core(jnp.asarray(A), S, want_q=True)
T, Z, alr, ali, be, sc, ok = pqz_real_gen_core_chunked(H, S, Z=Q)
T = np.asarray(T)
Z = np.asarray(Z)
t1 = time.time() - t0
worst = 0.0
scale = np.abs(A).max()
for l in range(p):
    ln = (l + 1) % p
    Ax = (Z[l] @ T[l] @ Z[ln].T) if S[l] else (Z[ln] @ T[l] @ Z[l].T)
    worst = max(worst, np.abs(Ax - A[l]).max() / scale)
orth = max(np.abs(Z[l] @ Z[l].T - np.eye(n)).max() for l in range(p))
print(f"[probe] run {t1:.2f}s ok={bool(ok)} backerr {worst:.3e} "
      f"orth {orth:.3e}", flush=True)
