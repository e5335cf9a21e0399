"""On-chip validation of the host-chunked ds signed reduction.

The chunked driver (phessenberg_signed_core_cxff_chunked) keeps every
device execute under the axon ~60 s kill; CPU tests prove it bitwise
vs the single-shot core.  This probe validates the 3-trace protocol on
the REMOTE compiler and records per-execute wall-clock at the complex
record config (p=6, n=128 mixed S), plus reconstruction accuracy.

Usage: python benchmarks/probe_cxred_chunked.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops import cxff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import \
    phessenberg_signed_core_cxff_chunked  # noqa: E402

rng = np.random.default_rng(4242)
A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
S = tuple(l % 2 == 0 for l in range(p))
print(f"[cxred-chunked] p={p} n={n} S={S}", flush=True)

X = cxff.from_f64_split(A.real, A.imag)
t0 = time.time()
out = phessenberg_signed_core_cxff_chunked(X.re.hi, X.re.lo, X.im.hi,
                                           X.im.lo, S, want_q=True)
np.asarray(out[0])
print(f"[cxred-chunked] compile+first: {time.time()-t0:.1f}s", flush=True)

A2 = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
X2 = cxff.from_f64_split(A2.real, A2.imag)
t0 = time.time()
out = phessenberg_signed_core_cxff_chunked(X2.re.hi, X2.re.lo, X2.im.hi,
                                           X2.im.lo, S, want_q=True)
H = (np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
     + 1j * (np.asarray(out[2], np.float64) +
             np.asarray(out[3], np.float64)))
Q = (np.asarray(out[4], np.float64) + np.asarray(out[5], np.float64)
     + 1j * (np.asarray(out[6], np.float64) +
             np.asarray(out[7], np.float64)))
dt = time.time() - t0
# reconstruction: S[l] ? A[l] = Q[l] H[l] Q[l+1]^H : A[l] = Q[l+1] H[l] Q[l]^H
scale = np.abs(A2).max()
worst = 0.0
for l in range(p):
    Qn = Q[(l + 1) % p]
    Ax = (Q[l] @ H[l] @ Qn.conj().T) if S[l] else (Qn @ H[l] @ Q[l].conj().T)
    worst = max(worst, np.abs(Ax - A2[l]).max() / scale)
orth = max(np.abs(Q[l].conj().T @ Q[l] - np.eye(n)).max() for l in range(p))
print(f"[cxred-chunked] steady {dt:.2f}s backerr {worst:.3e} "
      f"orth {orth:.3e}", flush=True)
