"""Bisect which core iteration corrupts Z orthogonality (n=32 ds bug)."""
import sys
sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg import phessenberg_core
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

p, n = 4, 32
rng = np.random.default_rng(11 * p + n)
A = rng.standard_normal((p, n, n))
H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
H64 = np.asarray(H64)
Q64 = np.asarray(Q64)
Hff = ff.from_f64(jnp.asarray(H64))
QTff = ff.from_f64(jnp.asarray(np.swapaxes(Q64, 1, 2)))

def orth_at(K):
    out = pqr_real_core_ff(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                           want_z=True, interpret=True, maxiter=K)
    ZThi, ZTlo = out[2], out[3]
    Z = np.swapaxes(np.asarray(ZThi, np.float64) +
                    np.asarray(ZTlo, np.float64), 1, 2)
    return max(np.abs(Z[l] @ Z[l].T - np.eye(n)).max() for l in range(p))

for K in [int(x) for x in sys.argv[1:]]:
    print(f"K={K:4d}: orth {orth_at(K):.3e}", flush=True)
