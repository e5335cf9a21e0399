import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
import time
import numpy as np
import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff_chunked

p, n = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8, 128)
tpu = jax.devices()[0]
rng = np.random.default_rng(0)

def full(Ahi, Alo):
    Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(Ahi, Alo, want_q=True)
    return pqr_real_core_ff_chunked(Hhi, Hlo, QThi, QTlo, want_z=True,
                                    maxitfac=40)

def run(A):
    f = ff.from_f64(jnp.asarray(A))
    hi = jax.device_put(f.hi, tpu); lo = jax.device_put(f.lo, tpu)
    t0 = time.time()
    out = full(hi, lo)
    T = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
    Z = np.swapaxes(np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64), 1, 2)
    dt = time.time() - t0
    return dt, T, Z, bool(out[8])

A0 = rng.standard_normal((p, n, n))
t_compile, _, _, _ = run(A0 * 0.5)
print(f"compile+run: {t_compile:.1f}s", flush=True)
# fresh data each timed run (defeats content caching)
for trial in range(2):
    A = rng.standard_normal((p, n, n))
    dt, T, Z, ok = run(A)
    res = max(np.abs(Z[l] @ T[l] @ Z[(l+1)%p].T - A[l]).max() for l in range(p))
    print(f"run {trial}: {dt:.3f}s ok={ok} backerr {res/np.abs(A).max():.2e}", flush=True)
