import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
import time
import numpy as np
import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

import sys
p, n = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8, 128)
tpu = jax.devices()[0]
print("device:", tpu)
rng = np.random.default_rng(0)
A = rng.standard_normal((p, n, n))
Aff = ff.from_f64(jnp.asarray(A))
Ahi = jax.device_put(Aff.hi, tpu)
Alo = jax.device_put(Aff.lo, tpu)

@jax.jit
def full(Ahi, Alo):
    Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(Ahi, Alo, want_q=True)
    return pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True)

print("compiling...", flush=True)
t0 = time.time()
out = full(Ahi, Alo)
jax.block_until_ready(out)
print(f"first call (compile+run): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = full(Ahi, Alo)
jax.block_until_ready(out)
dt = time.time() - t0
(Thi, Tlo, ZThi, ZTlo, wrh, wrl, wih, wil, ok) = out
# force transfers (block_until_ready unreliable on axon: force host copy)
T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
Z = np.swapaxes(np.asarray(ZThi, np.float64) + np.asarray(ZTlo, np.float64), 1, 2)
print(f"steady run: {dt:.3f}s ok={bool(ok)}")
resid = max(np.abs(Z[l] @ T[l] @ Z[(l+1)%p].T - A[l]).max() for l in range(p))
orth = max(np.abs(Z[l] @ Z[l].T - np.eye(n)).max() for l in range(p))
anorm = np.abs(A).max()
print(f"backward error: {resid/anorm:.3e}  orth: {orth:.3e}")
wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
prod = np.eye(n)
for l in range(p):
    prod = prod @ A[l]
w_ref = np.sort_complex(np.linalg.eigvals(prod))
w = np.sort_complex(wr + 1j * wi)
print(f"eig err: {np.abs(w - w_ref).max() / max(np.abs(w_ref).max(), 1):.3e}")
