import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
import time
import numpy as np
import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

p, n = 16, 512
tpu = jax.devices()[0]
rng = np.random.default_rng(0)
A0 = rng.standard_normal((p, n, n))
A1 = rng.standard_normal((p, n, n))

f = ff.from_f64(jnp.asarray(A1))
hi = jax.device_put(f.hi, tpu); lo = jax.device_put(f.lo, tpu)
Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(hi, lo, want_q=True)
_ = np.asarray(Hhi)
print("reduction done", flush=True)

state = None
cap = 0
maxit = 40 * n
t00 = time.time()
while True:
    cap = min(cap + 256, maxit)
    t0 = time.time()
    out = pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True, maxitfac=40,
                           it_cap=jnp.int32(cap), resume_state=state,
                           return_state=True)
    *outs, state, done = out
    ii = int(np.asarray(state[4]))
    print(f"cap={cap}: {time.time()-t0:.1f}s window bottom i={ii} "
          f"done={bool(done)}", flush=True)
    if bool(done) or cap >= maxit:
        break
print(f"total {time.time()-t00:.1f}s ok={bool(outs[8])}", flush=True)
