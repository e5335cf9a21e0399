import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
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
Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(
    jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu), want_q=True)
_ = np.asarray(Hhi)
print("reduction done", flush=True)

state = None
for chunk in range(6):
    cap = 128 * (chunk + 1)
    out = pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True, maxitfac=40,
                           it_cap=jnp.int32(cap), resume_state=state,
                           return_state=True)
    *outs, state, done = out
    Hp = np.asarray(state[0].hi, np.float64)
    ii = int(np.asarray(state[4]))
    nn = np.isnan(Hp).any()
    print(f"cap={cap}: i={ii} NaN={nn} done={bool(done)}", flush=True)
    if nn:
        idx = np.argwhere(np.isnan(Hp))
        print("  first NaN entries:", idx[:5].tolist())
        wr = np.asarray(state[2]); wi = np.asarray(state[3])
        print("  wr nan:", np.isnan(wr).any(), " wi nan:", np.isnan(wi).any())
        break
    if bool(done):
        break
