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
prev = None
cap = 0
while cap < 160:
    cap += 8
    out = pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True, maxitfac=40,
                           it_cap=jnp.int32(cap), resume_state=state,
                           return_state=True)
    *outs, state, done = out
    Hp = np.asarray(state[0].hi, np.float64)
    nn = bool(np.isnan(Hp).any())
    ii = int(np.asarray(state[4])); ll = int(np.asarray(state[5]))
    its = int(np.asarray(state[6]))
    print(f"cap={cap}: i={ii} l={ll} its={its} NaN={nn}", flush=True)
    if nn:
        np.save("/tmp/claude-0/preNaN_hi.npy", np.asarray(prev[0].hi))
        np.save("/tmp/claude-0/preNaN_lo.npy", np.asarray(prev[0].lo))
        np.save("/tmp/claude-0/preNaN_scal.npy",
                np.array([int(np.asarray(prev[4])), int(np.asarray(prev[5])),
                          int(np.asarray(prev[6])), int(np.asarray(prev[8]))]))
        # locate NaN
        idx = np.argwhere(np.isnan(Hp))
        print("NaN first at:", idx[:6].tolist())
        break
    prev = state
