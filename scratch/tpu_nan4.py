import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

p, n = 16, 512
N = ((n + 16 + 7) // 8) * 8
tpu = jax.devices()[0]
rng = np.random.default_rng(0)
A0 = rng.standard_normal((p, n, n))
A1 = rng.standard_normal((p, n, n))
f = ff.from_f64(jnp.asarray(A1))
Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(
    jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu), want_q=True)
_ = np.asarray(Hhi)

Hp_hi = np.load("/tmp/claude-0/preNaN_hi.npy")
Hp_lo = np.load("/tmp/claude-0/preNaN_lo.npy")
i0, l0, its0, jiter0 = np.load("/tmp/claude-0/preNaN_scal.npy")
print("resume from jiter", jiter0, "its", its0, flush=True)

eyep = np.zeros((p, N, N), np.float32)
for ll in range(p):
    np.fill_diagonal(eyep[ll, :n, :n], 1.0)
state = (FF(jnp.asarray(Hp_hi), jnp.asarray(Hp_lo)),
         FF(jnp.asarray(eyep), jnp.zeros((p, N, N), jnp.float32)),
         jnp.zeros((n,), jnp.float64), jnp.zeros((n,), jnp.float64),
         jnp.int32(i0), jnp.int32(l0), jnp.int32(its0),
         jnp.int32(40 * n), jnp.int32(jiter0))
for step in range(10):
    cap = int(jiter0) + step + 1
    out = pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True, maxitfac=40,
                           it_cap=jnp.int32(cap), resume_state=state,
                           return_state=True)
    *outs, state, done = out
    Hc = np.asarray(state[0].hi, np.float64)
    nn = bool(np.isnan(Hc).any())
    its_c = int(np.asarray(state[6]))
    print(f"jiter={cap}: its={its_c} NaN={nn}", flush=True)
    if nn:
        break
    Hp_hi = np.asarray(state[0].hi)
    Hp_lo = np.asarray(state[0].lo)
np.save("/tmp/claude-0/preNaN2_hi.npy", Hp_hi)
np.save("/tmp/claude-0/preNaN2_lo.npy", Hp_lo)
print("pre-NaN its for host analysis:", its_c - 1 if nn else its_c)
