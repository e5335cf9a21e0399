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
H0 = np.asarray(Hhi, np.float64)
print("reduced H: |H| max", np.abs(H0).max(),
      " diag prod magnitude ~", np.prod(np.abs(np.diagonal(H0[1], 0, 0))[:20]) if False else "")
# band magnitudes of the product
P1 = np.ones(n)
for l in range(1, p):
    P1 = P1 * np.diagonal(H0[l])
print("T-product diag |max|:", np.abs(P1).max(), " |min|:", np.abs(P1).min())

state = None
for chunk in range(3):
    cap = 256 * (chunk + 1)
    out = pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True, maxitfac=40,
                           it_cap=jnp.int32(cap), resume_state=state,
                           return_state=True)
    *outs, state, done = out
Hp = np.asarray(state[0].hi, np.float64)
print("after 768 sweeps: NaN in H:", np.isnan(Hp).any(),
      " inf:", np.isinf(Hp).any(), " i =", int(np.asarray(state[4])))
wr = np.asarray(state[2].hi)
print("wr NaN:", np.isnan(wr).any())
sub = np.abs(np.diagonal(Hp[0], -1))
print("H0 subdiag min/max:", sub[sub>0].min() if (sub>0).any() else 0, sub.max())
