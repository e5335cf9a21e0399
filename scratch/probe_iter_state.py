"""Dump loop state around the corrupting iteration (55/56)."""
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

prev_Z = None
for K in [int(x) for x in sys.argv[1:]]:
    out = pqr_real_core_ff(Hff.hi, Hff.lo, QTff.hi, QTff.lo,
                           want_z=True, interpret=True, maxiter=K,
                           debug_state=True)
    (Thi, Tlo, ZThi, ZTlo, wrh, wrl, wih, wil, ok,
     (i, l, its, jiter), (Hph, Hpl)) = out
    Z = np.swapaxes(np.asarray(ZThi, np.float64) +
                    np.asarray(ZTlo, np.float64), 1, 2)
    orths = [np.abs(Z[f] @ Z[f].T - np.eye(n)).max() for f in range(p)]
    print(f"K={K}: i={int(i)} l={int(l)} its={int(its)} jiter={int(jiter)} "
          f"orth_per_factor={['%.1e' % o for o in orths]}", flush=True)
    if prev_Z is not None:
        for f in range(p):
            D = np.abs(Z[f] - prev_Z[f])
            cols = np.where(D.max(axis=0) > 0)[0]
            print(f"   factor {f}: changed cols {cols[:12]} "
                  f"max diff {D.max():.2e}")
    prev_Z = Z
    Hp = np.asarray(Hph, np.float64) + np.asarray(Hpl, np.float64)
    np.save(f"/tmp/claude-0/Hp_K{K}.npy", Hp)
