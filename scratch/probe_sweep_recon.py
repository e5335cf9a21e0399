"""One chase sweep on identity Z: reconstruction residual localizes the bug.

Z_new[l] H_new[l] Z_new[l+1]^T must equal H_old[l] to ds accuracy for ANY
window [m, i] and any (valid) v0, independent of reflector sign conventions.
"""
import sys
sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.hessenberg import phessenberg_core
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep import chase_sweep_ff

p, n = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4, 32)
rng = np.random.default_rng(7)
A = rng.standard_normal((p, n, n))
H64, _ = phessenberg_core(jnp.asarray(A), want_q=False)
H64 = np.asarray(H64)

N = n + 1
def pad(x):
    out = np.zeros((p, N, N), x.dtype)
    out[:, :n, :n] = x
    return out

Hff = ff.from_f64(jnp.asarray(pad(H64)))
eye = pad(np.broadcast_to(np.eye(n), (p, n, n)).copy())
ZT = FF(jnp.asarray(eye, jnp.float32), jnp.zeros((p, N, N), jnp.float32))

v0 = np.array([0.6, -0.64, 0.48])
v0 = v0 / np.abs(v0).sum()
v0f = ff.from_f64(jnp.asarray(v0))

for (m, i) in [(0, 5), (0, 10), (0, 15), (0, 20), (0, 25), (0, n - 1),
               (5, 12), (10, 20), (20, n - 1), (12, 18)]:
    # pipeline invariants: the window boundary subdiagonals of H[0] are
    # force-zeroed before any sweep (pqr_ff.py:268-269 and the deflation
    # shrink path)
    Hb64 = H64.copy()
    if m > 0:
        Hb64[0, m, m - 1] = 0.0
    if i < n - 1:
        Hb64[0, i + 1, i] = 0.0
    Hff = ff.from_f64(jnp.asarray(pad(Hb64)))
    Hn, ZTn = chase_sweep_ff(Hff, ZT, jnp.int32(m), jnp.int32(i), v0f,
                             want_z=True, interpret=True)
    Hv = (np.asarray(Hn.hi, np.float64) + np.asarray(Hn.lo, np.float64))[:, :n, :n]
    Zv = np.swapaxes(
        np.asarray(ZTn.hi, np.float64) + np.asarray(ZTn.lo, np.float64),
        1, 2)[:, :n, :n]
    worst = 0.0
    worst_l = -1
    for l in range(p):
        R = np.abs(Zv[l] @ Hv[l] @ Zv[(l + 1) % p].T - Hb64[l])
        if R.max() > worst:
            worst = R.max()
            worst_l = l
            rr, cc = np.unravel_index(R.argmax(), R.shape)
    orth = max(np.abs(Zv[l] @ Zv[l].T - np.eye(n)).max() for l in range(p))
    print(f"m={m:3d} i={i:3d}: resid {worst:.3e} (factor {worst_l} at "
          f"({rr},{cc}))  orth {orth:.3e}")
