"""Isolate which TPU stage loses the ds accuracy: reduction or QR core."""
import sys
sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg import phessenberg_core
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

import sys as _s
p, n = (int(_s.argv[1]), int(_s.argv[2])) if len(_s.argv) > 2 else (4, 12)
tpu = jax.devices()[0]
cpu = jax.devices("cpu")[0]
rng = np.random.default_rng(11 * p + n)
A = rng.standard_normal((p, n, n))

# ---- stage 1: ds reduction on TPU, reconstruction accuracy
Aff = ff.from_f64(jax.device_put(jnp.asarray(A), cpu))
Ahi_t = jax.device_put(Aff.hi, tpu)
Alo_t = jax.device_put(Aff.lo, tpu)
Hhi, Hlo, QThi, QTlo = jax.jit(phessenberg_core_ff, device=tpu)(Ahi_t, Alo_t)
H = np.asarray(Hhi, np.float64) + np.asarray(Hlo, np.float64)
Q = np.swapaxes(np.asarray(QThi, np.float64) + np.asarray(QTlo, np.float64), 1, 2)
res = max(np.abs(Q[l] @ H[l] @ Q[(l + 1) % p].T - A[l]).max() for l in range(p))
orth = max(np.abs(Q[l] @ Q[l].T - np.eye(n)).max() for l in range(p))
print(f"[reduction ds @tpu]  resid {res:.3e}  orth {orth:.3e}")

# ---- stage 2: exact f64 reduction on CPU, ds QR core on TPU
with jax.default_device(cpu):
    H64, Q64 = phessenberg_core(jnp.asarray(A), want_q=True)
    H64 = np.asarray(H64); Q64 = np.asarray(Q64)
    Hff = ff.from_f64(jnp.asarray(H64))
    QTff = ff.from_f64(jnp.asarray(np.swapaxes(Q64, 1, 2)))
out = jax.jit(
    lambda a, b, c, d: pqr_real_core_ff(a, b, c, d, want_z=True),
    device=tpu)(
    jax.device_put(Hff.hi, tpu), jax.device_put(Hff.lo, tpu),
    jax.device_put(QTff.hi, tpu), jax.device_put(QTff.lo, tpu))
(Thi, Tlo, ZThi, ZTlo, wrh, wrl, wih, wil, ok) = out
T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
Z = np.swapaxes(np.asarray(ZThi, np.float64) + np.asarray(ZTlo, np.float64), 1, 2)
res = max(np.abs(Z[l] @ T[l] @ Z[(l + 1) % p].T - A[l]).max() for l in range(p))
orth = max(np.abs(Z[l] @ Z[l].T - np.eye(n)).max() for l in range(p))
wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
prod = np.eye(n)
for l in range(p):
    prod = prod @ A[l]
w_ref = np.sort_complex(np.linalg.eigvals(prod))
w = np.sort_complex(wr + 1j * wi)
print(f"[qr-core ds @tpu]    resid {res:.3e}  orth {orth:.3e}  ok={bool(ok)}  "
      f"eigerr {np.abs(w - w_ref).max():.3e}")
