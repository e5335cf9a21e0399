"""On-chip phase breakdown of the ds real headline pipeline.

Times, separately and with fresh inputs (content-addressed execute caching
defeats repeat-timing) at a given (p, n):
  1. ds periodic Hessenberg reduction (phessenberg_core_ff),
  2. the chunked ds periodic QR iteration (pqr_real_core_ff_chunked),
  3. one full-window chase sweep (kernel A+B0+B via chase_sweep_ff),
and prints the iteration count so per-iteration cost can be derived.

Usage: python benchmarks/probe_phases.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.ff import FF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (  # noqa
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (  # noqa
    pqr_real_core_ff_chunked)
from periodicschurdecompositions_jl_tpu.ops import pallas_sweep as ps  # noqa

tpu = jax.devices()[0]
rng = np.random.default_rng(12345)


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


print(f"[phases] p={p} n={n}", flush=True)

# ---- phase 1: reduction --------------------------------------------------
A = rng.standard_normal((p, n, n))
hi, lo = split(A * 0.5)
t0 = time.time()
out = phessenberg_core_ff(hi, lo, want_q=True)
_ = np.asarray(out[0])
print(f"[phases] reduction compile+first: {time.time()-t0:.1f}s", flush=True)
hi, lo = split(A)
t0 = time.time()
Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
_ = np.asarray(Hh)
t_red = time.time() - t0
print(f"[phases] reduction: {t_red:.2f}s", flush=True)

# ---- phase 3: one full-window sweep (fresh Hessenberg input) -------------
N = n + 1 if n + 1 <= 128 else ((n + 16 + 7) // 8) * 8
Hs = np.zeros((p, N, N), np.float32)
Hw = rng.standard_normal((p, n, n))
Hw[0] = np.triu(Hw[0], -1)
Hw[1:] = np.triu(Hw[1:])
Hs[:, :n, :n] = Hw.astype(np.float32)
Zs = np.zeros((p, N, N), np.float32)
Zs[:, :n, :n] = np.eye(n, dtype=np.float32)
zl = np.zeros((p, N, N), np.float32)
v0 = ff.from_f64(jnp.asarray(np.array([0.6, 0.5, 0.3])))
Hf = FF(jax.device_put(jnp.asarray(Hs), tpu), jax.device_put(jnp.asarray(zl), tpu))
Zf = FF(jax.device_put(jnp.asarray(Zs), tpu), jax.device_put(jnp.asarray(zl), tpu))
t0 = time.time()
Hn, Zn = ps.chase_sweep_ff(Hf, Zf, jnp.int32(0), jnp.int32(n - 1), v0,
                           want_z=True)
_ = np.asarray(Hn.hi)
print(f"[phases] sweep compile+first: {time.time()-t0:.1f}s", flush=True)
ts = []
for r in range(3):
    Hw2 = rng.standard_normal((p, n, n))
    Hw2[0] = np.triu(Hw2[0], -1)
    Hw2[1:] = np.triu(Hw2[1:])
    Hs[:, :n, :n] = Hw2.astype(np.float32)
    Hf = FF(jax.device_put(jnp.asarray(Hs), tpu),
            jax.device_put(jnp.asarray(zl), tpu))
    t0 = time.time()
    Hn, Zn = ps.chase_sweep_ff(Hf, Zf, jnp.int32(0), jnp.int32(n - 1), v0,
                               want_z=True)
    _ = np.asarray(Hn.hi)
    ts.append(time.time() - t0)
print(f"[phases] full-window sweep: {min(ts)*1000:.0f} ms "
      f"(all {[f'{t*1000:.0f}' for t in ts]})", flush=True)

# ---- phase 2: chunked iteration (fresh reduction output) -----------------
t0 = time.time()
out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True, maxitfac=40,
                               with_info=True)
*outs, info = out
_ = np.asarray(outs[0])
t_it = time.time() - t0
print(f"[phases] iteration (compile+run): {t_it:.2f}s niter={info['niter']} "
      f"aed={info['aed_deflated']}", flush=True)

# second run on fresh data reuses the compile: the honest iteration time
A2 = rng.standard_normal((p, n, n))
hi, lo = split(A2)
t0 = time.time()
Hh2, Hl2, Qh2, Ql2 = phessenberg_core_ff(hi, lo, want_q=True)
_ = np.asarray(Hh2)
t_red2 = time.time() - t0
t0 = time.time()
out = pqr_real_core_ff_chunked(Hh2, Hl2, Qh2, Ql2, want_z=True, maxitfac=40,
                               with_info=True)
*outs, info = out
Thi = np.asarray(outs[0], np.float64) + np.asarray(outs[1], np.float64)
t_it2 = time.time() - t0
print(f"[phases] RUN2 reduction {t_red2:.2f}s iteration {t_it2:.2f}s "
      f"niter={info['niter']} aed={info['aed_deflated']} "
      f"per-iter {1000*t_it2/max(info['niter'],1):.2f} ms", flush=True)
