"""Time ONE full-window chase sweep on the chip (fresh inputs per call).

Usage: python benchmarks/probe_sweeptime.py [p] [n] [reps]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.ff import FF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import pallas_sweep as ps  # noqa

tpu = jax.devices()[0]
N = n + 1 if n + 1 <= 128 else ((n + 16 + 7) // 8) * 8
rng = np.random.default_rng(0)


def fresh():
    A = rng.standard_normal((p, n, n))
    A[0] = np.triu(A[0], -1)
    A[1:] = np.triu(A[1:])
    H = np.zeros((p, N, N), np.float32)
    H[:, :n, :n] = A.astype(np.float32)
    Z = np.zeros((p, N, N), np.float32)
    Z[:, :n, :n] = np.eye(n, dtype=np.float32)
    zl = np.zeros((p, N, N), np.float32)
    return (FF(jax.device_put(jnp.asarray(H), tpu),
               jax.device_put(jnp.asarray(zl), tpu)),
            FF(jax.device_put(jnp.asarray(Z), tpu),
               jax.device_put(jnp.asarray(zl), tpu)))


v0 = ff.from_f64(jnp.asarray(np.array([0.6, 0.5, 0.3])))

H, ZT = fresh()
t0 = time.time()
Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(0), jnp.int32(n - 1), v0,
                            want_z=True)
_ = np.asarray(Hn.hi)
print(f"[sweeptime] compile+first: {time.time()-t0:.1f}s", flush=True)

ts = []
for r in range(reps):
    H, ZT = fresh()
    t0 = time.time()
    Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(0), jnp.int32(n - 1), v0,
                                want_z=True)
    _ = np.asarray(Hn.hi)
    ts.append(time.time() - t0)
print(f"[sweeptime] p={p} n={n} N={N}: per-sweep "
      f"{min(ts)*1000:.1f} ms (all: {[f'{t*1000:.0f}' for t in ts]})",
      flush=True)

# fixed-overhead probe: tiny window at the bottom of the same matrix
ts2 = []
for r in range(reps):
    H, ZT = fresh()
    t0 = time.time()
    Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(n - 12), jnp.int32(n - 1),
                                v0, want_z=True)
    _ = np.asarray(Hn.hi)
    ts2.append(time.time() - t0)
print(f"[sweeptime] small-window (11 steps): {min(ts2)*1000:.1f} ms",
      flush=True)
