"""Time the three sweep pallas_calls SEPARATELY on the chip.

Decomposes chase_sweep_ff's cost: kernel A (generation chain + working
copy), kernel B0 (batched left application), kernel B (batched right
application to H^T and Z^T), each timed eagerly at a full window and an
11-step window (the intercept/slope split isolates per-step cost from
launch+copy overhead).

Usage: python benchmarks/probe_kernels.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 256

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.ff import FF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import pallas_sweep as ps  # noqa

tpu = jax.devices()[0]
N = n + 1 if n + 1 <= 128 else ((n + 16 + 7) // 8) * 8
rng = np.random.default_rng(0)
print(f"[kernels] p={p} n={n} N={N}", flush=True)


def fresh_H():
    A = rng.standard_normal((p, n, n))
    A[0] = np.triu(A[0], -1)
    A[1:] = np.triu(A[1:])
    H = np.zeros((p, N, N), np.float32)
    H[:, :n, :n] = A.astype(np.float32)
    zl = np.zeros((p, N, N), np.float32)
    return (jax.device_put(jnp.asarray(H), tpu),
            jax.device_put(jnp.asarray(zl), tpu))


v0 = ff.from_f64(jnp.asarray(np.array([0.6, 0.5, 0.3])))
v0f = jnp.concatenate([v0.hi, v0.lo]).astype(jnp.float32)


def scal_for(m, i):
    return jnp.stack([jnp.int32(m), jnp.int32(i), jnp.int32(1)])


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        args = fn()          # fresh inputs (content-addressed caching)
        t0 = time.time()
        with ff.no_barriers():   # kernels trace at call time
            out = args()
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        ts.append(time.time() - t0)
    return min(ts), ts


with ff.no_barriers():
    callA = ps._sweep_call(p, N, False)
    callB0 = ps._left_call(p, N, False)
    callB = ps._apply_call(p, N, True, False)

for (m, i, tag) in [(0, n - 1, "full"), (0, 11, "11step")]:
    scal = scal_for(m, i)

    def mkA():
        Hhi, Hlo = fresh_H()
        return lambda: callA(scal, v0f, Hhi, Hlo)
    tA, allA = timeit(mkA)
    # reuse one R0 for B0/B timing
    Hhi, Hlo = fresh_H()
    with ff.no_barriers():
        (R0,) = callA(scal, v0f, Hhi, Hlo)
    R0 = jax.device_put(np.asarray(R0), tpu)

    def mkB0():
        Hhi, Hlo = fresh_H()
        return lambda: callB0(scal, Hhi, Hlo, R0)
    tB0, allB0 = timeit(mkB0)

    def mkB():
        Hhi, Hlo = fresh_H()
        ZThi, ZTlo = fresh_H()
        return lambda: callB(scal, Hhi, Hlo, ZThi, ZTlo, R0)
    tB, allB = timeit(mkB)
    print(f"[kernels] {tag}: A {tA*1000:.1f} ms {[f'{t*1000:.0f}' for t in allA]} | "
          f"B0 {tB0*1000:.1f} ms {[f'{t*1000:.0f}' for t in allB0]} | "
          f"B {tB*1000:.1f} ms {[f'{t*1000:.0f}' for t in allB]}", flush=True)
