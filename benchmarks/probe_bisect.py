"""Cross-commit full-pipeline accuracy probe (accuracy-regression bisect).

Round-2's post-snapshot measurements exposed a pipeline accuracy
regression vs the e285a96 record era (headline backerr 2.28e-13 then,
5.585e-12 now at aed=0; generation-kernel orthogonality defect measured
only ~3x worse on CPU, so the rest is elsewhere).  This probe runs the
ds real pipeline from AN ARBITRARY WORKTREE (old commits included) on a
FIXED draw and prints one comparable line.

Usage: python benchmarks/probe_bisect.py WORKTREE [p] [n] [seed]
  Works across historical signatures: cfg/aed kwargs are passed only when
  the function at that commit accepts them; AED is forced OFF wherever it
  exists so every point measures the bare sweep+deflation path.
"""
import inspect
import sys
import time

import numpy as np

wt = sys.argv[1]
p = int(sys.argv[2]) if len(sys.argv) > 2 else 8
n = int(sys.argv[3]) if len(sys.argv) > 3 else 128
seed = int(sys.argv[4]) if len(sys.argv) > 4 else 777

sys.path.insert(0, wt)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import \
    phessenberg_core_ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import \
    pqr_real_core_ff_chunked  # noqa: E402

kw = {}
sig = inspect.signature(pqr_real_core_ff_chunked)
if "cfg" in sig.parameters:
    import dataclasses

    from periodicschurdecompositions_jl_tpu.config import default_config
    cfg = default_config
    if hasattr(cfg, "aed"):
        cfg = dataclasses.replace(cfg, aed=False)
    kw["cfg"] = cfg
if "with_info" in sig.parameters:
    kw["with_info"] = True

tpu = jax.devices()[0]
rng = np.random.default_rng(seed)
A = rng.standard_normal((p, n, n))


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


def run(A_np):
    hi, lo = split(A_np)
    Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
    out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True,
                                   maxitfac=40, **kw)
    info = out[-1] if "with_info" in kw else {"niter": -1}
    T = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
    ZT = np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64)
    ok = bool(out[8])
    return T, ZT, ok, info


t0 = time.time()
run(A * 0.5)
tc = time.time() - t0
t0 = time.time()
T, ZT, ok, info = run(A)
dt = time.time() - t0
scale = np.abs(A).max()
be = max(np.abs(ZT[l].T @ T[l] @ ZT[(l + 1) % p] - A[l]).max() / scale
         for l in range(p))
orth = max(np.abs(ZT[l] @ ZT[l].T - np.eye(n)).max() for l in range(p))
print(f"[bisect] wt={wt} p={p} n={n} seed={seed}: {dt:.2f}s "
      f"(compile+warm {tc:.1f}s) ok={ok} niter={info.get('niter', -1)} "
      f"backerr={be:.3e} orth={orth:.3e}", flush=True)
