import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
import time
import numpy as np
import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

p, n = 16, 512
tpu = jax.devices()[0]
rng = np.random.default_rng(0)

@jax.jit
def full(Ahi, Alo):
    Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(Ahi, Alo, want_q=True)
    return pqr_real_core_ff(Hhi, Hlo, QThi, QTlo, want_z=True, maxitfac=40)

def run(tag, A):
    f = ff.from_f64(jnp.asarray(A))
    hi = jax.device_put(f.hi, tpu); lo = jax.device_put(f.lo, tpu)
    t0 = time.time()
    try:
        out = full(hi, lo)
        T = np.asarray(out[0], np.float64)
        print(f"{tag}: {time.time()-t0:.1f}s ok={bool(out[8])}", flush=True)
    except Exception as e:
        print(f"{tag}: CRASHED after {time.time()-t0:.1f}s: {type(e).__name__}",
              flush=True)
        raise SystemExit(1)

A0 = rng.standard_normal((p, n, n))
A1 = rng.standard_normal((p, n, n))   # the draw that crashed before
run("warmup A0*0.5", A0 * 0.5)
run("fresh draw A1", A1)
