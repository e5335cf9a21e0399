"""Pre-compile the headline chunked program into the persistent cache.

Run after any sweep-kernel change so bench.py (and the driver's
round-end bench) hit the compilation cache instead of paying the remote
Mosaic compile inside the bench watchdog.  Runs the full pipeline at the
headline shape with a 17-iteration cap (one chunk: same trace as the
resumable chunk bench uses) plus the no-cap warmup trace bench's first
call compiles.

Usage: python benchmarks/precompile_headline.py [p] [n]
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
from periodicschurdecompositions_jl_tpu.config import (  # noqa: E402
    setverbosity)
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (  # noqa
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (  # noqa
    pqr_real_core_ff_chunked)

setverbosity(1, "main")
tpu = jax.devices()[0]
rng = np.random.default_rng(12345)
A = rng.standard_normal((p, n, n)) * 0.5
f = ff.from_f64(jnp.asarray(A))
hi = jax.device_put(f.hi, tpu)
lo = jax.device_put(f.lo, tpu)
print(f"[precompile] p={p} n={n}: reduction ...", flush=True)
t0 = time.time()
Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
_ = np.asarray(Hh[0, :2, :2])
print(f"[precompile] reduction done {time.time()-t0:.1f}s; "
      f"chunked core (full run) ...", flush=True)
t0 = time.time()
out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True, maxitfac=40,
                               with_info=True)
*outs, info = out
_ = np.asarray(outs[0][0, :2, :2])
print(f"[precompile] chunked core done {time.time()-t0:.1f}s "
      f"niter={info['niter']} aed={info['aed_deflated']}", flush=True)
