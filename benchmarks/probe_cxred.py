"""On-chip timing of the ds split-complex SIGNED reduction alone.

The complex-ff record probe hangs ~10 min in (twice); this isolates
whether the un-chunked `phessenberg_signed_core_cxff` execute is the
>60 s worker-kill victim.  Prints (flushed) before/after each device
call so a hang localizes the phase.

Usage: python benchmarks/probe_cxred.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (  # noqa
    phessenberg_signed_core_cxff)

tpu = jax.devices()[0]
rng = np.random.default_rng(7)
S = tuple(l % 2 == 0 for l in range(p))
print(f"[cxred] p={p} n={n} S={S}", flush=True)


def split4(Anp):
    fre = ff.from_f64(jnp.asarray(Anp.real))
    fim = ff.from_f64(jnp.asarray(Anp.imag))
    return (jax.device_put(fre.hi, tpu), jax.device_put(fre.lo, tpu),
            jax.device_put(fim.hi, tpu), jax.device_put(fim.lo, tpu))


A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
rh, rl, ih, il = split4(A * 0.5)
print("[cxred] launching compile+first reduction ...", flush=True)
t0 = time.time()
out = phessenberg_signed_core_cxff(rh, rl, ih, il, S, want_q=True)
print(f"[cxred] traced/dispatched at {time.time()-t0:.1f}s; fetching ...",
      flush=True)
_ = np.asarray(out[0])
print(f"[cxred] compile+first: {time.time()-t0:.1f}s", flush=True)

rh, rl, ih, il = split4(A)
t0 = time.time()
out = phessenberg_signed_core_cxff(rh, rl, ih, il, S, want_q=True)
_ = np.asarray(out[0])
print(f"[cxred] reduction run2: {time.time()-t0:.2f}s", flush=True)
