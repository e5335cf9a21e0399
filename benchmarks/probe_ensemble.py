"""Ensemble throughput A/B: host-sequential vs pipelined double-buffering.

VERDICT round-3 item 6: the 127 problems/min number is a host-sequential
loop; the chunked pipeline's wall is device execute PLUS host work
(orchestration, tunnel transfers, host-tail), so two in-flight problems
overlap the host share.  Usage: python benchmarks/probe_ensemble.py [p] [n]
[count]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
count = int(sys.argv[3]) if len(sys.argv) > 3 else 8

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (  # noqa: E402
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (  # noqa: E402
    pqr_real_core_ff_chunked)
from periodicschurdecompositions_jl_tpu.parallel.mesh import (  # noqa: E402
    ensemble_pschur_real_pipelined)

dev = jax.devices()[0]
print(f"[ensemble] device {dev}, p={p} n={n} count={count}", flush=True)
rng = np.random.default_rng(99)


def one_seq(A_np):
    f = ff.from_f64(jnp.asarray(A_np))
    hi = jax.device_put(f.hi, dev)
    lo = jax.device_put(f.lo, dev)
    Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
    out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True, maxitfac=40)
    return np.asarray(out[0])


# compile
t0 = time.time()
one_seq(rng.standard_normal((p, n, n)) * 0.5)
print(f"[ensemble] compile+warm: {time.time()-t0:.1f}s", flush=True)

As = [rng.standard_normal((p, n, n)) for _ in range(count)]

t0 = time.time()
for A in As:
    one_seq(A)
dt_seq = time.time() - t0
seq_rate = count / (dt_seq / 60.0)
print(f"[ensemble] sequential: {count}x in {dt_seq:.1f}s = "
      f"{seq_rate:.1f} problems/min", flush=True)

As2 = [rng.standard_normal((p, n, n)) for _ in range(count)]
t0 = time.time()
outs = ensemble_pschur_real_pipelined(As2, maxitfac=40, workers=2)
dt_pipe = time.time() - t0
pipe_rate = count / (dt_pipe / 60.0)
print(f"[ensemble] pipelined(2): {count}x in {dt_pipe:.1f}s = "
      f"{pipe_rate:.1f} problems/min ({pipe_rate / seq_rate:.2f}x)",
      flush=True)

# spot-check accuracy of one pipelined result
T, Z, wr, wi, ok = outs[0]
A0 = As2[0]
worst = 0.0
for l in range(p):
    Ax = Z[l] @ T[l] @ Z[(l + 1) % p].T
    worst = max(worst, np.abs(Ax - A0[l]).max() / np.abs(A0[l]).max())
print(f"[ensemble] pipelined lane 0: ok={ok} backerr {worst:.2e}",
      flush=True)
assert ok and worst < 1e-11
print("[ensemble] OK", flush=True)
