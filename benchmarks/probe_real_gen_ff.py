"""On-chip probe: ds real generalized (mixed-signature) pipeline.

Runs the float-float real GPSD pipeline (ds reduction via the
zero-imaginary split signed reduction + ds iteration with the fused
Pallas chase) on the default device and records wall-clock + backward
error — the contract-grade counterpart of probe_real_gen.py's
emulated-f64 record.

Usage: python benchmarks/probe_real_gen_ff.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

sys.path.insert(0, "/root/repo")
from periodicschurdecompositions_jl_tpu.config import \
    AlgoConfig, setverbosity  # noqa: E402
import periodicschurdecompositions_jl_tpu.config as _cfgmod  # noqa: E402

# AED off for the record run (see probe_complex_ff.py note)
_cfgmod.default_config = AlgoConfig(aed=False)
from periodicschurdecompositions_jl_tpu.diagnostics import \
    check_psd  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pqz_real_ff import \
    pschur_real_gen_pipeline_ff  # noqa: E402

setverbosity(1, "main")
rng = np.random.default_rng(4242)
A = rng.standard_normal((p, n, n))
S = tuple(l % 2 == 0 for l in range(p))
print(f"[probe] ds real GPSD (Pallas chase) p={p} n={n} S={S}", flush=True)

t0 = time.time()
# A stays numpy: the pipeline splits to ds on the host
P = pschur_real_gen_pipeline_ff(A * 0.5, S, "R", pallas=True)
print(f"[probe] compile+first: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
P = pschur_real_gen_pipeline_ff(A, S, "R", pallas=True)
ok, rep = check_psd(P, A, qtol=1e6, tol=1e9)
t1 = time.time() - t0
Z = np.asarray(P.Zs)
orth = max(np.abs(Z[l] @ Z[l].T - np.eye(n)).max() for l in range(p))
print(f"[probe] run {t1:.2f}s backerr {rep['residual_rel']:.3e} "
      f"orth {orth:.3e}", flush=True)
