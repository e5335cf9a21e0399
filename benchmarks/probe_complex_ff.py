"""On-chip probe: ds split-complex QZ at BASELINE config 3 scale.

Runs the float-float complex pipeline (mixed signature) on the default
device and reports wall-clock + backward error + Z unitarity.

Usage: python benchmarks/probe_complex_ff.py [p] [n]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.models.drivers import \
    _pschur_complex_ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.config import \
    AlgoConfig, setverbosity  # noqa: E402
import periodicschurdecompositions_jl_tpu.config as _cfgmod  # noqa: E402

# AED off for the record: its host analysis shrinks chunks to 24
# iterations (attempt 2 timed out at jiter=192 with zero AED harvest on
# this draw); the AED on-chip A/B is the separate aed_timing queue item.
_cfgmod.default_config = AlgoConfig(aed=False)

setverbosity(1, "main")  # chunk-progress lines localize hangs
from periodicschurdecompositions_jl_tpu.diagnostics import \
    check_psd  # noqa: E402

rng = np.random.default_rng(777)
A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
S = tuple(l % 2 == 0 for l in range(p))  # mixed signature, S[0] True
print(f"[probe] ds complex QZ p={p} n={n} S={S}", flush=True)

# warm-up / compile on scaled data.  NOTE: the arrays stay numpy — the
# driver splits (re, im) on the host; a jnp.asarray here would device_put
# complex128 onto the axon chip, which has no complex dtype (the runtime
# stalls and dies with UNAVAILABLE).
t0 = time.time()
P = _pschur_complex_ff(A * 0.5, S, "R", True, True, 30)
print(f"[probe] compile+first run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
P = _pschur_complex_ff(A, S, "R", True, True, 30)
t1 = time.time() - t0
ok, rep = check_psd(P, A, qtol=1e6, tol=1e9)
Z = np.asarray(P.Zs)
orth = max(np.abs(Z[l] @ Z[l].conj().T - np.eye(n)).max() for l in range(p))
print(f"[probe] run {t1:.2f}s backerr {rep['residual_rel']:.3e} "
      f"orth {orth:.3e}", flush=True)
