"""Mosaic smoke test for the fused split-complex QZ sweep kernels.

Two fast on-chip checks before the BASELINE config-3 record attempt:
1. full ds pipeline at p=2, n=8 mixed S (small-N kernel path, both
   signature branch families) — prints the on-chip backward error;
2. ONE direct qz_sweep_cxff call at p=2, n=140 (the rolled 16-row slab
   path the n=128 record uses) checked against the complex128 interleaved
   reference.

Usage: python benchmarks/probe_cx_smoke.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.models.drivers import \
    _pschur_complex_ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.diagnostics import \
    check_psd  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.cxff import CXF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep_cx import \
    qz_sweep_cxff  # noqa: E402

rng = np.random.default_rng(321)

# ---- 1. one rolled-path sweep (kernel-only Mosaic check) at n=140 --------------------------------
sys.path.insert(0, "/root/repo/tests")
from test_pallas_cx import (_enforce, _mk_problem, _to_cxf, _to_np,  # noqa
                            ref_qz_sweep_np)

p2, n2, S2, m, i = 2, 140, (True, False), 3, 123
Hc, Zc, c0, s0 = _mk_problem(p2, n2, S2, rng)
Hc[0][m, m - 1] = 0.0
Hc[0][i + 1, i] = 0.0
Href, Zref = ref_qz_sweep_np(Hc, Zc, S2, m, i, c0, s0)
Href = _enforce(Href)
Hx = _to_cxf(Hc)
Zx = _to_cxf(Zc)
c0ff = ff.from_f64(jnp.asarray(c0))
s0x = CXF(ff.from_f64(jnp.asarray(s0.real)),
          ff.from_f64(jnp.asarray(s0.imag)))
t0 = time.time()
Hout, Zout = qz_sweep_cxff(Hx, Zx, jnp.int32(m), jnp.int32(i), c0ff, s0x,
                           S=S2, want_z=True, interpret=False)
Hds = _to_np(Hout)
t1 = time.time() - t0
Zds = _to_np(Zout)
he = np.abs(Hds - Href).max() / np.abs(Hc).max()
ze = np.abs(Zds - Zref).max()
print(f"[smoke] rolled-path sweep p={p2} n={n2}: {t1:.1f}s "
      f"(compile incl.)  Herr {he:.3e} Zerr {ze:.3e}", flush=True)
assert he < 1e-11 and ze < 1e-11, "rolled-path mismatch"
# ---- 2. small full pipeline -------------------------------------------
p, n = 2, 8
S = (True, False)
A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
# A stays NUMPY: a jnp.asarray would device_put complex128 onto the axon
# chip, which has no complex dtype (the runtime stalls ~25 min and dies
# UNAVAILABLE — the cause of smoke attempts 1-3 failing); the driver
# splits (re, im) on the host.
t0 = time.time()
P = _pschur_complex_ff(A, S, "R", True, True, 30, pallas=True)
ok, rep = check_psd(P, A, qtol=1e6, tol=1e9)
print(f"[smoke] p={p} n={n} mixed-S pipeline: {time.time()-t0:.1f}s "
      f"backerr {rep['residual_rel']:.3e}", flush=True)

print("[smoke] PASS", flush=True)
