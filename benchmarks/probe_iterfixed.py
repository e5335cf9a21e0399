"""Decompose the ~12 ms/iteration FIXED cost of the ds real core.

Round-4 finding: per-iteration cost is ~constant in the active-window
size (12.1 ms at p=16 n=512; kernel-G showed it is NOT the band/scan/
shift XLA glue).  Remaining suspects: the three sweep pallas launches
with full-state copies, the two H transposes, and the chase/deflate
cond boundary shuffling the 70 MB (H, ZT) state.

Method: in-program marginal — run the UNCHUNKED core on the same draw
with maxiter=K1 vs K2 (fresh inputs each, host-synced on an output
scalar); (t2 - t1) / (K2 - K1) = true per-iteration cost with no
readback or chunk overhead.  Variants isolate components:

  base      : defaults (want_z=True)
  noz       : want_z=False  (kernel B loses its Z^T targets)
  glue      : cfg.glue_kernel=True (fused band/scan/shift)

Usage: python benchmarks/probe_iterfixed.py [p] [n]
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512

from periodicschurdecompositions_jl_tpu.config import default_config  # noqa
from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (  # noqa
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (  # noqa
    pqr_real_core_ff)

dev = jax.devices()[0]
print(f"[iterfixed] device {dev}, p={p} n={n}", flush=True)
rng = np.random.default_rng(4242)
A = rng.standard_normal((p, n, n))
Af = ff.from_f64(jnp.asarray(A))
Hh, Hl, Qh, Ql = phessenberg_core_ff(
    jax.device_put(Af.hi, dev), jax.device_put(Af.lo, dev), want_q=True)
Hh = np.asarray(Hh)
Hl = np.asarray(Hl)
Qh = np.asarray(Qh)
Ql = np.asarray(Ql)

K1, K2 = 40, 80


def run(tag, want_z, cfg, K):
    hh = jax.device_put(jnp.asarray(Hh), dev)
    hl = jax.device_put(jnp.asarray(Hl), dev)
    qh = jax.device_put(jnp.asarray(Qh), dev)
    ql = jax.device_put(jnp.asarray(Ql), dev)
    t0 = time.time()
    out = pqr_real_core_ff(hh, hl, qh, ql, want_z=want_z, cfg=cfg,
                           maxiter=K)
    ok = bool(np.asarray(out[-1]))  # sync on the tiny ok scalar
    return time.time() - t0, ok


for tag, want_z, cfg in (
        ("base", True, default_config),
        ("noz", False, default_config),
        ("glue", True, dataclasses.replace(default_config,
                                           glue_kernel=True))):
    try:
        t0 = time.time()
        run(tag, want_z, cfg, K1)  # compile + warm K1
        warm1 = time.time() - t0
        t0 = time.time()
        run(tag, want_z, cfg, K2)  # compile + warm K2
        warm2 = time.time() - t0
        t1, _ = run(tag, want_z, cfg, K1)
        t2, _ = run(tag, want_z, cfg, K2)
        t1b, _ = run(tag, want_z, cfg, K1)
        t2b, _ = run(tag, want_z, cfg, K2)
        t1 = min(t1, t1b)
        t2 = min(t2, t2b)
        per = (t2 - t1) / (K2 - K1) * 1e3
        print(f"[iterfixed] {tag}: K{K1} {t1:.2f}s K{K2} {t2:.2f}s "
              f"-> {per:.2f} ms/iter (compiles {warm1:.0f}s/{warm2:.0f}s)",
              flush=True)
    except Exception as e:
        print(f"[iterfixed] {tag}: FAIL {type(e).__name__}: {e}",
              flush=True)
print("[iterfixed] done", flush=True)
