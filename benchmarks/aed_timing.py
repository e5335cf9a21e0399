"""On-chip A/B: AED x multibulge on the ds real pipeline.

Times pqr_real_core_ff_chunked at (p, n) for each (aed, nbulges) combo,
fresh inputs per measured run, forced host transfers; prints wall-clock,
iterations, AED harvest, and backward error.

Usage: python benchmarks/aed_timing.py [p] [n] [combos]
  combos: comma-separated aed:nb[:interval[:window]] tuples, e.g.
  "0:1,1:1,1:4" or "1:1:40,1:1:24:32" (default "0:1,1:1,1:4");
  interval/window 0 = auto.  Interval and window are HOST-side knobs —
  every combo reuses the same compiled device programs.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

P = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 128
COMBOS = [tuple(int(x) for x in c.split(":")) + (0, 0)
          for c in (sys.argv[3].split(",") if len(sys.argv) > 3
                    else ["0:1", "1:1", "1:4"])]
MAXITFAC = 40

import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.config import default_config
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
    pqr_real_core_ff_chunked)

tpu = jax.devices()[0]
rng = np.random.default_rng(4242)


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


def run(A_np, cfg):
    hi, lo = split(A_np)
    Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
    out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True,
                                   maxitfac=MAXITFAC, cfg=cfg,
                                   with_info=True)
    info = out[-1]
    Thi, Tlo, ZThi, ZTlo = out[0], out[1], out[2], out[3]
    ok = bool(out[8])
    T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
    Z = np.swapaxes(np.asarray(ZThi, np.float64) +
                    np.asarray(ZTlo, np.float64), 1, 2)
    return T, Z, ok, info


def backerr(A_np, T, Z):
    p = T.shape[0]
    scale = np.abs(A_np).max()
    worst = 0.0
    for l in range(p):
        Ax = Z[l] @ T[l] @ Z[(l + 1) % p].T
        worst = max(worst, np.abs(Ax - A_np[l]).max() / scale)
    return worst


for combo in COMBOS:
    aed, nb, itv, win = combo[:4]
    cfg = dataclasses.replace(default_config, aed=bool(aed), nbulges=nb,
                              aed_interval=itv, aed_window=win)
    A = rng.standard_normal((P, N, N))
    t0 = time.time()
    run(A * 0.5, cfg)  # compile + warm
    tc = time.time() - t0
    A = rng.standard_normal((P, N, N))
    t0 = time.time()
    T, Z, ok, info = run(A, cfg)
    dt = time.time() - t0
    err = backerr(A, T, Z)
    print(f"[aed_nb] p={P} n={N} aed={aed} nb={nb} itv={itv} win={win}: "
          f"{dt:.2f}s (compile+warm {tc:.1f}s) niter={info['niter']} "
          f"aed_deflated={info['aed_deflated']} ok={ok} "
          f"backerr={err:.2e}", flush=True)
