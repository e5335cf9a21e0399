"""On-chip A/B timing: multi-bulge sweeps (cfg.nbulges) vs single-bulge.

Times the ds real periodic QR pipeline at a given (p, n) for each nb in
NBLIST, with fresh inputs per measured run (content-addressed caching) and
forced host transfers.  Prints wall-clock, iterations consumed, and
backward error per configuration.
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
NBLIST = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                           else ["1", "2", "4"])]
MAXITFAC = 40

import jax
import jax.numpy as jnp
from periodicschurdecompositions_jl_tpu.config import default_config, \
    setverbosity
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (
    phessenberg_core_ff)
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
    pqr_real_core_ff_chunked)

setverbosity(1, "main")
tpu = jax.devices()[0]
rng = np.random.default_rng(4242)


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


def run(A_np, cfg):
    hi, lo = split(A_np)
    Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
    out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True,
                                   maxitfac=MAXITFAC, cfg=cfg)
    Thi, Tlo, ZThi, ZTlo = out[0], out[1], out[2], out[3]
    ok = bool(out[8])
    T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
    Z = np.swapaxes(np.asarray(ZThi, np.float64) +
                    np.asarray(ZTlo, np.float64), 1, 2)
    return T, Z, ok


def backerr(A_np, T, Z):
    p = T.shape[0]
    scale = np.abs(A_np).max()
    worst = 0.0
    for l in range(p):
        Ax = Z[l] @ T[l] @ Z[(l + 1) % p].T
        worst = max(worst, np.abs(Ax - A_np[l]).max() / scale)
    return worst


for nb in NBLIST:
    cfg = (default_config if nb == 1 else
           dataclasses.replace(default_config, nbulges=nb))
    A = rng.standard_normal((P, N, N))
    t0 = time.time()
    run(A * 0.5, cfg)  # compile + warm
    tc = time.time() - t0
    A = rng.standard_normal((P, N, N))
    t0 = time.time()
    T, Z, ok = run(A, cfg)
    dt = time.time() - t0
    err = backerr(A, T, Z)
    print(f"[mb] p={P} n={N} nb={nb}: {dt:.2f}s (compile+warm {tc:.1f}s) "
          f"ok={ok} backerr={err:.2e}", flush=True)
