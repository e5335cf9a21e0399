"""Eigenvalue-only vs full-decomposition on-chip timing (VERDICT #8).

The reference restricts updates to the active window when T is unwanted
(src/generalized.jl:202-227,756-775).  On the TPU the analogous lever
does NOT exist at the kernel level: Mosaic has no dynamic LANE slicing,
so a row/col update is a full-N-lane slab op whether or not the columns
outside [m, i] are maintained — the sweep's per-step work is already
window-restricted in the sublane dimension and cannot be narrowed in the
lane dimension.  What CAN be skipped is the entire Z^T maintenance
(kernel B's second target, measured 74% of per-step device cost split
across H^T and Z^T): ``want_z=False`` compiles kernels without the Z
updates.  This probe records that saving at (p, n).

Usage: python benchmarks/probe_wantz.py [p] [n]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

P = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = int(sys.argv[2]) if len(sys.argv) > 2 else 256

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
cfg = dataclasses.replace(default_config, aed=False)


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


def run(A_np, want_z):
    hi, lo = split(A_np)
    out0 = phessenberg_core_ff(hi, lo, want_q=want_z)
    Hh, Hl = out0[0], out0[1]
    Qh, Ql = (out0[2], out0[3]) if want_z else (None, None)
    out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=want_z,
                                   maxitfac=40, cfg=cfg, with_info=True)
    np.asarray(out[0])  # force host transfer
    return out[-1]


for want_z in (True, False):
    A = rng.standard_normal((P, N, N))
    t0 = time.time()
    run(A * 0.5, want_z)
    tc = time.time() - t0
    A = rng.standard_normal((P, N, N))
    t0 = time.time()
    info = run(A, want_z)
    dt = time.time() - t0
    print(f"[wantz] p={P} n={N} want_z={want_z}: {dt:.2f}s "
          f"(compile+warm {tc:.1f}s) niter={info['niter']}", flush=True)
