"""Headline error/time budget probe (TPU): reduction vs iteration.

Runs the ds pipeline at a configurable size on the chip and reports
 - reduction-only backward error (phessenberg_core_ff),
 - full-pipeline backward error,
 - Z orthogonality,
 - wall-clock of each stage (fresh inputs, host-transfer timing).

Usage: python benchmarks/probe_headline.py [p] [n] [aed] [itv] [win] [nb]
  aed: 1 (default, shipping config) or 0 — A/B's the AED accuracy/time
  impact at headline scale on the same seed-12345 draw.
  itv/win: optional aed_interval / aed_window overrides (0 = auto) —
  round-5 re-sweep after the one-transfer boundary batching removed the
  0.3-0.5 s/event host cost that made denser intervals lose in round 4.
"""
import dataclasses
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
aed = (int(sys.argv[3]) if len(sys.argv) > 3 else 1) != 0
itv = int(sys.argv[4]) if len(sys.argv) > 4 else 0
win = int(sys.argv[5]) if len(sys.argv) > 5 else 0
nb = int(sys.argv[6]) if len(sys.argv) > 6 else 1

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import \
    phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import \
    pqr_real_core_ff_chunked
from periodicschurdecompositions_jl_tpu.config import (default_config,
                                                       setverbosity)
setverbosity(1)
cfg = dataclasses.replace(default_config, aed=aed, aed_interval=itv,
                          aed_window=win, nbulges=nb)
print(f"[probe] config: aed={aed} itv={itv} win={win} nb={nb}",
      flush=True)

tpu = jax.devices()[0]
rng = np.random.default_rng(12345)
A = rng.standard_normal((p, n, n))


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


def tonp(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def backerr(A, T, Z, ZT=True):
    worst = 0.0
    scale = np.abs(A).max()
    for l in range(A.shape[0]):
        Zl = Z[l].T if ZT else Z[l]
        Zn = Z[(l + 1) % A.shape[0]].T if ZT else Z[(l + 1) % A.shape[0]]
        Ax = Zl @ T[l] @ Zn.T
        worst = max(worst, np.abs(Ax - A[l]).max() / scale)
    return worst


# warmup/compile THE WHOLE PIPELINE (iteration compile is minutes; timing
# below must be compile-free, on fresh inputs)
hi, lo = split(A * 0.5)
Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
t0 = time.time()
_ = np.asarray(pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True,
                                        maxitfac=40, cfg=cfg)[0])
print(f"[probe] warmup (compile + run): {time.time()-t0:.1f}s", flush=True)

hi, lo = split(A)
t0 = time.time()
Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
H = tonp(Hh, Hl)
QT = tonp(Qh, Ql)
t_red = time.time() - t0
# reduction backerr: A ?= Q H Q_{l+1}' with Q stored transposed
e_red = backerr(A, H, QT, ZT=True)
orth_red = max(np.abs(QT[l] @ QT[l].T - np.eye(n)).max()
               for l in range(p))
print(f"[probe] reduction: {t_red:.2f}s backerr {e_red:.3e} "
      f"orth {orth_red:.3e}", flush=True)

t0 = time.time()
out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True, maxitfac=40,
                               cfg=cfg, with_info=True)
(Th, Tl, Zh, Zl_, wrh, wrl, wih, wil, ok) = out[:9]
info = out[-1]
T = tonp(Th, Tl)
ZT_ = tonp(Zh, Zl_)
t_it = time.time() - t0
e_full = backerr(A, T, ZT_, ZT=True)
orth = max(np.abs(ZT_[l] @ ZT_[l].T - np.eye(n)).max() for l in range(p))
# iteration-only error: the final Z folds the reduction's Q, so factor Q
# out first (Ziter[l] = Q[l]' Z[l] = QT[l] @ ZT[l].T) and test
# H[l] ?= Ziter[l] T[l] Ziter[l+1]' against the reduced H.
e_it = 0.0
scale = np.abs(H).max()
for l in range(p):
    Zi = QT[l] @ ZT_[l].T
    Zi1 = QT[(l + 1) % p] @ ZT_[(l + 1) % p].T
    Hx = Zi @ T[l] @ Zi1.T
    e_it = max(e_it, np.abs(Hx - H[l]).max() / scale)
print(f"[probe] iteration: {t_it:.2f}s ok={bool(ok)} "
      f"niter={info['niter']} aed_deflated={info['aed_deflated']} "
      f"full backerr {e_full:.3e} iter-only {e_it:.3e} orth {orth:.3e}",
      flush=True)
