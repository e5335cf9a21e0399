"""Decompose the ~12 ms/iteration FIXED cost of the ds real core.

Round-4 finding: per-iteration cost is ~constant in the active-window
size (12.1 ms at p=16 n=512; kernel-G showed it is NOT the band/scan/
shift XLA glue).  Remaining suspects: the three sweep pallas launches
with full-state copies + transposes, the band-product glue, and the
cond boundaries shuffling the ~70 MB (H, ZT) state.

Method: ONE compiled program per variant (the iteration cap rides the
TRACED ``it_cap`` argument, so K=40 vs K=80 reuse the executable), and
marginal timing (t(K2) - t(K1)) / (K2 - K1) with the ok-scalar sync.
The duplicate-work variants (ops/pqr_ff.py, PSD_ITERFIXED_VARIANT) keep
data and control flow BITWISE IDENTICAL to base (validated on CPU) while
adding exactly one unit of the suspected cost per iteration:

  base      : defaults (want_z=True)
  noz       : want_z=False   (kernel B loses its Z^T targets)
  dupsweep  : + one identity full sweep per chase iteration
              (launches + copies + transposes + in-kernel steps)
  dupband   : + one band-product + scan evaluation per iteration
  dupcond   : + FOUR identity cond boundaries carrying (H, ZT)
              (cost printed per single cond)

Usage: python benchmarks/probe_iterfixed.py [p] [n]
"""
import os
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

dev = jax.devices()[0]
print(f"[iterfixed] device {dev}, p={p} n={n}", flush=True)

# Round-5 method fix: the first run measured marginals over 40-iteration
# deltas (~0.5 s of signal vs +-0.5 s tunnel noise) AND re-used the
# warmup's (draw, cap) pair, which the axon content-addressed execution
# cache replays instantly — both killed the attribution (base printed
# 12.8 vs 1.3 ms/iter on its two draws, results_r5.log 18:14).  Now:
# every timed call is a FRESH (draw, cap) pair, deltas are 200
# iterations (~2.4 s of signal), and the report is the median of three
# draws.
K1, K2 = 60, 260

hess = jax.jit(lambda hi, lo: phessenberg_core_ff(hi, lo, want_q=True))
draws = []
for seed in (4242, 999, 31337, 777):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((p, n, n))
    Af = ff.from_f64(jnp.asarray(A))
    outs = hess(jax.device_put(Af.hi, dev), jax.device_put(Af.lo, dev))
    draws.append(tuple(np.asarray(o) for o in outs))
print("[iterfixed] reductions done", flush=True)


def make_fn(variant, want_z):
    os.environ["PSD_ITERFIXED_VARIANT"] = variant
    import importlib

    import periodicschurdecompositions_jl_tpu.ops.pqr_ff as m
    importlib.reload(m)

    def fn(hh, hl, qh, ql, itcap):
        return m.pqr_real_core_ff(hh, hl, qh, ql, want_z=want_z,
                                  cfg=default_config, it_cap=itcap)

    return jax.jit(fn)


def timed(fn, draw, K):
    hh, hl, qh, ql = (jax.device_put(jnp.asarray(x), dev) for x in draw)
    cap = jax.device_put(jnp.int32(K), dev)
    t0 = time.time()
    out = fn(hh, hl, qh, ql, cap)
    bool(np.asarray(out[8]))  # sync on the tiny ok scalar
    return time.time() - t0


for tag, variant, want_z, div in (
        ("base", "", True, 1.0),
        ("noz", "", False, 1.0),
        ("dupsweep", "dupsweep", True, 1.0),
        ("dupband", "dupband", True, 1.0),
        ("dupcond", "dupcond", True, 4.0),
        # litedeflate: defl2's 2x2 machinery replaced by the cheap 1x1
        # path — wall-clock only (control flow diverges); a large drop
        # pins the fixed cost on the deflation branch's launch storm
        ("litedeflate", "litedeflate", True, 1.0)):
    try:
        fn = make_fn(variant, want_z)
        t0 = time.time()
        timed(fn, draws[0], K1)  # compile (once per variant) + warm
        warm = time.time() - t0
        pers = []
        for d in draws[1:]:  # draw 0 is warmup-only (its K1 is cached)
            t1 = timed(fn, d, K1)
            t2 = timed(fn, d, K2)
            pers.append((t2 - t1) / (K2 - K1) * 1e3)
        med = sorted(pers)[len(pers) // 2]
        pstr = " / ".join(f"{x:.2f}" for x in pers)
        print(f"[iterfixed] {tag}: {pstr} ms/iter "
              f"(median {med:.2f}, per-unit {med / div:.2f} ms, "
              f"compile+warm {warm:.0f}s)", flush=True)
    except Exception as e:
        print(f"[iterfixed] {tag}: FAIL {type(e).__name__}: {e}",
              flush=True)
print("[iterfixed] done", flush=True)
