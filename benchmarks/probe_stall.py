"""Diagnose the draw-dependent n=512 no-deflation stall.

Several headline draws (incl. the seed-12345 A*0.5 warmup draw) run the
ds real core to the iteration cap with i frozen at n-1 and ZERO
deflations (results_r3.log 13:59 warmup, 14:51/15:07 measured; the 08-20
"banded" failures share the signature — the stall is mode-independent).
This probe runs the stalling draw for a bounded number of iterations,
pulls the LOOP STATE, and evaluates on the host:

  - the trailing subdiagonal magnitudes of H[0] (is the sweep converging
    at all?),
  - the Ahues-Tisseur deflation test values the core would compute (is a
    deflatable subdiagonal being missed?),
  - the band-product entries and the Francis shift quantities at the
    window foot (are the shifts sane?),
  - progression between two caps (is H changing between iterations?).

Usage: python benchmarks/probe_stall.py [p] [n] [scale]
"""
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import \
    phessenberg_core_ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import \
    pqr_real_core_ff, _band_products_scaled  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.ff import FF  # noqa: E402

tpu = jax.devices()[0]
rng = np.random.default_rng(12345)
A = rng.standard_normal((p, n, n)) * scale


def split(x):
    f = ff.from_f64(jnp.asarray(x))
    return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)


hi, lo = split(A)
Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)

state = None
prev_sub = None
for cap in (64, 128, 256):
    out = pqr_real_core_ff(Hh, Hl, Qh, Ql, want_z=True, maxitfac=40,
                           it_cap=jnp.int32(cap), resume_state=state,
                           return_state=True)
    *outs, state, done = out
    i_cur = int(state[4])
    jiter = int(state[-1])
    Hs = (np.asarray(state[0].hi[0], np.float64) +
          np.asarray(state[0].lo[0], np.float64))
    sub = np.abs(np.diag(Hs[:n, :n], -1))
    print(f"[stall] cap={cap} jiter={jiter} i={i_cur} done={bool(done)}",
          flush=True)
    tail = sub[max(0, i_cur - 8):i_cur]
    print(f"[stall]   trailing subdiags: {np.array2string(tail, precision=2)}",
          flush=True)
    # Ahues-Tisseur-ish scale check: |h_sub| vs ulp-scaled neighbors
    diag = np.abs(np.diag(Hs[:n, :n]))
    ulp = float(ff.EPS)
    at = sub / np.maximum(
        np.sqrt(np.maximum(diag[:-1] * diag[1:], 1e-300)), 1e-300)
    print(f"[stall]   sub/sqrt(d*d1) tail: "
          f"{np.array2string(at[max(0, i_cur - 8):i_cur], precision=2)}",
          flush=True)
    if prev_sub is not None:
        delta = np.abs(sub - prev_sub).max()
        print(f"[stall]   max subdiag change since last cap: {delta:.3e}",
              flush=True)
    prev_sub = sub.copy()
    # band products + shift window
    Hst = state[0]
    hdiag, hsub, hsup, e, scs = jax.jit(
        lambda Hh_, Hl_: _band_products_scaled(FF(Hh_, Hl_), n))(
            Hst.hi, Hst.lo)
    hd = np.asarray(hdiag)
    hs = np.asarray(hsub)
    print(f"[stall]   band scale e={int(e)}; product diag tail: "
          f"{np.array2string(hd[max(0, i_cur - 3):i_cur + 1], precision=3)}",
          flush=True)
    print(f"[stall]   product sub tail: "
          f"{np.array2string(hs[max(0, i_cur - 3):i_cur + 1], precision=3)}",
          flush=True)
    if bool(done):
        break
print("[stall] done", flush=True)
