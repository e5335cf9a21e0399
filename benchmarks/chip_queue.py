"""Resilient runner for queued on-chip measurements.

The axon tunnel dies unpredictably and HANGS clients instead of raising
(see bench.py's watchdog).  This runner probes the chip with a tiny
subprocess matmul; while the tunnel answers it executes the queued
measurement commands ONE AT A TIME, each in its own subprocess with a
hard timeout, appending stdout/stderr to ``benchmarks/results_r2.log``.
A hung/failed measurement is retried once the tunnel answers again
(max ``RETRIES`` attempts each).

Usage: python benchmarks/chip_queue.py  (run under nohup/timeout; safe to
restart — finished items are recorded in the log and skipped via the
state file /tmp/chip_queue_state.json).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "benchmarks", "results_r2.log")
STATE = "/tmp/chip_queue_state.json"
RETRIES = 6  # tunnel deaths mid-compile dominate failures (2026-08-19)

# (name, argv, timeout_s[, env_extra]) — ordered by decision value.
# complex_ff gets a FRESH compilation-cache dir: the shared cache holds an
# XLA:CPU AOT entry whose machine features mismatch this host (loader
# E-logs "could lead to execution errors such as SIGILL"), and attempt 1
# died signal-style right after that load.  The TPU executables it needs
# were never cached successfully anyway (the first-chunk compile is the
# wedge under study), so an isolated dir costs nothing.
QUEUE = [
    # === bench.py dress rehearsal (STEP mode, the known-good config) ===
    # The 08-20 banded headline attempts never deflated; the default has
    # been reverted to per-step kernels.  Run the exact bench pipeline
    # first: confirms convergence post-revert AND pre-populates the
    # persistent compile cache so the driver's bench.py run is cheap.
    ("headline_step_p16_n512", [sys.executable,
                                "benchmarks/probe_headline.py",
                                "16", "512"], 5400,
     {"PSD_GROUP_MODE": "step"}),
    # === NUMERICAL VERIFICATION of the on-chip Mosaic sweep compiles ===
    # The 08-20 headline attempts ran 340 iterations WITHOUT A SINGLE
    # deflation (i stuck at 511) under banded+HBM — interpret-mode tests
    # pass, so the suspect is the on-chip compilation of the grouped /
    # banded kernels.  Verify each mode's sweep invariants (orthogonality,
    # reconstruction, structure) before spending headline-length runs.
    ("sweepverify_banded_p16_n256", [sys.executable,
                                     "benchmarks/probe_sweep_verify.py",
                                     "16", "256"], 2400,
     {"PSD_GROUP_MODE": "banded"}),
    ("sweepverify_seq_p16_n256", [sys.executable,
                                  "benchmarks/probe_sweep_verify.py",
                                  "16", "256"], 2400,
     {"PSD_GROUP_MODE": "seq"}),
    ("sweepverify_step_p16_n256", [sys.executable,
                                   "benchmarks/probe_sweep_verify.py",
                                   "16", "256"], 2400,
     {"PSD_GROUP_MODE": "step"}),
    ("sweepverify_banded_hbm_p16_n512", [sys.executable,
                                         "benchmarks/probe_sweep_verify.py",
                                         "16", "512"], 3600,
     {"PSD_GROUP_MODE": "banded", "PSD_GROUP_HBM": "1"}),
    ("sweepverify_seq_hbm_p16_n512", [sys.executable,
                                      "benchmarks/probe_sweep_verify.py",
                                      "16", "512"], 3600,
     {"PSD_GROUP_MODE": "seq", "PSD_GROUP_HBM": "1"}),
    # ds real GPSD record (Pallas chase): the contract-grade counterpart;
    # first on-chip run of the DEFERRED chunked protocol
    ("real_gen_ff_p6_n128", [sys.executable,
                             "benchmarks/probe_real_gen_ff.py",
                             "6", "128"], 5400,
     {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/psd_jax_cache_rgff"}),
    # complex ds re-record under the DEFERRED protocol on a FRESH cache:
    # validates the protocol on-chip and measures the compile-time win
    # (the in-loop-deflation trace took 1690.9 s to compile on 08-20)
    ("complex_ff_dd_p6_n128", [sys.executable,
                               "benchmarks/probe_complex_ff.py",
                               "6", "128"], 5400,
     {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/psd_jax_cache_cxdd"}),
    ("mb_timing_p8_n128", [sys.executable, "benchmarks/mb_timing.py",
                           "8", "128", "1,2,4"], 3600),
    ("aed_timing_p8_n128", [sys.executable, "benchmarks/aed_timing.py",
                            "8", "128"], 3600),
    ("phases_p16_n512", [sys.executable, "benchmarks/probe_phases.py",
                         "16", "512"], 5400),
    ("real_gen_p6_n128", [sys.executable, "benchmarks/probe_real_gen.py",
                          "6", "128"], 3600),
]

PROBE = ("import jax, jax.numpy as jnp;"
         "d = jax.devices()[0];"
         "x = jax.device_put(jnp.ones((128, 128)), d);"
         "print(float((x @ x).sum()))")


def log(msg: str):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def chip_up(timeout_s: int = 420) -> bool:
    # 420 s: axon init alone is ~60 s, and concurrent pytest/compile load
    # on this 1-CPU box can stretch it severalfold (observed 08-20).
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, timeout=timeout_s, cwd=REPO)
        return r.returncode == 0
    except Exception:
        return False


def load_state():
    try:
        with open(STATE) as f:
            return json.load(f)
    except Exception:
        return {}


def save_state(st):
    with open(STATE, "w") as f:
        json.dump(st, f)


def main():
    st = load_state()
    pending = [q for q in QUEUE if st.get(q[0], {}).get("done") is not True
               and st.get(q[0], {}).get("attempts", 0) < RETRIES]
    log(f"chip_queue start: {len(pending)} pending of {len(QUEUE)}")
    while pending:
        if not chip_up():
            log("tunnel down; sleeping 120 s")
            time.sleep(120)
            continue
        name, argv, tmo = pending[0][:3]
        env = dict(os.environ, **(pending[0][3] if len(pending[0]) > 3
                                  else {}))
        rec = st.setdefault(name, {"attempts": 0})
        rec["attempts"] += 1
        save_state(st)
        log(f"running {name} (attempt {rec['attempts']}) ...")
        t0 = time.time()
        try:
            r = subprocess.run(argv, capture_output=True, timeout=tmo,
                               cwd=REPO, text=True, env=env)
            out = (r.stdout or "") + (r.stderr or "")
            ok = r.returncode == 0
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode("utf-8", "replace") if
                   isinstance(e.stdout, bytes) else (e.stdout or ""))
            out += "\n<TIMEOUT>"
            ok = False
        dt = time.time() - t0
        for ln in out.strip().splitlines():
            log(f"  | {ln}")
        log(f"{name}: {'OK' if ok else 'FAIL'} in {dt:.0f}s")
        if ok:
            rec["done"] = True
        save_state(st)
        pending = [q for q in QUEUE if st.get(q[0], {}).get("done") is not
                   True and st.get(q[0], {}).get("attempts", 0) < RETRIES]
    log("chip_queue: all done (or retries exhausted)")


if __name__ == "__main__":
    main()
