"""Resilient runner for queued on-chip measurements (round 3).

The axon tunnel dies unpredictably and HANGS clients instead of raising
(see bench.py's watchdog).  This runner probes the chip with a tiny
subprocess matmul; while the tunnel answers it executes the queued
measurement commands ONE AT A TIME, each in its own subprocess with a
hard timeout, appending stdout/stderr to ``benchmarks/results_r3.log``.
A hung/failed measurement is retried once the tunnel answers again
(max ``RETRIES`` attempts each).

Usage: python benchmarks/chip_queue.py  (run under nohup/timeout; safe to
restart — finished items are recorded in the state file
/tmp/chip_queue_state_r3.json and skipped).  An fcntl lock on
/tmp/chip_queue.lock guarantees a single instance (round-2 logs showed
two concurrent runners interleaving).
"""
from __future__ import annotations

import fcntl
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "benchmarks", "results_r4.log")
STATE = "/tmp/chip_queue_state_r4.json"
LOCK = "/tmp/chip_queue.lock"
RETRIES = 6  # tunnel deaths mid-compile dominate failures

# (name, argv, timeout_s[, env_extra]) — ordered by decision value.
QUEUE = [
    # ==================== round-4 queue ====================
    # 1) bench dress on the warm cache: validates the shipping headline
    #    pipeline end-to-end and re-populates the remote program cache
    #    (round-3 device programs are unchanged by the round-4 host-side
    #    work so far).
    ("bench_dress_r4", [sys.executable, "bench.py"], 7200),
    # 2) phase attribution at the headline: where do the 9.12 s go now
    #    (reduction vs device chunks vs AED host events)?  Decides the
    #    next perf lever for the <= 8 s target (VERDICT #1).
    ("phases_p16_n512", [sys.executable, "benchmarks/probe_phases.py",
                         "16", "512"], 7200),
    # 3b) AED interval/window re-sweep with the NATIVE analyses: the r3
    #    sweep (which kept itv=auto=n//4) was measured when each event
    #    cost ~150 ms; events now cost ~tens of ms, so denser intervals
    #    and wider windows should cut niter=640 substantially (phases:
    #    iteration 7.77 s of the 9.6 s pipeline).  Host-side knobs only:
    #    every combo reuses the compiled programs (~1 min/combo).
    ("aed_retune_p16_n512", [sys.executable, "benchmarks/aed_timing.py",
                             "16", "512",
                             "1:1,1:1:64:48,1:1:40:64,1:1:64:64,"
                             "1:1:96:64,1:1:40:96"], 7200),
    # 3c) kernel-G (fused per-iteration glue) A/B at the headline: the
    #    per-iteration fixed cost (12.1 ms at p=16 n=512) is glue-launch
    #    dominated; kernel G fuses band products + scan + shifts into one
    #    Mosaic launch (ops/pallas_glue.py).  Validated on CPU (band
    #    parity 7e-15, oracle-identical cores); this measures the
    #    wall-clock win and on-chip accuracy.  Fresh Mosaic compile.
    ("glue_kernel_ab_p16_n512", [sys.executable,
                                 "benchmarks/aed_timing.py",
                                 "16", "512", "1:1"], 7200,
     {"PSD_GLUE_KERNEL": "1"}),

    # 7) bench dress with the NEW timing (sync on the ok scalar; the
    #    ~3 s tunnel export of T/Z no longer counted) — the number the
    #    driver's round-end bench.py will record.  Program set cached by
    #    the earlier dress.
    ("bench_dress_r4_newtiming", [sys.executable, "bench.py"], 7200),

    # 6) ensemble throughput A/B (VERDICT #6): sequential loop vs
    #    2-worker pipelined double-buffering at (p=8, n=128).
    ("ensemble_ab_p8_n128", [sys.executable, "benchmarks/probe_ensemble.py",
                             "8", "128", "8"], 5400),

    # 3) public-API e2e journey (VERDICT #3).  The 23:40 standalone
    #    attempt died UNAVAILABLE on the first leg after 31 min — the
    #    known compile-service flake; retries are the cure.
    ("e2e_public_api", [sys.executable, "benchmarks/probe_e2e_chip.py"],
     5400, {"PSD_E2E_ALL": "1"}),

    # 4) cx chunked core at n >= 256 on-chip (VERDICT #4): the graded-
    #    band stall class was discovered at n=512 on the real core; the
    #    complex core has never been driven past n=128 on hardware.
    #    Fresh compiles (deferred protocol ~250 s on a healthy service).
    ("complex_ff_p8_n256", [sys.executable,
                            "benchmarks/probe_complex_ff.py",
                            "8", "256"], 7200,
     {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/psd_jax_cache_cxdd"}),
    # 5) rg chunked core at n >= 256 on-chip (VERDICT #4) with the NEW
    #    native C++ AED window analyses (first time the rg AED crosses
    #    its aed_min_n=192 gate on hardware).
    ("real_gen_ff_p8_n256", [sys.executable,
                             "benchmarks/probe_real_gen_ff.py",
                             "8", "256"], 7200,
     {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/psd_jax_cache_rgff"}),

    # 8) per-iteration fixed-cost decomposition (the round-5 perf
    #    question: what IS the ~12 ms/iter — sweep launches/copies,
    #    transposes, or cond boundaries?)  In-program maxiter marginals,
    #    three variants; 6 fresh compiles, so it rides last.
    ("iterfixed_p16_n512", [sys.executable,
                            "benchmarks/probe_iterfixed.py",
                            "16", "512"], 7200),
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


def chip_up(timeout_s: int = 900) -> bool:
    # 420 s: axon init alone is ~60 s, and concurrent pytest/compile load
    # on this 1-CPU box can stretch it severalfold (observed 08-20).
    # DEVNULL, not capture_output: the axon runtime spawns helpers that
    # inherit the pipes, and after the timeout kill subprocess.run blocks
    # draining them until the GRANDCHILDREN exit — observed hanging the
    # queue for 25+ min on 2026-08-21 while the tunnel itself was healthy.
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL,
                           timeout=timeout_s, cwd=REPO)
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
    lock_f = open(LOCK, "w")
    try:
        fcntl.flock(lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        print("chip_queue: another instance holds the lock; exiting",
              flush=True)
        return
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
            if "cpu_aot_loader" in ln or "SIGILL" in ln:
                continue  # machine-feature E-log spam (harmless, huge)
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
