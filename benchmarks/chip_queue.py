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
LOG = os.path.join(REPO, "benchmarks", "results_r5.log")
STATE = "/tmp/chip_queue_state_r5.json"
LOCK = "/tmp/chip_queue.lock"
RETRIES = 6  # tunnel deaths mid-compile dominate failures

# (name, argv, timeout_s[, env_extra]) — ordered by decision value.
QUEUE = [
    # ========== round-5 queue, phase 3 (kernels D+R+S routed) ==========
    # Every core HLO changed (fused deflation/ladder/shift kernels):
    # first items pay the fresh compiles and warm the cache for bench.
    # 1) public-API e2e journey (complex-on-chip stall fixed; numpy cx
    #    input; recursion limits raised).
    ("e2e_public_api", [sys.executable, "benchmarks/probe_e2e_chip.py"],
     5400, {"PSD_E2E_ALL": "1"}),
    # 2) headline at shipping defaults with all round-5 kernels — the
    #    kernel-D/R/S validation AND the bench cache warmer.
    ("aed_default_recheck", [sys.executable,
                             "benchmarks/probe_headline.py",
                             "16", "512", "1"], 5400),
    # 3) bench dress (warm cache): the shipping headline end-to-end.
    ("bench_dress_r5", [sys.executable, "bench.py"], 7200),
    # 4) cx record landed (51.5 s / 5.66e-13 at p=8 n=256, 21:29).
    ("complex_ff_p8_n256", [sys.executable,
                            "benchmarks/probe_complex_ff.py",
                            "8", "256"], 7200),
    # 5) decision A/Bs first (~1.8 h left): AED retune (host-side knobs,
    #    core cache hits) and multibulge nb=2 (fresh core compile).
    ("aed_itv40_win96", [sys.executable, "benchmarks/probe_headline.py",
                         "16", "512", "1", "40", "96"], 5400),
    ("nb2_headline", [sys.executable, "benchmarks/probe_headline.py",
                      "16", "512", "1", "0", "0", "2"], 5400),
    # 6) rg record at n=256.
    ("real_gen_ff_p8_n256", [sys.executable,
                             "benchmarks/probe_real_gen_ff.py",
                             "8", "256"], 7200),
    # 7) final bench dress (re-warm if any default flips above).
    ("bench_dress_final", [sys.executable, "bench.py"], 7200),
    # 8+) as time allows (hesskernel cheapest-first).
    ("hesskernel_v2_p16_n512", [sys.executable,
                                "benchmarks/probe_hesskernel.py",
                                "16", "512"], 7200),
    ("krylov_chip_4_256", [sys.executable,
                           "benchmarks/probe_krylov_chip.py",
                           "4", "256", "4"], 5400),
    ("iterfixed_v2_p16_n512", [sys.executable,
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
