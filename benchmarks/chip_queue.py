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
LOG = os.path.join(REPO, "benchmarks", "results_r3.log")
STATE = "/tmp/chip_queue_state_r3.json"
LOCK = "/tmp/chip_queue.lock"
RETRIES = 6  # tunnel deaths mid-compile dominate failures

# (name, argv, timeout_s[, env_extra]) — ordered by decision value.
QUEUE = [
    # === THE decision measurement: AED off at headline scale ===
    # Round-2's only headline record (AED on, shipping default) was
    # 40.47 s / backerr 4.656e-12 — off-contract and 2.6x slower than
    # BENCH_r01.  aed_timing at p=8 n=128 showed aed=1 costs 3x wall
    # clock (host window analyses between chunks).  Same probe, same
    # seed-12345 draw, aed=0: if backerr returns to ~2e-13-grade and
    # time to ~16 s, AED's ds writeback is the accuracy culprit AND the
    # wall-clock culprit, and the shipping default flips to aed=False.
    ("headline_noaed_p16_n512", [sys.executable,
                                 "benchmarks/probe_headline.py",
                                 "16", "512", "0"], 5400),
    # === full-pipeline kernel-B mode A/B at p=16 n=256 (fast, aed=0) ===
    # probe_sweep_verify passed ALL modes on-chip (08-20 11:40-12:19),
    # so the single-sweep math is fine; the banded headline failure
    # (340 iters, zero deflations) must come from pipeline-level
    # composition.  Same draw in all three (aed_timing seeds 4242):
    # step = base, seq must be BITWISE (same niter, same backerr),
    # banded = diagnose.
    ("fullpipe_step_p16_n256", [sys.executable, "benchmarks/aed_timing.py",
                                "16", "256", "0:1"], 3600,
     {"PSD_GROUP_MODE": "step"}),
    ("fullpipe_seq_p16_n256", [sys.executable, "benchmarks/aed_timing.py",
                               "16", "256", "0:1"], 3600,
     {"PSD_GROUP_MODE": "seq"}),
    ("fullpipe_banded_p16_n256", [sys.executable, "benchmarks/aed_timing.py",
                                  "16", "256", "0:1"], 3600,
     {"PSD_GROUP_MODE": "banded"}),
    # === accuracy-regression bisect (headline 2.28e-13 -> 5.585e-12) ===
    # Fixed draw (seed 777), AED forced off, p=8 n=128 (fast runs).
    # Chronology: e285a96 record -> b22e85a three-kernel restructure +
    # 83d2623 multibulge + 14cb348 run-collapse + 2731bff cond merge ->
    # AED series + b7c27e5 review fixes -> 669af51/ac00345 generation
    # fusion -> bcd307d 2x2-retriangularization + e5e75da register-carry.
    ("bisect_head", [sys.executable, "benchmarks/probe_bisect.py",
                     "/root/repo", "8", "128", "777"], 3000),
    ("bisect_e285a96_record", [sys.executable, "benchmarks/probe_bisect.py",
                               "/tmp/wt_rec", "8", "128", "777"], 3000),
    ("bisect_2731bff_condmerge", [sys.executable,
                                  "benchmarks/probe_bisect.py",
                                  "/tmp/wt_2731bff", "8", "128", "777"],
     3000),
    ("bisect_b7c27e5_reviewfix", [sys.executable,
                                  "benchmarks/probe_bisect.py",
                                  "/tmp/wt_b7c27e5", "8", "128", "777"],
     3000),
    ("bisect_e5e75da_regcarry", [sys.executable,
                                 "benchmarks/probe_bisect.py",
                                 "/tmp/wt_e5e75da", "8", "128", "777"],
     3000),
    # === POST-FIX confirmation: exact-recip + tau-refit generation ===
    # The CPU+chip bisect attributed the accuracy regression to the
    # fused-generation (669af51) and fast-reciprocal (ac00345) commits;
    # the fix restores record-era generation numerics (CPU pipeline
    # 2.66e-13 -> 5.59e-14 at p=2 n=12).  Confirm on-chip at both scales.
    ("bisect_head_fixed", [sys.executable, "benchmarks/probe_bisect.py",
                           "/root/repo", "8", "128", "777"], 3000),
    ("headline_noaed_fixed_p16_n512", [sys.executable,
                                       "benchmarks/probe_headline.py",
                                       "16", "512", "0"], 5400),
    # === DIAGNOSE the draw-dependent n=512 no-deflation stall ===
    # The seed-12345 A*0.5 warmup draw stalls at i=511 for the full
    # 20480-iteration budget in EVERY kernel mode (and the measured
    # draw joined it after the bit-level generation change) — the same
    # signature as the 08-20 "banded" headline failures.  State-level
    # host analysis of subdiagonals / deflation tests / shifts.
    ("stall_diag_p16_n512", [sys.executable, "benchmarks/probe_stall.py",
                             "16", "512", "0.5"], 3600),
    # === STALL FIX validation: both previously-stalling draws ===
    # After the stagnation-relaxed deflation criterion (9cd947a), the
    # seed-12345 warmup (A*0.5) and measured (A) draws must converge.
    # This is also the BENCH draw — the round's headline number.
    ("headline_stallfix_p16_n512", [sys.executable,
                                    "benchmarks/probe_headline.py",
                                    "16", "512", "0"], 5400),
    # === AED re-decision with the native window Schur + move budget ===
    # RESULT (15:24): aed=0 STALLS (64 s, niter cap, ok=False); aed=1 is
    # 12.07 s / niter 578 / backerr 1.80e-13 — accuracy + speed + stall
    # rescue.  Default flipped back ON (b59857b).
    ("aed_native_ab_p16_n512", [sys.executable, "benchmarks/aed_timing.py",
                                "16", "512", "0:1,1:1"], 7200),
    # === bench dress rehearsal with the FINAL defaults ===
    # The exact bench.py pipeline (aed on, native analysis, stall fix):
    # validates the seed-12345 bench draws end-to-end and pre-populates
    # the compile cache for the driver's round-end bench run.
    ("bench_dress", [sys.executable, "bench.py"], 7200),
    # small-scale AED A/B with the native analysis (updates the p=8
    # n=128 numbers recorded with the slow jitted analysis)
    ("aed_native_ab_p8_n128", [sys.executable, "benchmarks/aed_timing.py",
                               "8", "128", "0:1,1:1"], 3600),
    # AED interval/window sweep at the headline (host-side knobs: every
    # combo reuses the compiled programs — ~1 min/combo): denser
    # harvests may cut niter below 578 for ~150 ms/event
    ("aed_itv_sweep_p16_n512", [sys.executable, "benchmarks/aed_timing.py",
                                "16", "512",
                                "1:1:40,1:1:24,1:1:120,1:1:40:64"], 5400),
    # seq+HBM headline RETRY after the stall fix: the earlier failure is
    # now attributed to the stall (mode-independent); if seq converges
    # and beats step wall-clock, it becomes the shipping kernel-B mode.
    ("headline_seq_stallfix_p16_n512", [sys.executable,
                                        "benchmarks/probe_headline.py",
                                        "16", "512", "1"], 7200,
     {"PSD_GROUP_MODE": "seq", "PSD_GROUP_HBM": "1"}),
    # bench rerun with the aed_min_n gate: throughput at p=8 n=128 no
    # longer pays AED's ~2 s host overhead per problem (0.77 s vs
    # 2.63 s measured) — expect ~3x problems/min; headline unchanged
    ("bench_dress2", [sys.executable, "bench.py"], 7200),
    # post-fix re-records for the other two ds cores (the generation fix
    # applies to cxff/rg generation too; the chunked signed reduction is
    # now the default mixed-S route)
    ("complex_ff_rerecord_p6_n128", [sys.executable,
                                     "benchmarks/probe_complex_ff.py",
                                     "6", "128"], 5400,
     {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/psd_jax_cache_cxdd"}),
    ("real_gen_ff_rerecord_p6_n128", [sys.executable,
                                      "benchmarks/probe_real_gen_ff.py",
                                      "6", "128"], 5400,
     {"JAX_COMPILATION_CACHE_DIR": "/root/.cache/psd_jax_cache_rgff"}),
    # public-API journey on-chip (pschur -> check -> ordschur ->
    # eigvecs).  NOTE: the 08-20 evening attempts died UNAVAILABLE —
    # the axon REMOTE COMPILE SERVICE was degraded and dropped every
    # fresh program (cached programs executed fine all evening); rerun
    # in a healthy window.  PSD_E2E_ALL=1 adds the cx/rg legs.
    ("e2e_public_api", [sys.executable, "benchmarks/probe_e2e_chip.py"],
     3600),
    # first on-chip Krylov smoke: device-resident partial_pschur
    # (n=256: the n=512 attempt spent ~26 min in tunnel round-trips
    # before the remote compile service dropped it; the CPU pin d1fc688
    # removes the failure mode, the smaller size bounds the wall)
    ("krylov_chip_p4_n256", [sys.executable,
                             "benchmarks/probe_krylov_chip.py",
                             "4", "256", "4"], 3600),
    # === candidate shipping config at headline scale ===
    # seq grouped kernel B measured 0.34 -> 0.15 ms/step marginal and is
    # bitwise-identical to step; at n=512 the inputs are HBM-staged so
    # the grouped path needs PSD_GROUP_HBM=1 (fresh Mosaic compile,
    # grouped-B was ~12 min at N=272 — generous timeout).
    ("headline_seq_noaed_p16_n512", [sys.executable,
                                     "benchmarks/probe_headline.py",
                                     "16", "512", "0"], 7200,
     {"PSD_GROUP_MODE": "seq", "PSD_GROUP_HBM": "1"}),
    # === eigenvalue-only saving (VERDICT #8): want_z=False timing ===
    ("wantz_p16_n256", [sys.executable, "benchmarks/probe_wantz.py",
                        "16", "256"], 3600),
    # === isolate the grouped+HBM pipeline failure (jit-chained sweeps) ===
    # seq+HBM headline: niter=20480, backerr 3.5e-1, orth 2.1e-13 — H and
    # Z got INCONSISTENT transforms inside the jitted while loop while the
    # standalone per-sweep verify passes; jit2 chains two sweeps in one
    # program to test the XLA-buffer-reuse hypothesis.
    ("sweepverify_jit2_seq_hbm_n512", [sys.executable,
                                       "benchmarks/probe_sweep_verify.py",
                                       "16", "512"], 3600,
     {"PSD_GROUP_MODE": "seq", "PSD_GROUP_HBM": "1"}),
    # === on-chip smoke of the host-chunked ds signed reduction ===
    # (new off-CPU default path of the mixed-S pipelines; bitwise vs
    # single-shot on CPU, 3-trace protocol needs one remote validation)
    ("cxred_chunked_p6_n128", [sys.executable,
                               "benchmarks/probe_cxred_chunked.py",
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
