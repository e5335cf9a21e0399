"""Flagship benchmark: real periodic Schur decomposition on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

The reference publishes no wall-clock numbers (BASELINE.md), and Julia is not
available in this image, so the recorded baseline is the same jitted pipeline
executed on the host CPU backend (true float64) — ``vs_baseline`` =
cpu_seconds / tpu_seconds.  Values > 1 mean the TPU beats the host CPU.

Accuracy is also measured (max per-factor backward error); it is printed on
stderr for the record but does not affect the JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

# benchmark configuration (headline target is N=512, p=16; start where the
# current kernels terminate in minutes and scale up as perf passes land)
P_CYCLE = 8
N = 128
MAXITFAC = 40


def _run(device, A_np):
    import jax
    import jax.numpy as jnp
    from periodicschurdecompositions_jl_tpu.ops.hessenberg import phessenberg_core
    from periodicschurdecompositions_jl_tpu.ops.pqr_real import pqr_real_core

    def pipeline(A):
        H, Q = phessenberg_core(A, want_q=True)
        return pqr_real_core(H, Z=Q, want_z=True, maxitfac=MAXITFAC)

    # warmup (compile) on a scaled copy; NOTE block_until_ready is unreliable
    # under the axon remote runtime, so all timings force a host transfer of
    # the results, and the measured run uses fresh input data to defeat any
    # content-addressed execution caching.
    A = jax.device_put(jnp.asarray(A_np * 0.5), device)
    out = pipeline(A)
    _ = np.asarray(out[0])
    A = jax.device_put(jnp.asarray(A_np), device)
    t0 = time.time()
    out = pipeline(A)
    _ = np.asarray(out[0]), np.asarray(out[1])
    dt = time.time() - t0
    ok = bool(out[4])
    return dt, out, ok


def main():
    import jax

    rng = np.random.default_rng(12345)
    A_np = rng.standard_normal((P_CYCLE, N, N))

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    t_tpu, out_tpu, ok_tpu = _run(tpu, A_np)
    t_cpu, out_cpu, ok_cpu = _run(cpu, A_np)
    t_f32, out_f32, ok_f32 = _run(tpu, A_np.astype(np.float32))

    # backward error on each backend
    def backerr(out):
        T = np.asarray(out[0])
        Z = np.asarray(out[1])
        p = T.shape[0]
        worst = 0.0
        for l in range(p):
            Ax = Z[l] @ T[l] @ Z[(l + 1) % p].T
            worst = max(worst, np.abs(Ax - A_np[l]).max() / np.abs(A_np[l]).max())
        return worst

    err_tpu = backerr(out_tpu)
    err_cpu = backerr(out_cpu)
    err_f32 = backerr(out_f32)
    print(
        f"[bench] pschur_real p={P_CYCLE} n={N}: tpu-f64 {t_tpu:.2f}s "
        f"(ok={ok_tpu}, backerr {err_tpu:.2e}) | cpu-f64 {t_cpu:.2f}s "
        f"(ok={ok_cpu}, backerr {err_cpu:.2e}) | tpu-f32 {t_f32:.2f}s "
        f"(ok={ok_f32}, backerr {err_f32:.2e})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": f"pschur_real wall-clock p={P_CYCLE} n={N} f64 (steady, one TPU chip)",
        "value": round(t_tpu, 3),
        "unit": "s",
        "vs_baseline": round(t_cpu / t_tpu, 4),
    }))


if __name__ == "__main__":
    main()
