"""A/B the fused Pallas reduction kernel vs the XLA-glue reduction ON chip.

VERDICT r4 #4: the reduction phase is 1.86 s of un-fused XLA glue at the
p=16 n=512 headline; the fused kernel (ops/pallas_hess.py) must take it
under 1.0 s with reconstruction intact.

Usage: python benchmarks/probe_hesskernel.py [p] [n]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import (  # noqa
    phessenberg_core_ff)

dev = jax.devices()[0]
print(f"[hesskern] device {dev} p={p} n={n}", flush=True)


def run(tag, use_kernel, check=False):
    try:
        for rep in range(3):
            rng = np.random.default_rng(100 + rep)  # fresh content per rep
            A = rng.standard_normal((p, n, n))
            Af = ff.from_f64(jnp.asarray(A))
            hi = jax.device_put(Af.hi, dev)
            lo = jax.device_put(Af.lo, dev)
            t0 = time.time()
            Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=True,
                                                 use_kernel=use_kernel)
            float(np.asarray(Hh[0, 0, 0]))  # sync (tiny transfer)
            dt = time.time() - t0
            print(f"[hesskern] {tag} rep{rep}: {dt:.2f}s", flush=True)
            if check and rep == 2:
                H = np.asarray(Hh, np.float64) + np.asarray(Hl, np.float64)
                QT = np.asarray(Qh, np.float64) + np.asarray(Ql, np.float64)
                worst = 0.0
                for j in range(p):
                    Qj = QT[j].T
                    Qj1 = QT[(j + 1) % p].T
                    r = np.abs(Qj @ H[j] @ Qj1.T - A[j]).max() / max(
                        1, np.abs(A[j]).max())
                    worst = max(worst, r)
                orth = max(np.abs(QT[j] @ QT[j].T - np.eye(n)).max()
                           for j in range(p))
                print(f"[hesskern] {tag} recon {worst:.2e} orth {orth:.2e}",
                      flush=True)
    except Exception as e:
        print(f"[hesskern] {tag}: FAIL {type(e).__name__}: {e}", flush=True)
        return False
    return True


ok = run("glue", False)
ok &= run("kernel", True, check=True)
print("[hesskern] done", flush=True)
sys.exit(0 if ok else 1)  # the chip queue keys retry/done on the rc
