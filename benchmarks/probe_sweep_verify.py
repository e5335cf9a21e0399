"""Verify ONE chase sweep's numerical invariants ON THE CHIP.

The sweeptime probes only time; this one checks that the on-chip Mosaic
compilation of the sweep kernels (per-step / grouped / banded x
VMEM-resident / HBM-staged, selected via PSD_GROUP_MODE / PSD_GROUP_HBM
and the size) produces a numerically correct sweep:
  - Z-chain orthogonality,
  - reconstruction H0[l] = Z[l] H'[l] Z[l+1]^T,
  - Hessenberg/triangular structure (exact zeros),
for the full window, for an interior window [m, i] (the keep-lane
boundary-restore paths), and for an UNALIGNED interior window
(m & 7 != 0 — the rolled-slab in-block offset and first-group
inactive-step masks at a non-8-aligned window head).

Usage: python benchmarks/probe_sweep_verify.py [p] [n]
"""
import os
import sys
import time

import numpy as np

p = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 256

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.ff import FF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import pallas_sweep as ps  # noqa

tpu = jax.devices()[0]
N = n + 1 if n + 1 <= 128 else ((n + 16 + 7) // 8) * 8
rng = np.random.default_rng(7)
print(f"[sweepverify] p={p} n={n} N={N} mode={ps._GROUP_MODE} "
      f"hbm_flag={ps._GROUP_HBM}", flush=True)


def mk(m=None, i=None):
    A = rng.standard_normal((p, n, n))
    A[0] = np.triu(A[0], -1)
    A[1:] = np.triu(A[1:])
    if m is not None and m > 0:
        A[0][m, m - 1] = 0.0
    if i is not None and i + 1 < n:
        A[0][i + 1, i] = 0.0
    H = np.zeros((p, N, N), np.float32)
    H[:, :n, :n] = A.astype(np.float32)
    Hlo = np.zeros((p, N, N), np.float32)
    Hlo[:, :n, :n] = (A - H[:, :n, :n].astype(np.float64)).astype(np.float32)
    Z = np.zeros((p, N, N), np.float32)
    Z[:, :n, :n] = np.eye(n, dtype=np.float32)
    zl = np.zeros((p, N, N), np.float32)
    return (FF(jax.device_put(jnp.asarray(H), tpu),
               jax.device_put(jnp.asarray(Hlo), tpu)),
            FF(jax.device_put(jnp.asarray(Z), tpu),
               jax.device_put(jnp.asarray(zl), tpu)))


v = np.array([0.6, 0.5, 0.3])
v0 = ff.from_f64(jnp.asarray(v / np.abs(v).sum()))


def check(tag, m, i):
    H, ZT = mk(m=m, i=i)
    H0 = np.asarray(H.hi, np.float64) + np.asarray(H.lo, np.float64)
    t0 = time.time()
    Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(m), jnp.int32(i), v0,
                                want_z=True)
    Hd = np.asarray(Hn.hi, np.float64) + np.asarray(Hn.lo, np.float64)
    Zd = np.asarray(ZTn.hi, np.float64) + np.asarray(ZTn.lo, np.float64)
    dt = time.time() - t0
    orth = max(np.abs(Zd[l][:n, :n] @ Zd[l][:n, :n].T - np.eye(n)).max()
               for l in range(p))
    rec = 0.0
    scale = np.abs(H0).max()
    for l in range(p):
        Zl = Zd[l][:n, :n].T
        Zn_ = Zd[(l + 1) % p][:n, :n].T
        rec = max(rec, np.abs(Zl.T @ H0[l][:n, :n] @ Zn_
                              - Hd[l][:n, :n]).max() / scale)
    sub0 = np.abs(np.tril(Hd[0][:n, :n], -2)).max()
    subt = max((np.abs(np.tril(Hd[l][:n, :n], -1)).max()
                for l in range(1, p)), default=0.0)
    ok = orth < 1e-11 and rec < 1e-11 and sub0 == 0.0 and subt == 0.0
    print(f"[sweepverify] {tag}: {'OK' if ok else 'BAD'} "
          f"orth={orth:.3e} rec={rec:.3e} sub0={sub0:.3e} "
          f"subt={subt:.3e} ({dt:.1f}s incl. fetch)", flush=True)
    return ok


ok1 = check("full-window", 0, n - 1)
ok2 = check("interior-window", 24, n - 24)
# unaligned m (m & 7 != 0): exercises the rolled-slab in-block offset and
# the first-group inactive-step masks at a non-multiple-of-8 window head
ok3 = check("unaligned-window", 27, n - 21)


def check_jit2(tag, m, i):
    """TWO chained sweeps inside ONE jitted program.

    The full pipeline calls the sweep inside a jitted while-loop body,
    where XLA manages buffer reuse across the pallas_calls; the seq+HBM
    headline failed with ORTHOGONAL Z but H/Z INCONSISTENT (backerr
    3.5e-1, orth 2.1e-13, results_r3.log 14:58) while the standalone
    single-sweep checks above pass — the discriminating hypothesis is an
    XLA buffer-aliasing interaction (pltpu.ANY inputs + kernel outputs)
    that only materializes when sweeps chain inside one program."""
    H, ZT = mk(m=m, i=i)
    H0 = np.asarray(H.hi, np.float64) + np.asarray(H.lo, np.float64)

    @jax.jit
    def two(Hh, Hl, Zh, Zl):
        Hx, Zx = ps.chase_sweep_ff(FF(Hh, Hl), FF(Zh, Zl), jnp.int32(m),
                                   jnp.int32(i), v0, want_z=True)
        Hy, Zy = ps.chase_sweep_ff(Hx, Zx, jnp.int32(m), jnp.int32(i), v0,
                                   want_z=True)
        return Hy.hi, Hy.lo, Zy.hi, Zy.lo

    t0 = time.time()
    Hh, Hl, Zh, Zl = two(H.hi, H.lo, ZT.hi, ZT.lo)
    Hd = np.asarray(Hh, np.float64) + np.asarray(Hl, np.float64)
    Zd = np.asarray(Zh, np.float64) + np.asarray(Zl, np.float64)
    dt = time.time() - t0
    orth = max(np.abs(Zd[l][:n, :n] @ Zd[l][:n, :n].T - np.eye(n)).max()
               for l in range(p))
    rec = 0.0
    scale = np.abs(H0).max()
    for l in range(p):
        Zl_ = Zd[l][:n, :n].T
        Zn_ = Zd[(l + 1) % p][:n, :n].T
        rec = max(rec, np.abs(Zl_.T @ H0[l][:n, :n] @ Zn_
                              - Hd[l][:n, :n]).max() / scale)
    ok = orth < 1e-11 and rec < 1e-11
    print(f"[sweepverify] {tag}: {'OK' if ok else 'BAD'} "
          f"orth={orth:.3e} rec={rec:.3e} ({dt:.1f}s incl. compile+fetch)",
          flush=True)
    return ok


ok4 = check_jit2("jit2-chained", 0, n - 1)
sys.exit(0 if (ok1 and ok2 and ok3 and ok4) else 1)
