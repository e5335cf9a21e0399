"""Kernel-level decomposition of the cx and rg sweep cost ON the chip.

VERDICT r4 #3: the split-complex (cx) and real-generalized (rg) ds cores
run ~20x slower per element than the real ds core at matched (p, n) with
no profiling breakdown.  This probe times, for each of the three fused
Pallas kernels (A generation / B0 left apply / B right apply + Z) AND the
full wrapper (pads + transposes + scrub glue included):

    marginal per-call cost = (t(K2) - t(K1)) / (K2 - K1)

with the kernel iterated inside ONE jitted lax.fori_loop (traced trip
count -> one compile per kernel; no per-call host readback, unlike
probe_kernels.py's eager method).  Both a full window and an 11-step
window run through the same executable (window bounds are traced).

Usage: python benchmarks/probe_cxrg_kernels.py [p] [n]
"""
import os
import sys
import time

import numpy as np

INTERP = os.environ.get("PSD_CXRG_INTERPRET", "") == "1"  # CPU smoke mode

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

p = int(sys.argv[1]) if len(sys.argv) > 1 else 6
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

from periodicschurdecompositions_jl_tpu.ops import ff  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.ff import FF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops.cxff import CXF  # noqa: E402
from periodicschurdecompositions_jl_tpu.ops import (  # noqa: E402
    pallas_sweep_cx as pcx, pallas_sweep_rg as prg)

dev = jax.devices()[0]
N = n + 1 if n + 1 <= 128 else ((n + 16 + 7) // 8) * 8
S = tuple(l % 2 == 0 for l in range(p))
print(f"[cxrg] device {dev} p={p} n={n} N={N} S=alternating", flush=True)

rng = np.random.default_rng(0)
K1, K2 = 4, 16


def fresh(seed, ncomp):
    r = np.random.default_rng(seed)
    comps = []
    for _ in range(ncomp):
        A = r.standard_normal((p, n, n))
        A[0] = np.triu(A[0], -1)
        A[1:] = np.triu(A[1:])
        C = np.zeros((p, N, N), np.float32)
        C[:, :n, :n] = A.astype(np.float32)
        comps.append(jax.device_put(jnp.asarray(C), dev))
    return comps


def marginal(fn, seed0, ncomp):
    """fn(comps, K) -> scalar; time K1 vs K2 on two seeds."""
    fn = jax.jit(fn)
    t0 = time.time()
    np.asarray(fn(fresh(seed0, ncomp), jnp.int32(2)))
    warm = time.time() - t0
    pers = []
    for s in (seed0 + 1, seed0 + 2):
        comps = fresh(s, ncomp)
        t0 = time.time()
        np.asarray(fn(comps, jnp.int32(K1)))
        t1 = time.time() - t0
        comps = fresh(s + 100, ncomp)
        t0 = time.time()
        np.asarray(fn(comps, jnp.int32(K2)))
        t2 = time.time() - t0
        pers.append((t2 - t1) / (K2 - K1) * 1e3)
    return pers, warm


def report(tag, pers, warm):
    print(f"[cxrg] {tag}: {pers[0]:.2f} / {pers[1]:.2f} ms/call "
          f"(compile+warm {warm:.0f}s)", flush=True)


def run_family(fam):
    if fam == "cx":
        nc = 4
        callA = pcx._qz_sweep_call(p, N, S, INTERP)
        callB0 = pcx._qz_left_call(p, N, INTERP)
        callB = pcx._qz_apply_call(p, N, True, INTERP)
        cs0 = jnp.asarray([0.8, 0.0, 0.5, 0.0, 0.33, 0.0], jnp.float32)
        nsm = 2
    else:
        nc = 2
        callA = prg._rg_sweep_call(p, N, S, INTERP)
        callB0 = prg._rg_left_call(p, N, INTERP)
        callB = prg._rg_apply_call(p, N, True, INTERP)
        cs0 = None
        nsm = 2

    for wtag, ival in (("full", n - 1), ("11step", 11)):
        scal = jnp.stack([jnp.int32(1), jnp.int32(ival)])

        def fnA(comps, K):
            def body(t, comps):
                with ff.no_barriers():
                    if fam == "cx":
                        (R0,) = callA(scal, cs0, *comps)
                    else:
                        (R0,) = callA(scal, *comps)
                # consume R0 so the loop body cannot be hoisted
                c0 = comps[0].at[0, 0, 0].add(R0[0, 0, 0] * 1e-30)
                return [c0] + list(comps[1:])
            comps = lax.fori_loop(0, K, body, list(comps))
            return comps[0][0, 0, 1]

        def fnB0(comps, K):
            with ff.no_barriers():
                if fam == "cx":
                    (R0,) = callA(scal, cs0, *comps)
                else:
                    (R0,) = callA(scal, *comps)

            def body(t, comps):
                with ff.no_barriers():
                    outs = callB0(scal, *comps, R0)
                return list(outs)
            comps = lax.fori_loop(0, K, body, list(comps))
            return comps[0][0, 0, 1]

        def fnB(comps, K):
            hs, zs = comps[:nc], comps[nc:]
            with ff.no_barriers():
                if fam == "cx":
                    (R0,) = callA(scal, cs0, *hs)
                else:
                    (R0,) = callA(scal, *hs)

            def body(t, comps):
                with ff.no_barriers():
                    outs = callB(scal, *comps, R0)
                return list(outs)
            comps = lax.fori_loop(0, K, body, list(comps))
            return comps[0][0, 0, 1]

        def fnFull(comps, K):
            if fam == "cx":
                H = CXF(FF(comps[0][:, :n, :n], comps[1][:, :n, :n]),
                        FF(comps[2][:, :n, :n], comps[3][:, :n, :n]))
                Z = CXF(FF(comps[4][:, :n, :n], comps[5][:, :n, :n]),
                        FF(comps[6][:, :n, :n], comps[7][:, :n, :n]))
                c0 = ff.ff(jnp.float32(0.8))
                s0 = CXF(ff.ff(jnp.float32(0.5)), ff.ff(jnp.float32(0.33)))

                def body(t, HZ):
                    H, Z = HZ
                    return pcx.qz_sweep_cxff(H, Z, jnp.int32(1), scal[1],
                                             c0, s0, S=S, want_z=True,
                                             interpret=INTERP)
                H, Z = lax.fori_loop(0, K, body, (H, Z))
                return H.re.hi[0, 0, 1]
            H = FF(comps[0][:, :n, :n], comps[1][:, :n, :n])
            Z = FF(comps[2][:, :n, :n], comps[3][:, :n, :n])

            def body(t, HZ):
                H, Z = HZ
                return prg.rg_chase_sweep_ff(H, Z, jnp.int32(1), scal[1],
                                             S=S, want_z=True,
                                             interpret=INTERP)
            H, Z = lax.fori_loop(0, K, body, (H, Z))
            return H.hi[0, 0, 1]

        for tag, fn, ncomp in ((f"{fam} A {wtag}", fnA, nc),
                               (f"{fam} B0 {wtag}", fnB0, nc),
                               (f"{fam} B {wtag}", fnB, 2 * nc),
                               (f"{fam} full {wtag}", fnFull, 2 * nc)):
            try:
                pers, warm = marginal(fn, hash(tag) % 1000, ncomp)
                report(tag, pers, warm)
            except Exception as e:
                print(f"[cxrg] {tag}: FAIL {type(e).__name__}: {e}",
                      flush=True)


run_family("cx")
run_family("rg")
print("[cxrg] done", flush=True)
