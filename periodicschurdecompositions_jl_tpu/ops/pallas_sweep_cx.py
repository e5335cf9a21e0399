"""Pallas TPU kernels for the ds split-complex single-shift QZ sweep.

STATUS: design scaffold (not yet wired into pqz_complex_ff).  The
XLA-glue sweep of `pqz_complex_ff.act_sweep` traces ~30 slab-op
dispatches per (step, factor) into one giant while-body HLO; at p >= 6
the axon REMOTE compile of that graph wedges the worker for 20+ minutes
(three reproducible hangs recorded in BASELINE.md, driver round 2).
Fusing the sweep into Pallas kernels — exactly the real core's
ops/pallas_sweep.py split — both fixes the compile blowup (tiny XLA
graph + one Mosaic kernel) and removes the ~us-level per-dispatch cost.

## Kernel split (mirrors ops/pallas_sweep.py; reference
## /root/reference/src/generalized.jl:806-852)

Working value = CXF: 4 f32 slabs (re.hi, re.lo, im.hi, im.lo).

* kernel A ("sweep"): walks k = ifirst..ilast-1 once over a VMEM working
  copy C (p, N, N) x4.  Per step:
    - factor 0: regenerate the chase Givens (c, s) from C[0][k:k+2, k-1]
      (k > ifirst; at k == ifirst the shift rotation arrives via SMEM
      like v0 in the real kernel), force the (r, 0) column, apply
      lmat(c, s) to C[0] rows k:k+2 (band lanes suffice: only lanes
      k-1..k+7 are ever read downstream, same argument as the real
      kernel's _band_col_apply), log L[0, k] = (c, s).
    - ring l = p-1..1, carrying (c, s):
        S[l] == + : right-apply rmat_adj(c, s) to C[l] cols k:k+2 (band
          rows), REGEN (cn, sn) from the updated C[l][k:k+2, k], apply
          lmat(cn, sn) to C[l] rows k:k+2, log R[l, k] = (c, s),
          L[l, k] = (cn, sn); carry (cn, sn).
        S[l] == - : left-apply lmat(c, s) to C[l] rows k:k+2, REGEN
          (cn, sn) from row k+1 cols k:k+2 (leftward annihilation),
          right-apply lmat(cn, sn) to C[l] cols k:k+2, log
          L[l, k] = (c, s), R[l, k] = (cn, sn); carry (cn, -sn).
      (S is static per trace — the branch unrolls per factor without
      lax.cond, exactly like the real kernel unrolls p.)
    - close: log R[0, k] = final ring (c, s) (applied to C[0] band cols
      k:k+2 to keep the working copy true).
    - register-carry: each regen input (2-element column/row fragment)
      is extracted from the in-register accumulators of the band apply
      that last wrote it and threaded through the loop carries as
      scalar FFs (see ops/pallas_sweep.py), so the sequential chain
      never waits on slab traffic.
  Exceptional-shift randomness: the (iiter % 10) replacement rotation is
  computed in the GLUE (jax.random) and shipped via SMEM with the shift.

* kernel B0: apply logged L[l, k] chains to H[l] rows k:k+2, batched
  over l, lanes k.. (the left updates' lo=k device); lane bound rhi for
  want_t=False.

* kernel B: apply logged R chains on the TRANSPOSED storage: H^T[l]
  receives R[l] on rows k:k+2 (columns of H[l], hi=k+2 triangular
  band + clo want_t device), Z^T[l] receives rmat_adj of the same
  factor's post-update rotation (the XLA core's zup(l) uses the carried
  (c, s) AFTER the factor's regen — i.e. R[(l+1) mod p]'s generator for
  pos factors; log Z-rotations separately as ZR[l, k] to keep the
  mapping exact).

Logs: (p, N, 24) f32 — per (factor, step) two rotations x (c, s) x
(re, im) x (hi, lo) = 16 plus the 8-entry Z rotation; load like
ops/pallas_sweep._load_logs.

## Deferred-application exactness

Identical commuting argument to the real sweep: per step the left
rotation of factor l touches rows k:k+2 only, the right rotation
columns k:k+2 only; successive steps shift by one column, and the
bulge-major/global-product reorganization H_final = Lc @ H0 @ Rc holds
regardless of interleaving.  Structural zeros re-emerge to ds roundoff
and are scrubbed by the wrapper's triu masks (same as chase_sweep_ff).

## Givens generation chain (cxff)

givens_cxff is ~2x the real reflector chain per element but there is
only ONE rotation per (step, factor) instead of a 3x3 + 2x2 reflector
pair, so the sequential chain is comparable to the real kernel's.

Implementation order (next round):
1. kernel A + wrapper `qz_sweep_cxff(H, ZT, ifirst, ilast, c0, s0)`
   with interpret-mode bitwise test against act_sweep's fori body on
   small (p, n) (tests/test_pallas_cx.py).
2. kernels B0/B (straight ports of the real B0/B with 2x2 complex
   rotations and the CXF 4-slab layout).
3. wire into pqz_complex_core_ff behind cfg flag `pallas_cx_sweep`
   (default on off-CPU), re-record BASELINE config 3 on-chip.
"""
from __future__ import annotations

# Implementation lands next round; this module intentionally exports
# nothing yet (the design above is the reviewed contract).
