"""Algorithm configuration and verbosity.

The reference keeps tunables in module-level ``Ref`` cells under an
ALGO_CONFIG convention (reference: src/PeriodicSchurDecompositions.jl:285-302,
src/krylov.jl:150, src/rpschur2x2.jl:5).  Mutable globals are incompatible
with jit tracing, so here they live in a frozen dataclass that is threaded
into the jitted cores as a *static* argument; changing a flag recompiles.
"""
from __future__ import annotations

import dataclasses
import math
import os as _os


@dataclasses.dataclass(frozen=True)
class AlgoConfig:
    """Static algorithm switches for the iteration cores.

    Mirrors the reference's ALGO_CONFIG refs
    (src/PeriodicSchurDecompositions.jl:285-302):

    * ``slicot_shifts``: use SLICOT's shift computation in the real periodic
      QR core instead of the LAPACK-dlahqr-style one.
    * ``slicot_convg``: use SLICOT's (laxer) deflation criterion instead of
      the Ahues-Tisseur style test.
    * ``at_pwr16``: the Ahues-Tisseur threshold is tightened to
      ``eps^(1 + at_pwr16/16)``.
    * ``extra_rq``: enable the extra final RQ stage in subdiagonal repair
      (reference :637-652; off by default like the reference, which notes
      MB03WD force-zeroes the leftover "even when wrong").  Honored by
      BOTH real cores: exact-f64 (ops/pqr_real.py:244-259) and the ds
      production core (ops/pqr_ff.py repair branch).
    * ``eta_orth``: iterated Gram-Schmidt re-orthogonalization threshold used
      by the periodic Arnoldi process (reference: src/krylov.jl:150).
    * ``iterative_2x2``: recompute 2x2-block eigenvalues during reordering
      with the ITERATIVE complex single-shift 2x2 periodic QZ (MB03BB
      semantics, reference src/rpschur2x2.jl:9-235) instead of the default
      one-shot scaled window-block product.  The iterative scheme is the
      reference's robustness device for adversarial 2x2 cycles; the
      one-shot product is validated on graded p=20 cycles and stays the
      default.  Falls back to the one-shot value when the iteration does
      not converge.

    * ``allow_early_qr``: the reference's ``_allow_early_QR`` toggle
      (reference :301-302,768-801) — scan for two consecutive small
      subdiagonals below the window top and start the double-shift sweep
      there instead of at ``l`` (the LAPACK dlahqr early-start device that
      SLICOT carries).  OFF by default, exactly like the reference, which
      ships it disabled as "dangerous for some matrices".  Honored by both
      real cores; the sweep's first step then scales ``H1[m, m-1]`` by
      ``(1 - tau)`` (LAPACK's underflow-safe form of the reference's sign
      flip).  Ignored by the multi-bulge path (``nbulges > 1``), whose
      bulge placement assumes the window top.
    """

    slicot_shifts: bool = False
    slicot_convg: bool = False
    at_pwr16: int = 4
    extra_rq: bool = False
    allow_early_qr: bool = False
    eta_orth: float = 1.0 / math.sqrt(2.0)
    iterative_2x2: bool = False
    # Multi-bulge chase (ds TPU real core only): chase ``nbulges``
    # double-shift bulges per Pallas sweep, each trailing the previous by
    # ``bulge_gap`` columns.  The per-bulge reflector-generation chains —
    # the sweep's sequential bottleneck — run batched, so extra bulges
    # cost only slab arithmetic.  Shift pairs are the eigenvalues of the
    # trailing 2*nbulges x 2*nbulges window of the cycle product
    # (small-bulge multishift semantics, ops/smallschur.py; measured
    # jiter 76 -> 50 at p=2 n=32 nb=4 vs the disjoint-2x2 shifts that
    # reduced nothing); 1 = classic single-bulge Francis sweep (the
    # reference's scheme, src/PeriodicSchurDecompositions.jl:806-886).
    nbulges: int = 1
    bulge_gap: int = 3
    # Periodic aggressive early deflation (chunked ds real core only):
    # every ``aed_interval`` iterations the host takes the trailing
    # ``aed_window`` window of the cycle, computes its (small, f64)
    # periodic Schur form, tests the spike column beta * Zw[0][0, :], and
    # deflates every trailing eigenvalue whose spike entries are
    # negligible — converged eigenvalues are harvested WITHOUT the sweeps
    # the subdiagonal-decay test would still need (the standard
    # Braman-Byers-Mathias accelerator, periodic form after Kressner;
    # beyond the reference, which has no AED).  Runs between device
    # chunks: window analysis is host f64, the writeback transforms apply
    # on-device in ds.  All failures degrade to "no deflation".
    # DEFAULT ON (round-3 on-chip A/B after the native-backend window
    # Schur + move budget, results_r3.log 15:24): at the p=16 n=512
    # headline, aed=1 measured 12.07 s / niter 578 / backerr 1.80e-13 —
    # the accuracy, wall-clock, AND robustness winner (the spike test
    # also rescues the graded-band stagnation mode that freezes the
    # subdiagonal test; see the stagnation relaxation in ops/pqr_ff.py).
    # The earlier default-off round was measured with the jitted XLA:CPU
    # window Schur, whose ~5 s/event on a 1-vCPU host made AED 3-4x
    # slower; the native C++ analysis runs the same window in ~32 ms.
    aed: bool = True
    aed_window: int = 0   # 0 = auto: min(48, max(16, n // 10))
    # 0 = auto.  The real ds chunked core uses max(24, n // 4) (round-3
    # retune: with the ~32 ms native window analysis a denser interval
    # harvests earlier; ops/pqr_ff.py); the complex and real-generalized
    # chunked cores keep the original max(24, n // 6) — their windows are
    # costlier to analyze (native cx pQZ / jitted rg core) and their AED
    # has only been driven at n=128-class sizes so far.
    aed_interval: int = 0
    # AED engages only at n >= aed_min_n: each event costs ~0.3 s of
    # host round-trips (state pulls + writeback dispatch over the
    # tunnel), which wins big at n=512 (12.07 s vs a 64 s stall /
    # 10.6 s baseline) but LOSES at n=128 (2.63 s vs 0.77 s — round-3
    # A/B, results_r3.log 16:29).  Below the gate the stagnation
    # relaxation covers the graded-band stall class on its own.  An
    # EXPLICIT aed_window (> 0) bypasses the gate — explicit intent.
    aed_min_n: int = 192
    # Host-tail finish (all three chunked drivers: ds real, cx split, rg):
    # once the active window has shrunk to <= host_tail, ONE native
    # window Schur/pQZ (beta = 0, everything deflates) finishes the
    # remaining problem in f64 on the host and writes back through the
    # AED apply path — replacing the last ~2*host_tail small-window
    # device iterations with ~ms of host work AND making the leading
    # eigenvalues exact-f64 grade.
    # 0 = auto: min(64, n // 8) when the native backend is available
    # (never more than 1/8 of the problem — the TPU pipeline remains the
    # decomposition engine, the tail is a finisher); -1 = off.
    host_tail: int = 0
    # Max failed-block reorder moves per AED analysis.  Moving a failed
    # block to the window head costs an O(w) host ordschur swap chain
    # (~0.5 s at p=16 w=48 in scalar numpy); an adversarial window can
    # fail ~w/2 blocks and burn ~20 s host time for nothing.  The budget
    # keeps the harvested trailing run plus a few rescued blocks and
    # stops; -1 = unlimited (the classical xLAQR3 behavior).
    aed_max_moves: int = 4
    # Fused per-iteration glue kernel (ds real core only): run the scaled
    # band-product recurrence + deflation scan + Francis shift chain as
    # ONE Mosaic kernel (ops/pallas_glue.py) instead of ~hundreds of tiny
    # XLA:TPU launches — the measured per-iteration FIXED cost (12 ms at
    # p=16 n=512, ~6.2 at p=16 n=256, scaling O(p, n) not O(n^2)) is
    # launch-dominated glue, phases_p16_n512 round 4.  Band entries come
    # out in ds (2^-48, >= the emulated-f64 grade they replace); the
    # scan compares f32 hi parts (magnitude tests with ~1e-3 headroom).
    # Only honored when nbulges == 1 (the multi-bulge path keeps the
    # XLA-glue shifts).  PSD_GLUE_KERNEL=1 seeds the default (probe
    # subprocess plumbing, like PSD_GROUP_MODE).
    # EXPERIMENTAL, stays OFF: the round-4 on-chip A/B measured it
    # correct but ~1.5 s slower at the headline — the fixed cost is
    # elsewhere (BASELINE.md round-4).
    glue_kernel: bool = dataclasses.field(
        default_factory=lambda: _os.environ.get("PSD_GLUE_KERNEL",
                                                "0") == "1")
    # Kernel-B application mode of the real ds Pallas sweep
    # (ops/pallas_sweep.py module note): "step" = per-step rolled RMW,
    # "seq" = 8-step grouped slab RMW with in-register sequential applies
    # (bitwise-identical to "step", one slab read-modify-write per 8
    # steps instead of 8), "banded" = grouped with the 8 transforms
    # composed into one banded group operator (NOT bitwise — summation
    # order differs — but equally backward-stable).  The env vars
    # PSD_GROUP_MODE / PSD_GROUP_HBM seed these DEFAULTS only (probe
    # subprocess plumbing); per-call selection goes through this config.
    # default_factory: the env is read when an AlgoConfig is CONSTRUCTED
    # (so setting it after import still takes effect for new configs) —
    # note ``default_config`` below is built at import time regardless.
    sweep_mode: str = dataclasses.field(
        default_factory=lambda: _os.environ.get("PSD_GROUP_MODE", "step"))
    # allow the grouped/banded kernel-B paths when the slabs are
    # HBM-staged (headline sizes, > ~96 MiB of buffers)
    sweep_hbm_grouped: bool = dataclasses.field(
        default_factory=lambda: _os.environ.get("PSD_GROUP_HBM", "0") == "1")

    def ulp_x(self, ulp: float) -> float:
        """Tightened Ahues-Tisseur relative threshold ``eps^(1+at_pwr16/16)``."""
        return ulp ** (1.0 + self.at_pwr16 / 16.0)


default_config = AlgoConfig()

# ----------------------------------------------------------------------------
# Verbosity: host-side only (never read inside traced code).  Mirrors
# setverbosity (reference: src/diagnostics.jl:5-31) with keyed channels.
_VERBOSITY = {
    "main": 0,
    "krylov": 0,
    "sylswap": 0,
    "rordschur": 0,
    "r2x2": 0,
}


def setverbosity(level: int, key: str = "main") -> None:
    """Set diagnostic verbosity for a subsystem.

    Keys: ``main`` (iteration cores), ``krylov``, ``sylswap``, ``rordschur``,
    ``r2x2``.  Levels: 0 silent, 1 progress, 2 chatty, 3+ matrix dumps.
    """
    if key not in _VERBOSITY:
        raise ValueError(f"unknown verbosity key {key!r}; known: {sorted(_VERBOSITY)}")
    _VERBOSITY[key] = int(level)


def verbosity(key: str = "main") -> int:
    return _VERBOSITY[key]
