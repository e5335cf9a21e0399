"""Lane-sharded double-shift sweep: multi-device execution of the dense core.

Implements the design of docs/scaling.md §"N-large dense-core design": the
bulge-chase sweep's three stages split over a ``('lanes',)`` mesh axis —

* **generation** (kernel A) is sequential in the chase step and runs
  REPLICATED: every device executes the same fused Pallas generation kernel
  on the full H and owns the identical (p, N, 18) transform log R0 (a
  broadcast by construction; the segmented narrow-C variant that drops the
  replicated input to a 384-lane strip is the follow-on optimization);
* **left application** (kernel B0 semantics) updates rows k..k+2 of H with
  F^T — every LANE (column of H) is independent, so each device applies the
  log to its own lane shard with zero communication;
* **right application** (kernel B semantics) updates the transposed H^T and
  Z^T the same way — lanes there are H's ROWS / Z's rows, again
  independent.  The reshard between the two layouts (H cols-sharded ->
  H^T cols-sharded) is the transpose the single-device sweep already
  performs; under ``jit`` over the mesh XLA lowers it to an all-to-all.

Per sweep the communication is: one all-gather of H for the replicated
generation + two all-to-alls for the transposes + the R0 log (broadcast,
tiny).  The applications — the measured 74% of device time
(BASELINE.md round-2 kernel decomposition) — scale 1/D with zero traffic.

The application arithmetic mirrors ops/pallas_sweep.py's kernels
element-for-element (same fused-F 3-term accumulation, same window-head
boundary-column restore, same hi_lane row bound), so the sharded sweep is
numerically EQUIVALENT to the single-device "step"-mode sweep: the ds
contract carries over unchanged (tests/test_parallel_sweep.py asserts
agreement at ds grade on the virtual 8-device CPU mesh).

The reference has no parallelism of any kind (SURVEY §2 checklist); this
is green-field TPU design for the hot loop of
/root/reference/src/PeriodicSchurDecompositions.jl:806-886.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 moved shard_map out of experimental
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover - newer jax
    from jax.sharding import shard_map

from ..ops import ff
from ..ops.ff import FF
from ..ops.pallas_sweep import _sweep_call


def _apply_logs_local(hi, lo, R0, m, i, lane0, *, p, roll, bound_lanes,
                      keep_head):
    """Apply the (p, N, 18) step-transform log to a local lane shard.

    Mirrors ops/pallas_sweep.py kernel B0/B semantics exactly: per step
    kk in [m, i), rows kk..kk+2 of every factor get out_r = sum_s
    F[s, r] * row_s (the transposed fused transform, flat element (s, r)
    at 3*s + r), with

    * ``roll``: target factor g uses source factor (g+1) mod p's log
      (kernel B's H^T wiring — the chase updates H[f-1]'s columns with
      factor f's transforms);
    * ``bound_lanes``: only GLOBAL lanes <= i updated (kernel B's H^T row
      bound, reference src/PeriodicSchurDecompositions.jl:844-883);
    * ``keep_head``: factor 0's global lane m-1 keeps its input at step
      kk == m (kernel B0's window-head boundary-column restore).

    ``lane0``: this shard's global lane offset.
    """
    L = hi.shape[-1]
    lane_g = lane0 + lax.iota(jnp.int32, L)
    if roll:
        R0 = jnp.concatenate([R0[1:], R0[:1]], axis=0)

    def step(kk, HH):
        hi, lo = HH
        v = lax.dynamic_slice(R0, (jnp.int32(0), kk, jnp.int32(0)),
                              (p, 1, 18))[:, 0, :]
        Mhi, Mlo = v[:, :9], v[:, 9:]
        rhs = lax.dynamic_slice(hi, (jnp.int32(0), kk, jnp.int32(0)),
                                (p, 3, L))
        rls = lax.dynamic_slice(lo, (jnp.int32(0), kk, jnp.int32(0)),
                                (p, 3, L))
        rs = [FF(rhs[:, t, :], rls[:, t, :]) for t in range(3)]
        outs = []
        for r in range(3):  # out_r = sum_s F[s, r] rows[s]  (F^T @)
            q0 = r
            acc = ff.mul(FF(Mhi[:, q0:q0 + 1], Mlo[:, q0:q0 + 1]), rs[0])
            for s in (1, 2):
                q = s * 3 + r
                acc = ff.add(acc, ff.mul(
                    FF(Mhi[:, q:q + 1], Mlo[:, q:q + 1]), rs[s]))
            outs.append(acc)
        if bound_lanes:
            msk = lane_g[None, :] <= i
            outs = [FF(jnp.where(msk, o.hi, r0.hi),
                       jnp.where(msk, o.lo, r0.lo))
                    for o, r0 in zip(outs, rs)]
        if keep_head:
            fct = lax.broadcasted_iota(jnp.int32, (p, L), 0)
            keep = (lane_g[None, :] == kk - 1) & (kk == m) & (fct == 0)
            outs = [FF(jnp.where(keep, r0.hi, o.hi),
                       jnp.where(keep, r0.lo, o.lo))
                    for o, r0 in zip(outs, rs)]
        nh = jnp.stack([o.hi for o in outs], axis=1)
        nl = jnp.stack([o.lo for o in outs], axis=1)
        hi = lax.dynamic_update_slice(hi, nh, (jnp.int32(0), kk,
                                               jnp.int32(0)))
        lo = lax.dynamic_update_slice(lo, nl, (jnp.int32(0), kk,
                                               jnp.int32(0)))
        return hi, lo

    return lax.fori_loop(m, i, step, (hi, lo))


def chase_sweep_ff_sharded(H: FF, ZT: Optional[FF], m, i, v0: FF, *,
                           mesh: Mesh, axis_name: str = "lanes",
                           want_z: bool = True, interpret: bool = False):
    """One double-shift QR sweep with lane-sharded applications.

    Same contract as ops/pallas_sweep.chase_sweep_ff (window [m, i],
    normalized first column v0, structural zeros enforced on output); the
    H / ZT arrays may carry any sharding — the function constrains the
    application stages to ``P(None, None, axis_name)`` layouts and the
    generation stage to replicated.
    """
    p, N, _ = H.hi.shape
    nd = mesh.shape[axis_name]
    assert N % nd == 0, (
        f"the '{axis_name}' mesh axis ({nd}) must divide the lane count "
        f"{N}; pad the cycle (the cores ghost-pad to N = n + 1 already)")
    L = N // nd
    scal = jnp.stack([jnp.asarray(m, jnp.int32), jnp.asarray(i, jnp.int32),
                      jnp.int32(1)])
    v0f = jnp.concatenate([v0.hi, v0.lo]).astype(jnp.float32)

    repl = jax.sharding.NamedSharding(mesh, P())
    lanes3 = jax.sharding.NamedSharding(mesh, P(None, None, axis_name))

    # ---- generation: replicated kernel A, every device owns R0 ---------
    def _gen(scal, v0f, hi, lo):
        with ff.no_barriers():
            (R0,) = _sweep_call(p, N, interpret)(scal, v0f, hi, lo)
        return R0

    gen = shard_map(_gen, mesh=mesh, in_specs=(P(), P(), P(), P()),
                    out_specs=P(), check_rep=False)
    Hhi_r = lax.with_sharding_constraint(H.hi, repl)
    Hlo_r = lax.with_sharding_constraint(H.lo, repl)
    R0 = gen(scal, v0f, Hhi_r, Hlo_r)

    # ---- left application: H lane-sharded on its columns ---------------
    def _left(hi, lo, R0, mm, ii):
        lane0 = lax.axis_index(axis_name) * L
        return _apply_logs_local(hi, lo, R0, mm, ii, lane0, p=p,
                                 roll=False, bound_lanes=False,
                                 keep_head=True)

    left = shard_map(
        _left, mesh=mesh,
        in_specs=(P(None, None, axis_name), P(None, None, axis_name),
                  P(), P(), P()),
        out_specs=(P(None, None, axis_name),) * 2, check_rep=False)
    Hhi = lax.with_sharding_constraint(H.hi, lanes3)
    Hlo = lax.with_sharding_constraint(H.lo, lanes3)
    mi = jnp.asarray(m, jnp.int32)
    ii = jnp.asarray(i, jnp.int32)
    Hhi, Hlo = left(Hhi, Hlo, R0, mi, ii)

    # ---- right application: transposed layouts, lanes = H rows ---------
    HThi = lax.with_sharding_constraint(jnp.swapaxes(Hhi, 1, 2), lanes3)
    HTlo = lax.with_sharding_constraint(jnp.swapaxes(Hlo, 1, 2), lanes3)

    def _right_h(hi, lo, R0, mm, ii):
        lane0 = lax.axis_index(axis_name) * L
        return _apply_logs_local(hi, lo, R0, mm, ii, lane0, p=p,
                                 roll=True, bound_lanes=True,
                                 keep_head=False)

    right_h = shard_map(
        _right_h, mesh=mesh,
        in_specs=(P(None, None, axis_name), P(None, None, axis_name),
                  P(), P(), P()),
        out_specs=(P(None, None, axis_name),) * 2, check_rep=False)
    HThi, HTlo = right_h(HThi, HTlo, R0, mi, ii)

    if want_z:
        def _right_z(hi, lo, R0, mm, ii):
            lane0 = lax.axis_index(axis_name) * L
            return _apply_logs_local(hi, lo, R0, mm, ii, lane0, p=p,
                                     roll=False, bound_lanes=False,
                                     keep_head=False)

        right_z = shard_map(
            _right_z, mesh=mesh,
            in_specs=(P(None, None, axis_name), P(None, None, axis_name),
                      P(), P(), P()),
            out_specs=(P(None, None, axis_name),) * 2, check_rep=False)
        ZThi = lax.with_sharding_constraint(ZT.hi, lanes3)
        ZTlo = lax.with_sharding_constraint(ZT.lo, lanes3)
        ZThi, ZTlo = right_z(ZThi, ZTlo, R0, mi, ii)
        ZT = FF(ZThi, ZTlo)

    H = FF(jnp.swapaxes(HThi, 1, 2), jnp.swapaxes(HTlo, 1, 2))

    # structural enforcement (identical to chase_sweep_ff's wrapper)
    h0 = FF(jnp.triu(H.hi[0], -1), jnp.triu(H.lo[0], -1))
    if p > 1:
        rest = FF(jnp.triu(H.hi[1:]), jnp.triu(H.lo[1:]))
        H = FF(jnp.concatenate([h0.hi[None], rest.hi]),
               jnp.concatenate([h0.lo[None], rest.lo]))
    else:
        H = FF(h0.hi[None], h0.lo[None])
    return H, ZT


@dataclasses.dataclass(frozen=True)
class ShardedSweep:
    """Hashable sweep implementation for `pqr_real_core_ff(sweep_fn=...)`.

    Routes every sweep of the ds real core through
    :func:`chase_sweep_ff_sharded` over ``mesh``'s ``axis_name`` axis —
    the multi-device dense path.  The object is a static jit argument
    (Mesh is hashable), so each (mesh, axis) combination compiles once.
    """

    mesh: Mesh
    axis_name: str = "lanes"

    def __call__(self, H, ZT, m, i, v0, *, want_z, interpret=False,
                 mode=None, hbm_grouped=None):
        # mode/hbm_grouped are the single-device kernel-B knobs; the
        # sharded path has one application strategy
        return chase_sweep_ff_sharded(H, ZT, m, i, v0, mesh=self.mesh,
                                      axis_name=self.axis_name,
                                      want_z=want_z, interpret=interpret)


def pschur_real_sharded(A, mesh: Mesh, axis_name: str = "lanes",
                        want_z: bool = True, maxitfac: int = 30,
                        interpret: bool = False, chunked: bool = False,
                        cfg=None):
    """Full real periodic Schur pipeline with the lane-sharded dense core.

    Multi-device entry point for one LARGE problem: reduction on the
    default layout, then the ds iteration with every sweep's applications
    sharded over ``mesh``'s ``axis_name`` axis (see module docstring).

    Args:
      A: (p, n, n) real cycle; the ghost-padded lane count n + 1 must be
        divisible by the mesh axis size.
      chunked: use the resumable host-chunked driver (required on the
        axon TPU, whose worker kills ~60 s executes).

    Returns (T, Z, w, ok): quasi-triangular stack, orthogonal factors
    with Z[l].T @ A[l] @ Z[(l+1)%p] = T[l], complex eigenvalues.
    """
    import numpy as np

    from ..ops import ff
    from ..ops.hessenberg_ff import phessenberg_core_ff
    from ..ops.pqr_ff import pqr_real_core_ff, pqr_real_core_ff_chunked

    Af = ff.from_f64(jnp.asarray(A))
    Hh, Hl, Qh, Ql = phessenberg_core_ff(Af.hi, Af.lo, want_q=want_z)
    sweep = ShardedSweep(mesh, axis_name)
    if chunked:
        out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=want_z,
                                       maxitfac=maxitfac,
                                       interpret=interpret, sweep_fn=sweep,
                                       **({"cfg": cfg} if cfg else {}))
    else:
        out = pqr_real_core_ff(Hh, Hl, Qh, Ql, want_z=want_z,
                               maxitfac=maxitfac, interpret=interpret,
                               sweep_fn=sweep,
                               **({"cfg": cfg} if cfg else {}))
    (Th, Tl, Zh, Zl, wrh, wrl, wih, wil, ok) = out
    T = np.asarray(Th, np.float64) + np.asarray(Tl, np.float64)
    Z = None
    if want_z:
        Z = np.swapaxes(np.asarray(Zh, np.float64)
                        + np.asarray(Zl, np.float64), 1, 2)
    wr = np.asarray(wrh, np.float64) + np.asarray(wrl, np.float64)
    wi = np.asarray(wih, np.float64) + np.asarray(wil, np.float64)
    return T, Z, wr + 1j * wi, bool(ok)
