"""Multi-device execution: batch-sharded decompositions over a Mesh.

The reference has no parallelism (SURVEY.md §2 checklist); these are
green-field TPU components.  The natural parallel axes for periodic Schur
workloads are:

* ``batch``: independent problems (parameter sweeps, ensembles of cycles) —
  pure data parallelism via vmap + NamedSharding; zero communication.
* ``cycle``: the p factors form a ring; operator application pipelines
  around it with ``ppermute`` (see :mod:`.ring`).

Dense QR/QZ iterations are sequential in their critical path, so intra-chip
batching (vmap) plus cross-chip problem sharding is the high-throughput
configuration; the ring layer accelerates the Krylov (matvec-dominated) path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, names=("batch",),
              shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a device mesh (defaults to 1-D over all available devices)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # fall back to the (virtual) CPU backend: the axon TPU plugin makes
        # itself the default even when JAX_PLATFORMS=cpu requests host devices
        devs = jax.devices("cpu")
    if n_devices is not None:
        devs = devs[:n_devices]
    if n_devices is not None and len(devs) < n_devices:
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    if shape is None:
        shape = (len(devs),) + (1,) * (len(names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, names)


def batched_pschur_real(A_batch: jax.Array, mesh: Optional[Mesh] = None,
                        axis: str = "batch", want_z: bool = True,
                        maxitfac: int = 30):
    """Batched real periodic Schur: A_batch (B, p, n, n) -> stacked results.

    Each batch lane runs the full jitted QR core; lanes deflate
    independently (the cores' loop bodies freeze converged lanes, so a
    batched while_loop is exact).  With a mesh, lanes shard over ``axis``
    and run embarrassingly parallel across devices.

    Caveat (measured): on the TPU itself, per-lane index divergence turns
    the cores' dynamic slices into gathers, making an in-device vmapped
    batch far slower than sequential runs — use one lane per DEVICE (batch
    size == mesh size), or run problems back-to-back on one chip.

    Returns (T, Z, wr, wi, ok) with a leading batch axis.
    """
    from ..ops.pqr_real import pqr_real_core
    from ..ops.hessenberg import phessenberg_core

    def one(A):
        H, Q = phessenberg_core(A, want_q=want_z)
        return pqr_real_core(H, Z=Q, want_z=want_z, maxitfac=maxitfac)

    fn = jax.vmap(one)
    if mesh is not None:
        spec = NamedSharding(mesh, P(axis))
        A_batch = jax.device_put(A_batch, spec)
        fn = jax.jit(fn, in_shardings=(spec,))
    else:
        fn = jax.jit(fn)
    return fn(A_batch)


def batched_pschur_complex(A_batch: jax.Array, S, mesh: Optional[Mesh] = None,
                           axis: str = "batch", want_z: bool = True,
                           maxitfac: int = 30):
    """Batched complex periodic QZ over a problem batch (see above)."""
    from ..ops.pqz_complex import pqz_complex_core
    from ..ops.hessenberg import phessenberg_core, phessenberg_signed_core
    S = tuple(bool(x) for x in S)

    def one(A):
        if all(S):
            H, Q = phessenberg_core(A, want_q=want_z)
        else:
            H, Q = phessenberg_signed_core(A, S, want_q=want_z)
        return pqz_complex_core(H, S, Z=Q, want_z=want_z, maxitfac=maxitfac)

    fn = jax.vmap(one)
    if mesh is not None:
        spec = NamedSharding(mesh, P(axis))
        A_batch = jax.device_put(A_batch, spec)
        fn = jax.jit(fn, in_shardings=(spec,))
    else:
        fn = jax.jit(fn)
    return fn(A_batch)


def ensemble_pschur_real_pipelined(As, want_z: bool = True,
                                   maxitfac: int = 40, workers: int = 2,
                                   interpret: bool = False):
    """Host-pipelined ensemble throughput on ONE chip: problems/min above
    the sequential loop.

    The chunked ds pipeline's wall-clock per problem is device execute
    PLUS host work (chunk orchestration, transfers over the tunnel, the
    host-tail finish); a sequential loop serializes both.  Two worker
    threads keep the device busy while the other problem is in its host
    phase — the accelerator serializes the executes itself, so the overlap
    is exactly the host share (double-buffering; no lockstep-window
    batched core needed for this win, cf. the vmap gather cliff documented
    on :func:`batched_pschur_real`).

    Args:
      As: sequence of (p, n, n) real cycles (compatible shapes reuse one
        compiled program set).
      workers: in-flight problems (2 = classic double buffering; more only
        helps if host work dominates).

    Returns a list of (T, Z, wr, wi, ok) numpy tuples, in input order.
    """
    import concurrent.futures as cf

    import jax.numpy as jnp

    from ..ops import ff
    from ..ops.hessenberg_ff import phessenberg_core_ff
    from ..ops.pqr_ff import pqr_real_core_ff_chunked

    dev = jax.devices()[0]

    def one(A_np):
        f = ff.from_f64(jnp.asarray(np.asarray(A_np)))
        hi = jax.device_put(f.hi, dev)
        lo = jax.device_put(f.lo, dev)
        Hh, Hl, Qh, Ql = phessenberg_core_ff(hi, lo, want_q=want_z)
        out = pqr_real_core_ff_chunked(Hh, Hl, Qh, Ql, want_z=want_z,
                                       maxitfac=maxitfac,
                                       interpret=interpret)
        T = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
        if want_z:
            Z = np.swapaxes(np.asarray(out[2], np.float64) +
                            np.asarray(out[3], np.float64), 1, 2)
        else:
            Z = None
        wr = np.asarray(out[4], np.float64) + np.asarray(out[5], np.float64)
        wi = np.asarray(out[6], np.float64) + np.asarray(out[7], np.float64)
        return T, Z, wr, wi, bool(out[8])

    with cf.ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
        return list(ex.map(one, As))
