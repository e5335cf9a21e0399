"""Public decomposition drivers.

API parity with the reference's exported surface
(src/PeriodicSchurDecompositions.jl:108-177, src/generalized.jl:87-148,
:1191-1211): ``pschur`` (standard and generalized via the ``S`` argument),
``gpschur`` (A/B-pair convenience), ``phessenberg``.

All drivers accept either a stacked ``(p, n, n)`` array or a sequence of
``(n, n)`` matrices, are functional (inputs never mutated), and return the
pytree result types of :mod:`..types`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..types import ConvergenceFailure, GeneralizedPeriodicSchur, PeriodicSchur
from ..utils.circshift import rev_alias
from ..ops.hessenberg import phessenberg_core, phessenberg_signed_core
from ..ops.pqz_complex import pqz_complex_core


def _stack(A) -> jax.Array:
    import numpy as _np

    def _dt(x):
        d = getattr(x, "dtype", None)
        return d if d is not None else _np.asarray(x).dtype

    items = [A] if hasattr(A, "ndim") else list(A)
    iscx = any(jnp.issubdtype(_dt(a), jnp.complexfloating) for a in items)
    if iscx:
        # complex dtype must never touch the accelerator default device:
        # the axon TPU has no complex support and the runtime STALLS on a
        # complex128 device_put (observed dying UNAVAILABLE after ~25 min,
        # results_r5.log e2e cx legs).  The complex pipelines split
        # (re, im) on the host anyway, so stack complex input on the CPU.
        with jax.default_device(jax.devices("cpu")[0]):
            A = jnp.stack([jnp.asarray(a) for a in items]) \
                if not hasattr(A, "ndim") else jnp.asarray(A)
    else:
        A = jnp.stack([jnp.asarray(a) for a in A]) \
            if not hasattr(A, "ndim") else jnp.asarray(A)
    if A.ndim != 3 or A.shape[1] != A.shape[2]:
        raise ValueError(f"expected a (p, n, n) cycle, got shape {A.shape}")
    return A


def _char_lr(lr) -> str:
    s = str(lr).lstrip(":").upper()
    if s not in ("R", "L"):
        raise ValueError("orientation must be 'R' (right) or 'L' (left)")
    return s


def phessenberg(A, S: Optional[Sequence[bool]] = None, want_q: bool = True):
    """Periodic Hessenberg(-triangular) reduction of a cycle.

    Returns (H, Q): H[0] upper Hessenberg, H[1:] upper triangular, with
    ``Q[l]^H A[l] Q[(l+1)%p] = H[l]`` (direct factors) or
    ``Q[(l+1)%p]^H A[l] Q[l] = H[l]`` (inverted factors, when ``S`` given).
    """
    A = _stack(A)
    if S is None or all(bool(x) for x in S):
        return phessenberg_core(A, want_q=want_q)
    return phessenberg_signed_core(A, tuple(bool(x) for x in S), want_q=want_q)


def _pschur_complex_gen(A, S, orient, want_t, want_z, maxitfac,
                        backend="auto"):
    """Right-orientation complex GPSD pipeline on a stacked cycle.

    backend: "complex" runs the complex128 core (exact f64; CPU-only — the
    axon TPU has no complex dtype); "split" runs the split-complex (re, im)
    pair core in emulated f64 (ops/pqz_complex_split.py, executes on the
    TPU but keeps f64-emulation's weak-add floor); "ff" runs the
    production split-complex float-float chunked core with the fused cx
    Pallas sweeps (ops/pqz_complex_ff.py — contract-grade on-chip);
    "auto" picks "complex" when the default DEVICE is the CPU, else "ff".
    """
    import jax as _jax
    p = A.shape[0]
    if orient == "L":
        A = A[::-1]
        S = tuple(reversed(S))
    if not S[0]:
        raise ValueError("the leftmost signature entry must be +1 (True); "
                         "rotate the cycle so a direct factor leads")
    if backend == "auto":
        # NOTE: use the default DEVICE's platform, not jax.default_backend():
        # the axon plugin reports itself as the default backend even under
        # JAX_PLATFORMS=cpu with a pinned CPU default device (CLAUDE.md)
        dev = _jax.config.jax_default_device
        plat = dev.platform if dev is not None else _jax.default_backend()
        backend = "complex" if plat == "cpu" else "ff"
    if backend == "ff":
        return _pschur_complex_ff(A, S, orient, want_t, want_z, maxitfac)
    if backend == "split":
        return _pschur_complex_split(A, S, orient, want_t, want_z, maxitfac)
    if all(S):
        H, Q = phessenberg_core(A, want_q=want_z)
    else:
        H, Q = phessenberg_signed_core(A, S, want_q=want_z)
    from ..config import verbosity
    if verbosity("main") >= 1:
        T, Z, alpha, beta, scale, ok, info = pqz_complex_core(
            H, S, Z=Q, want_z=want_z, want_t=want_t, maxitfac=maxitfac,
            with_info=True)
        print(f"[pschur complex] p={p} n={A.shape[-1]}: "
              f"{int(info['niter'])} iterations "
              f"(budget {int(info['maxit'])}), converged={bool(ok)}")
    else:
        T, Z, alpha, beta, scale, ok = pqz_complex_core(
            H, S, Z=Q, want_z=want_z, want_t=want_t, maxitfac=maxitfac)
    if not bool(ok):
        raise ConvergenceFailure(-1)
    P = GeneralizedPeriodicSchur(
        S=S, schurindex=0, Ts=T, Zs=Z, alpha=alpha, beta=beta,
        alphascale=scale, orientation="R")
    if orient == "L":
        P = rev_alias(P)
    return P


def _pschur_complex_ff(A, S, orient, want_t, want_z, maxitfac,
                       chunk_iters=None, pallas=None, interpret=False):
    """Float-float split-complex pipeline: the CONTRACT-GRADE TPU path.

    COMPLEX-FREE end to end: all-positive signatures reduce via the ds
    split Householder reduction (ops/pqz_complex_ff.phessenberg_core_cxff),
    mixed signatures via the ds split signed Hessenberg-triangular
    reduction (phessenberg_signed_core_cxff) — no complex128 host staging.
    The iteration runs host-chunked on-device in float-float arithmetic
    (<=1e-12-grade backward error ON the chip; see ops/pqz_complex_ff.py).
    """
    import jax as _jax
    import numpy as _np
    from ..ops import ff as _ff
    from ..ops.pqz_complex_ff import (phessenberg_core_cxff,
                                      phessenberg_signed_core_cxff,
                                      phessenberg_signed_core_cxff_chunked,
                                      pqz_complex_core_ff_chunked)
    p = A.shape[0]
    Anp = _np.asarray(A)

    def _split4(x):
        f = _ff.from_f64(jnp.asarray(_np.ascontiguousarray(x)))
        return f.hi, f.lo

    rhi, rlo = _split4(Anp.real)
    ihi, ilo = _split4(Anp.imag)
    dev0 = _jax.config.jax_default_device
    plat0 = dev0.platform if dev0 is not None else _jax.default_backend()
    if all(S):
        out = phessenberg_core_cxff(rhi, rlo, ihi, ilo, want_q=want_z)
    elif plat0 != "cpu":
        # host-chunked: the un-chunked signed reduction's single execute
        # (33 s at p=6 n=128) risks the axon ~60 s kill at larger sizes
        out = phessenberg_signed_core_cxff_chunked(rhi, rlo, ihi, ilo, S,
                                                   want_q=want_z)
    else:
        out = phessenberg_signed_core_cxff(rhi, rlo, ihi, ilo, S,
                                           want_q=want_z)
    (Hrehi, Hrelo, Himhi, Himlo) = out[:4]
    Z4 = out[4:] if want_z else None
    # off-CPU the sweep runs as the fused Pallas kernel triple
    # (ops/pallas_sweep_cx.py): the XLA-glue sweep's while-body HLO wedges
    # the axon REMOTE compiler at p >= 6, and the glue's ~30 dispatches per
    # (step, factor) dominate its wall-clock.  CPU keeps the glue path
    # (want_t windowing, no interpreter overhead).
    if pallas is None:
        dev = _jax.config.jax_default_device
        plat = (dev.platform if dev is not None else _jax.default_backend())
        pallas = plat != "cpu"
    out = pqz_complex_core_ff_chunked(
        Hrehi, Hrelo, Himhi, Himlo, S, Z4, want_z=want_z, want_t=want_t,
        maxitfac=maxitfac, chunk_iters=chunk_iters,
        pallas_sweep=pallas, interpret=interpret)
    (Trehi, Trelo, Timhi, Timlo, Zrh, Zrl, Zih, Zil,
     alr, ali, be, sc, ok) = out
    if not bool(ok):
        raise ConvergenceFailure(-1)
    cpu = _jax.devices("cpu")[0]

    def _c(reh, rel, imh, iml):
        re = _np.asarray(reh, _np.float64) + _np.asarray(rel, _np.float64)
        im = _np.asarray(imh, _np.float64) + _np.asarray(iml, _np.float64)
        return jnp.asarray(re + 1j * im, device=cpu)

    T = _c(Trehi, Trelo, Timhi, Timlo)
    Z = _c(Zrh, Zrl, Zih, Zil) if want_z else None
    alpha = jnp.asarray(_np.asarray(alr) + 1j * _np.asarray(ali), device=cpu)
    P = GeneralizedPeriodicSchur(
        S=S, schurindex=0, Ts=T, Zs=Z, alpha=alpha,
        beta=jnp.asarray(_np.asarray(be, _np.float64), device=cpu),
        alphascale=sc, orientation="R")
    if orient == "L":
        P = rev_alias(P)
    return P


def _pschur_complex_split(A, S, orient, want_t, want_z, maxitfac):
    """Split-complex pipeline: (re, im) f64 pairs, executable on the TPU.

    All-positive signatures reduce on-device via the split Householder
    reduction; mixed signatures stage the Hessenberg-triangular reduction
    through the complex128 host path (jnp.linalg.qr has no TPU complex
    support) and run the iteration on-device.
    """
    import jax as _jax
    import numpy as _np
    from ..ops.pqz_complex_split import (phessenberg_core_split,
                                         pqz_complex_core_split)
    p = A.shape[0]
    Anp = _np.asarray(A)
    Are = jnp.asarray(_np.ascontiguousarray(Anp.real))
    Aim = jnp.asarray(_np.ascontiguousarray(Anp.imag))
    if all(S):
        Hre, Him, Qre, Qim = phessenberg_core_split(Are, Aim, want_q=want_z)
    else:
        cpu = _jax.devices("cpu")[0]
        with _jax.default_device(cpu):
            H, Q = phessenberg_signed_core(jnp.asarray(Anp), S,
                                           want_q=want_z)
            Hn = _np.asarray(H)
            Qn = _np.asarray(Q) if want_z else None
        Hre = jnp.asarray(_np.ascontiguousarray(Hn.real))
        Him = jnp.asarray(_np.ascontiguousarray(Hn.imag))
        Qre = jnp.asarray(_np.ascontiguousarray(Qn.real)) if want_z else None
        Qim = jnp.asarray(_np.ascontiguousarray(Qn.imag)) if want_z else None
    out = pqz_complex_core_split(Hre, Him, S, Qre, Qim, want_z=want_z,
                                 want_t=want_t, maxitfac=maxitfac)
    (Tre, Tim, Zre, Zim, alr, ali, be, sc, ok) = out
    if not bool(ok):
        raise ConvergenceFailure(-1)
    cpu = _jax.devices("cpu")[0]
    T = jnp.asarray(_np.asarray(Tre) + 1j * _np.asarray(Tim), device=cpu)
    Z = None
    if want_z:
        Z = jnp.asarray(_np.asarray(Zre) + 1j * _np.asarray(Zim), device=cpu)
    alpha = jnp.asarray(_np.asarray(alr) + 1j * _np.asarray(ali), device=cpu)
    P = GeneralizedPeriodicSchur(
        S=S, schurindex=0, Ts=T, Zs=Z, alpha=alpha, beta=be,
        alphascale=sc, orientation="R")
    if orient == "L":
        P = rev_alias(P)
    return P


def pschur(A, lr="R", S: Optional[Sequence[bool]] = None, *,
           want_t: bool = True, want_z: bool = True,
           maxitfac: Optional[int] = None, aggressive: bool = False,
           backend: str = "auto"):
    """Periodic (generalized) Schur decomposition of a matrix cycle.

    Args:
      A: (p, n, n) stacked cycle or sequence of square matrices.
      lr: 'R' for the product ``A[0] @ ... @ A[p-1]``, 'L' for
          ``A[p-1] @ ... @ A[0]``.
      S: optional signature (True = direct, False = inverted factor);
         selects the generalized decomposition.
      want_t/want_z: keep the triangular/unitary factors.
      maxitfac: iteration budget factor (default 30).
      backend: complex-input routing — "complex" (complex128 core, exact
        f64, CPU-only: the axon TPU has no complex dtype), "ff" (float-
        float split-complex core, TPU-executable at <=1e-12-grade accuracy,
        host-chunked for the axon execute kill timer), "split" ((re, im)
        emulated-f64 pair core, TPU-executable at the emulated-f64 floor),
        "auto" ("ff" unless the default backend is the CPU).  Real plain
        input routes analogously: "f64" (exact-f64 core) vs "ff" (the
        float-float production pipeline: ds reduction + fused Pallas
        sweeps, chunked, AED), "auto" = "ff" off-CPU.  Real GENERALIZED
        input likewise: "f64" (exact-f64 signed cores, the CPU path) vs
        "ff" (ds signed reduction + ds QZ iteration with the fused Pallas
        rg chase — the contract-grade TPU route, on-chip record 2.9e-13),
        "auto" = "ff" off-CPU.

    Returns:
      PeriodicSchur (S is None) or GeneralizedPeriodicSchur (S given).
    """
    A = _stack(A)
    orient = _char_lr(lr)
    p = A.shape[0]
    mif = 30 if maxitfac is None else int(maxitfac)
    if aggressive and (S is None or
                       jnp.issubdtype(A.dtype, jnp.complexfloating)):
        # the reference defines aggressive deflation for the real
        # generalized decomposition only (src/rgeneralized.jl:7)
        raise ValueError("aggressive deflation applies to the real "
                         "generalized decomposition (real dtype + S) only")
    if jnp.issubdtype(A.dtype, jnp.complexfloating):
        if S is None:
            gps = _pschur_complex_gen(A, (True,) * p, orient, want_t,
                                      want_z, mif, backend=backend)
            return PeriodicSchur(Ts=gps.Ts, Zs=gps.Zs, values=gps.values,
                                 orientation=gps.orientation,
                                 schurindex=gps.schurindex)
        return _pschur_complex_gen(A, tuple(bool(x) for x in S), orient,
                                   want_t, want_z, mif, backend=backend)
    # real dtypes
    if S is None:
        from ..ops.pqr_real import pschur_real_pipeline
        rb = backend if backend in ("auto", "ff", "f64") else "f64"
        return pschur_real_pipeline(A, orient, want_t=want_t, want_z=want_z,
                                    maxitfac=mif, backend=rb)
    # real generalized: route off-CPU to the contract-grade ds pipeline
    # (ops/pqz_real_ff; on-chip record backerr 2.909e-13 at p=6 n=128
    # mixed S) — the exact-f64 core stays the CPU path.  The reference's
    # real GPSD core: src/rgeneralized.jl:49-1083.
    Sb = tuple(bool(x) for x in S)
    mifg = 120 if maxitfac is None else mif
    rb = backend if backend in ("ff", "f64") else None
    if rb is None:
        dev = jax.config.jax_default_device
        plat = dev.platform if dev is not None else jax.default_backend()
        rb = "f64" if plat == "cpu" else "ff"
    if rb == "ff":
        from ..ops.pqz_real_ff import pschur_real_gen_pipeline_ff
        return pschur_real_gen_pipeline_ff(A, Sb, orient, want_t=want_t,
                                           want_z=want_z, maxitfac=mifg,
                                           aggressive=aggressive)
    from ..ops.pqz_real import pschur_real_gen_pipeline
    return pschur_real_gen_pipeline(A, Sb, orient,
                                    want_t=want_t, want_z=want_z,
                                    maxitfac=mifg,
                                    aggressive=aggressive)


def gpschur(As, Bs, **kwargs):
    """GPSD of the formal product ``B[p-1]^-1 A[p-1] ... B[0]^-1 A[0]``.

    Convenience builder matching the reference's `gpschur`
    (src/generalized.jl:1182-1211): interleaves the pairs into a length-2p
    signed cycle (terms shifted by one, which does not change eigenvalues).
    """
    As = [jnp.asarray(a) for a in As]
    Bs = [jnp.asarray(b) for b in Bs]
    ph = len(As)
    ib = 0 if ph == 1 else ph - 2
    Cs = [As[ph - 1], Bs[ib]]
    Ss = [True, False]
    for j in range(ph - 2, -1, -1):
        Cs.append(As[j])
        Cs.append(Bs[ph - 1 if j == 0 else j - 1])
        Ss.extend([True, False])
    C = jnp.stack(Cs)
    if not jnp.issubdtype(C.dtype, jnp.complexfloating):
        kwargs.setdefault("lr", "R")
    return pschur(C, kwargs.pop("lr", "R"), S=tuple(Ss), **kwargs)
