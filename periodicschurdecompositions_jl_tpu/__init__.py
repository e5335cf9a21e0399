"""TPU-native periodic Schur decompositions (JAX / XLA / Pallas).

A ground-up re-design (NOT a port) of the capabilities of
RalphAS/PeriodicSchurDecompositions.jl for TPU hardware.

Given a cycle of ``p`` square matrices ``A[0..p-1]`` (stored as one stacked
``(p, n, n)`` array), this package computes:

* the **periodic Schur decomposition** (``pschur``): unitary ``Z[j]`` with
  ``Z[j]' A[j] Z[(j+1) % p] = T[j]`` (right orientation), all ``T[j]`` upper
  triangular except one quasi-triangular factor for real dtypes,
* the **generalized periodic Schur decomposition** of a formal product
  ``prod_j A[j]^{s[j]}`` with signature ``s[j] = ±1`` (periodic QZ),
* **eigenvalue reordering** (``ordschur``) moving selected eigenvalues and
  their invariant subspace to the top,
* **eigenvectors** of the product (``eigvecs``),
* a **periodic Krylov-Schur** iteration (``partial_pschur``) for a few
  exterior eigenvalues of large products given only matvecs,

all without ever forming the matrix product (which would destroy accuracy).

Design (see SURVEY.md §7): the reference's scalar-sequential Fortran-style
iterations are re-expressed as statically shaped, fully jitted sweep kernels —
``lax.while_loop`` over QR/QZ iterations with deflation windows carried as
integer state, rotation/reflector chains as ``lax.scan``/``fori_loop`` over
masked 2- and 3-row slab updates, and the p-cycle unrolled (p is static).
Everything is functional: decompositions are pytrees, cores are pure and
jit/vmap-compatible.

Default compute dtype is float64/complex128 (``jax_enable_x64`` is switched on
at import) because the accuracy contract (backward error ≤ ~100·eps·n) is part
of the API.
"""
from __future__ import annotations

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# On TPU, float32 matmuls default to bfloat16 MXU passes (~1e-2 relative
# error), which destroys backward stability; this library's contract is
# LAPACK-grade accuracy, so demand full-precision matmuls everywhere.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the iteration cores are large while_loop
# programs whose (remote) XLA:TPU compiles run minutes-to-hours at
# production sizes; caching serialized executables across processes makes
# every re-run (benchmarks, chunk resumes in fresh processes, test
# modules) pay that once.  Respect an explicit user setting; ignore
# backends that cannot serialize executables (JAX degrades gracefully).
import os as _os  # noqa: E402

if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        # Key the cache dir by the HOST CPU feature set: XLA:CPU AOT
        # executables embed machine features (avx512 variants, scatter/
        # gather preferences), and sessions of this repo run in VMs whose
        # host CPUs differ — a cache entry compiled elsewhere loads with
        # "could lead to execution errors such as SIGILL" warnings and has
        # hung real runs.  Distinct machines therefore get distinct dirs.
        import hashlib as _hashlib
        try:
            # flags ALONE are not enough: two hosts with identical cpuinfo
            # flag lines produced incompatible XLA:CPU AOT entries (XLA
            # derives extra tuning features — prefer-no-scatter/gather,
            # amx splits — from the cpu model), and a mismatched entry
            # E-logs "could lead to execution errors such as SIGILL" and
            # has crashed real runs; key on model name + stepping + flags.
            with open("/proc/cpuinfo") as _f:
                _lines = [ln for ln in _f
                          if ln.startswith(("flags", "model name", "model\t",
                                            "stepping", "cpu family"))]
            _fp = _hashlib.sha1(
                ("".join(sorted(set(_lines)))).encode()).hexdigest()[:10]
        except Exception:
            import platform as _platform
            _fp = _hashlib.sha1(
                _platform.processor().encode()).hexdigest()[:10]
        _cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", f"psd_jax_cache_{_fp}")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .types import (  # noqa: E402
    AbstractPeriodicSchur,
    GeneralizedPeriodicSchur,
    IllConditionedException,
    PSDNotImplemented,
    PartialPeriodicSchur,
    PeriodicSchur,
    PKSFailure,
)
from .config import AlgoConfig, default_config, setverbosity, verbosity  # noqa: E402
from .diagnostics import check_psd, FacChecker  # noqa: E402
from .models.drivers import (  # noqa: E402
    gpschur,
    phessenberg,
    pschur,
)
from .models.ordschur import ordschur  # noqa: E402
from .models.vectors import eigvecs  # noqa: E402
from .models.krylov import partial_pschur, ArnoldiHistory  # noqa: E402
from .utils.io import load_decomposition, save_decomposition  # noqa: E402
from .utils.balance import balance_pcycle  # noqa: E402
from .ops.pqz_mp import MpGeneralizedPeriodicSchur, pschur_mp  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "AbstractPeriodicSchur",
    "PeriodicSchur",
    "GeneralizedPeriodicSchur",
    "PartialPeriodicSchur",
    "IllConditionedException",
    "PKSFailure",
    "PSDNotImplemented",
    "AlgoConfig",
    "default_config",
    "setverbosity",
    "verbosity",
    "pschur",
    "gpschur",
    "phessenberg",
    "ordschur",
    "eigvecs",
    "partial_pschur",
    "ArnoldiHistory",
    "check_psd",
    "FacChecker",
    "save_decomposition",
    "balance_pcycle",
    "load_decomposition",
    "pschur_mp",
    "MpGeneralizedPeriodicSchur",
]
