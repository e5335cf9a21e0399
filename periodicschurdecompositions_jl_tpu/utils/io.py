"""Checkpoint / resume: serialize decompositions to .npz archives.

The reference has no save/load API (SURVEY.md §5: "Decomposition structs
are plain data and serializable, but no save/load API exists").  Here the
pytree result types round-trip through a single compressed archive, so
long-running pipelines (e.g. parameter sweeps of cycles, Krylov restarts on
huge operators) can checkpoint results.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..types import GeneralizedPeriodicSchur, PartialPeriodicSchur, PeriodicSchur

_KINDS = {
    "PeriodicSchur": PeriodicSchur,
    "GeneralizedPeriodicSchur": GeneralizedPeriodicSchur,
    "PartialPeriodicSchur": PartialPeriodicSchur,
}


def save_decomposition(path: str, P) -> None:
    """Save any decomposition type to ``path`` (.npz)."""
    kind = type(P).__name__
    if kind not in _KINDS:
        raise TypeError(f"cannot save objects of type {kind}")
    data = {"kind": np.asarray(kind), "orientation": np.asarray(P.orientation),
            "schurindex": np.asarray(P.schurindex)}
    if isinstance(P, GeneralizedPeriodicSchur):
        data.update(S=np.asarray(P.S), Ts=np.asarray(P.Ts),
                    alpha=np.asarray(P.alpha), beta=np.asarray(P.beta),
                    alphascale=np.asarray(P.alphascale))
        if P.Zs is not None:
            data["Zs"] = np.asarray(P.Zs)
    elif isinstance(P, PartialPeriodicSchur):
        data.update(Ts=np.asarray(P.Ts), Vs=np.asarray(P.Vs),
                    values=np.asarray(P.values),
                    residuals=np.asarray(P.residuals))
    else:
        data.update(Ts=np.asarray(P.Ts), values=np.asarray(P.values))
        if P.Zs is not None:
            data["Zs"] = np.asarray(P.Zs)
    np.savez_compressed(path, **data)


def load_decomposition(path: str):
    """Load a decomposition saved by :func:`save_decomposition`."""
    with np.load(path) as f:
        kind = str(f["kind"])
        orientation = str(f["orientation"])
        schurindex = int(f["schurindex"])
        if kind == "GeneralizedPeriodicSchur":
            return GeneralizedPeriodicSchur(
                S=tuple(bool(x) for x in f["S"]), schurindex=schurindex,
                Ts=jnp.asarray(f["Ts"]),
                Zs=jnp.asarray(f["Zs"]) if "Zs" in f else None,
                alpha=jnp.asarray(f["alpha"]), beta=jnp.asarray(f["beta"]),
                alphascale=jnp.asarray(f["alphascale"]),
                orientation=orientation)
        if kind == "PartialPeriodicSchur":
            return PartialPeriodicSchur(
                Ts=jnp.asarray(f["Ts"]), Vs=jnp.asarray(f["Vs"]),
                values=jnp.asarray(f["values"]),
                residuals=jnp.asarray(f["residuals"]),
                orientation=orientation, schurindex=schurindex)
        return PeriodicSchur(
            Ts=jnp.asarray(f["Ts"]),
            Zs=jnp.asarray(f["Zs"]) if "Zs" in f else None,
            values=jnp.asarray(f["values"]),
            orientation=orientation, schurindex=schurindex)


# ---------------------------------------------------------------------------
# Krylov restart checkpointing

def save_krylov_state(path: str, V, B, meta: dict) -> None:
    """Checkpoint a ``partial_pschur`` restart loop.

    ``V``/``B`` are the Krylov basis / projected-factor lists (numpy,
    per-slot shapes differ); ``meta`` carries the scalar loop state
    (it, k, active, nlock, nprods, p, n, maxdim, dtype, rng_state-as-str,
    lams_all, rs_all).  The reference has no checkpointing at all
    (SURVEY.md §5); long restart runs on expensive operators resume
    mid-loop here.
    """
    data = {}
    for l, v in enumerate(V):
        data[f"V{l}"] = np.asarray(v)
    for l, b in enumerate(B):
        data[f"B{l}"] = np.asarray(b)
    for key, val in meta.items():
        data[f"meta_{key}"] = np.asarray(val)
    np.savez_compressed(path, **data)


def load_krylov_state(path: str):
    """Load a checkpoint saved by :func:`save_krylov_state`.

    Returns (V, B, meta): lists of numpy arrays plus the scalar dict.
    """
    with np.load(path) as f:
        V, B, meta = [], [], {}
        for name in f.files:
            if name.startswith("meta_"):
                meta[name[5:]] = f[name][()]
        l = 0
        while f"V{l}" in f.files:
            V.append(f[f"V{l}"])
            l += 1
        l = 0
        while f"B{l}" in f.files:
            B.append(f[f"B{l}"])
            l += 1
    return V, B, meta
