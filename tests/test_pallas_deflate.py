"""Fused Mosaic deflation branch (ops/pallas_deflate) vs the XLA glue.

The kernel replicates defl2's chainA/chainB ds op sequence exactly, so a
full ds-core run with PSD_DEFL_KERNEL=1 (kernel, interpret mode) must be
BITWISE-identical to PSD_DEFL_KERNEL=0 (glue) on every output.  The env
var is read at trace time, so the jit cache is cleared between flips.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.config import AlgoConfig
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops import pqr_ff as core_mod
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff


def _run(H, want_z, env):
    os.environ["PSD_DEFL_KERNEL"] = env
    pqr_real_core_ff.clear_cache()
    try:
        Hf = ff.from_f64(jnp.asarray(H))
        out = pqr_real_core_ff(Hf.hi, Hf.lo, want_z=want_z,
                               cfg=AlgoConfig(), interpret=True)
        return [None if o is None else np.asarray(o) for o in out]
    finally:
        os.environ.pop("PSD_DEFL_KERNEL", None)
        pqr_real_core_ff.clear_cache()


def _hess_cycle(rng, p, n, tiny_diag=None):
    H = np.zeros((p, n, n))
    H[0] = np.triu(rng.standard_normal((n, n)), -1)
    for f in range(1, p):
        H[f] = np.triu(rng.standard_normal((n, n)))
        np.fill_diagonal(H[f], 1.0 + rng.random(n))
    if tiny_diag is not None:
        f, k, v = tiny_diag
        H[f][k, k] = v
    return H


@pytest.mark.parametrize("p,n,want_z", [(1, 10, True), (3, 12, True),
                                        (4, 10, False)])
def test_deflate_kernel_bitwise_vs_glue(rng, p, n, want_z):
    H = _hess_cycle(rng, p, n)
    ref = _run(H, want_z, "0")
    ker = _run(H, want_z, "1")
    assert bool(ref[8]) and bool(ker[8])
    for a, b, name in zip(ref, ker, ("Th", "Tl", "Zh", "Zl", "wrh", "wrl",
                                     "wih", "wil", "ok")):
        if a is None:
            assert b is None
            continue
        assert np.array_equal(a, b), (name, np.abs(a - b).max())


def test_deflate_kernel_chainA_path(rng):
    # a tiny triangular diagonal makes a 2x2 block's factor product
    # singular mid-run -> chainA (jmin >= 1) executes in the kernel
    p, n = 3, 12
    H = _hess_cycle(rng, p, n, tiny_diag=(1, 5, 1e-30))
    ref = _run(H, True, "0")
    ker = _run(H, True, "1")
    assert bool(ref[8]) and bool(ker[8])
    for a, b in zip(ref, ker):
        assert np.array_equal(a, b)
