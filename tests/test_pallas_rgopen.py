"""Fused rg opening/closing ladders (ops/pallas_rgopen) vs the XLA glue.

Full rg-core runs with PSD_RG_KERNEL=1 (kernels, interpret mode) must be
BITWISE-identical to PSD_RG_KERNEL=0 (glue) — the kernels replicate the
glue's ds op sequence exactly.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg import \
    phessenberg_signed_core
from periodicschurdecompositions_jl_tpu.ops.pqz_real_ff import \
    pqz_real_gen_core_ff


def _run(H, S, want_z, env):
    os.environ["PSD_RG_KERNEL"] = env
    pqz_real_gen_core_ff.clear_cache()
    try:
        Hf = ff.from_f64(jnp.asarray(H))
        out = pqz_real_gen_core_ff(Hf.hi, Hf.lo, S, None, want_z=want_z,
                                   pallas_sweep=True, interpret=True)
        return [None if o is None else np.asarray(o) for o in out]
    finally:
        os.environ.pop("PSD_RG_KERNEL", None)
        pqz_real_gen_core_ff.clear_cache()


@pytest.mark.parametrize("p,n,want_z", [(2, 10, True), (4, 12, True),
                                        (3, 10, False)])
def test_rg_ladders_bitwise_vs_glue(rng, p, n, want_z):
    S = tuple(l % 2 == 0 for l in range(p))
    A = rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += np.sign(np.linalg.det(A[l])) * 3 * np.eye(n)
    H, _ = phessenberg_signed_core(jnp.asarray(A), S, want_q=False)
    H = np.asarray(H)
    ref = _run(H, S, want_z, "0")
    ker = _run(H, S, want_z, "1")
    assert bool(ref[-1]) and bool(ker[-1])
    for idx, (a, b) in enumerate(zip(ref, ker)):
        if a is None:
            assert b is None
            continue
        assert np.array_equal(a, b), (idx, np.abs(
            np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
