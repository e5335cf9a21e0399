"""Fused cx shift-chain kernel (kernel S) vs the XLA glue — bitwise.

Full cx-core runs with PSD_CX_KERNEL=1 (kernel, interpret) must be
bitwise-identical to PSD_CX_KERNEL=0 (glue): the kernel replicates the
shift chain's ds op sequence exactly (static unroll of the glue's
fori + S-cond selects the same per-factor operations).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import cxff
from periodicschurdecompositions_jl_tpu.ops.pqz_complex_ff import (
    pqz_complex_core_ff, phessenberg_signed_core_cxff)


def _run(A, S, env):
    os.environ["PSD_CX_KERNEL"] = env
    pqz_complex_core_ff.clear_cache()
    try:
        Hc = cxff.from_f64_split(jnp.asarray(A.real), jnp.asarray(A.imag))
        out = phessenberg_signed_core_cxff(Hc.re.hi, Hc.re.lo, Hc.im.hi,
                                           Hc.im.lo, S, want_q=False)
        out2 = pqz_complex_core_ff(out[0], out[1], out[2], out[3], S,
                                   None, want_z=True, pallas_sweep=True,
                                   interpret=True)
        return [None if o is None else np.asarray(o) for o in out2]
    finally:
        os.environ.pop("PSD_CX_KERNEL", None)
        pqz_complex_core_ff.clear_cache()


@pytest.mark.parametrize("p,n", [(2, 8), (3, 10)])
def test_cx_shift_kernel_bitwise(rng, p, n):
    S = tuple(l % 2 == 0 for l in range(p))
    A = rng.standard_normal((p, n, n)) + 1j * rng.standard_normal((p, n, n))
    for l in range(p):
        A[l] += np.sign(np.linalg.det(A[l]).real or 1.0) * 3 * np.eye(n)
    ref = _run(A, S, "0")
    ker = _run(A, S, "1")
    assert bool(ref[-1]) and bool(ker[-1])
    for idx, (a, b) in enumerate(zip(ref, ker)):
        if a is None:
            assert b is None
            continue
        assert np.array_equal(a, b), (idx,)
