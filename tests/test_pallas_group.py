"""Grouped (8-step) sweep kernels must be BIT-IDENTICAL to the per-step
kernels: same ds operations in the same order, only the access pattern
changes (static in-block offsets + per-group slab RMW)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops import pallas_sweep as ps


def _mk_inputs(rng, p, n):
    # ghost-padded exactly like pqr_real_core_ff
    N = ((n + 16 + 7) // 8) * 8
    A = rng.standard_normal((p, n, n))
    A[0] = np.triu(A[0], -1)
    A[1:] = np.triu(A[1:])
    H = np.zeros((p, N, N), np.float32)
    H[:, :n, :n] = A.astype(np.float32)
    Hlo = np.zeros_like(H)
    Hlo[:, :n, :n] = (A - H[:, :n, :n].astype(np.float64)).astype(np.float32)
    Z = np.zeros((p, N, N), np.float32)
    Z[:, :n, :n] = np.eye(n, dtype=np.float32)
    return N, FF(jnp.asarray(H), jnp.asarray(Hlo)), \
        FF(jnp.asarray(Z), jnp.zeros((p, N, N), jnp.float32))


# windows span ~3 groups: partial first group, full middle, partial last —
# enough to exercise every in-group offset and both band-slab branches
# (interpret mode is too slow for full-length sweeps)
@pytest.mark.parametrize("p,n,m,i", [
    (2, 140, 0, 26), (3, 133, 5, 29), (2, 140, 17, 44), (1, 136, 3, 27),
    (2, 140, 8, 10),
])
def test_grouped_vs_perstep_bitexact(rng, p, n, m, i):
    N, H, ZT = _mk_inputs(rng, p, n)
    v = rng.standard_normal(3)
    v0 = ff.from_f64(jnp.asarray(v / np.abs(v).sum()))
    scal = jnp.stack([jnp.int32(m), jnp.int32(i), jnp.int32(m // 8),
                      jnp.int32((i - 1) // 8)])
    v0f = jnp.concatenate([v0.hi, v0.lo]).astype(jnp.float32)

    outs = {}
    for tag, mkA, mkB in [("old", ps._make_sweep_kernel,
                           ps._make_apply_kernel),
                          ("new", ps._make_sweep_kernel_g,
                           ps._make_apply_kernel_g)]:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        callA = pl.pallas_call(
            mkA(p, N, False),
            out_shape=(jax.ShapeDtypeStruct((p, N, N), jnp.float32),
                       jax.ShapeDtypeStruct((p, N, N), jnp.float32),
                       jax.ShapeDtypeStruct((p, N, 18), jnp.float32),
                       jax.ShapeDtypeStruct((p, N, 8), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(4)),
            scratch_shapes=[pltpu.VMEM((p, N, N), jnp.float32),
                            pltpu.VMEM((p, N, N), jnp.float32)],
            interpret=True,
        )
        with ff.no_barriers():
            Hhi, Hlo, R0, R1 = callA(scal, v0f, H.hi, H.lo)
        # logs for inactive steps are unspecified: compare active rows only
        acts = np.zeros(N, bool)
        acts[m:i] = True
        outs[tag] = dict(
            Hhi=np.asarray(Hhi), Hlo=np.asarray(Hlo),
            R0=np.asarray(R0)[:, acts, :], R1=np.asarray(R1)[:, acts, :])

        HThi = jnp.swapaxes(Hhi, 1, 2)
        HTlo = jnp.swapaxes(Hlo, 1, 2)
        callB = pl.pallas_call(
            mkB(p, N, True, False),
            out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                            for _ in range(4)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(4)),
            interpret=True,
        )
        with ff.no_barriers():
            oHThi, oHTlo, oZThi, oZTlo = callB(scal, HThi, HTlo, ZT.hi,
                                               ZT.im if False else ZT.lo,
                                               R0, R1)
        outs[tag].update(
            HThi=np.asarray(oHThi), HTlo=np.asarray(oHTlo),
            ZThi=np.asarray(oZThi), ZTlo=np.asarray(oZTlo))

    for k in outs["old"]:
        a, b = outs["old"][k], outs["new"][k]
        assert a.shape == b.shape
        neq = a != b
        assert not neq.any(), (k, int(neq.sum()),
                               np.argwhere(neq)[:5].tolist())


def test_chase_sweep_ff_large_window(rng):
    """End-to-end chase_sweep_ff at N > 128 (grouped path) preserves the
    global-transform invariants: orthogonal Z chains, H = L H0 R.
    Window [0, 40) keeps interpret-mode time bounded while spanning 6
    groups."""
    p, n = 2, 140
    N, H, ZT = _mk_inputs(rng, p, n)
    v = rng.standard_normal(3)
    v0 = ff.from_f64(jnp.asarray(v / np.abs(v).sum()))
    H0 = np.asarray(H.hi, np.float64) + np.asarray(H.lo, np.float64)
    Hn, ZTn = ps.chase_sweep_ff(H, ZT, jnp.int32(0), jnp.int32(40), v0,
                                want_z=True, interpret=True)
    Hd = np.asarray(Hn.hi, np.float64) + np.asarray(Hn.lo, np.float64)
    Zd = np.asarray(ZTn.hi, np.float64) + np.asarray(ZTn.lo, np.float64)
    for l in range(p):
        Q = Zd[l][:n, :n]
        assert np.abs(Q @ Q.T - np.eye(n)).max() < 1e-12
    # reconstruction: Z[l]' H0[l] Z[l+1] == Hn[l] with Z = ZT^T
    for l in range(p):
        Zl = Zd[l][:n, :n].T
        Zn = Zd[(l + 1) % p][:n, :n].T
        Hx = Zl.T @ H0[l][:n, :n] @ Zn
        assert np.abs(Hx - Hd[l][:n, :n]).max() < 1e-11
