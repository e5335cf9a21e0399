import sys
sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.ffkern import (
    matmul3_ff, refl_mat_ff, reflector_ff)
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep import (
    _band_col_apply, _flat_mat, _i2_flat, _lane_extract, _lane_force,
    _read_rows, _write_rows)

p, N = 8, 33
LEVEL = int(sys.argv[1])


def kern(scal, v0f, Hhi, Hlo, oHhi, oHlo, R0, R1, Chi, Clo):
    m = scal[0]
    i = scal[1]
    oHhi[:] = Hhi[:]
    oHlo[:] = Hlo[:]
    Chi[:] = Hhi[:]
    Clo[:] = Hlo[:]
    v0 = FF(jnp.stack([v0f[0], v0f[1], v0f[2]]),
            jnp.stack([v0f[3], v0f[4], v0f[5]]))

    def step(kk, _):
        nr3 = (i - kk + 1) >= 3
        rowsC0 = _read_rows(Chi, Clo, 0, kk, 3)
        if LEVEL >= 1:
            colC = _lane_extract(rowsC0, kk - 1)
        else:
            colC = v0
        first = kk == m
        vk = ff.where(first, v0, colC)
        z3 = jnp.where(nr3, jnp.float32(1.0), jnp.float32(0.0))
        mask3 = jnp.stack([jnp.float32(1.0), jnp.float32(1.0), z3])
        vk = FF(vk.hi * mask3, vk.lo * mask3)
        if LEVEL >= 2:
            w, tau, beta = reflector_ff(vk)
            M3 = refl_mat_ff(w, tau)
        else:
            M3 = ff.ff(jnp.eye(3, dtype=jnp.float32) if False else
                       (lax.broadcasted_iota(jnp.int32, (3, 3), 0) ==
                        lax.broadcasted_iota(jnp.int32, (3, 3), 1)
                        ).astype(jnp.float32))
            beta = FF(vk.hi[0], vk.lo[0])
        if LEVEL >= 3:
            rowsH0 = _read_rows(oHhi, oHlo, 0, kk, 3)
            bnd = _lane_extract(rowsH0, kk - 1)
            rowsH0 = matmul3_ff(M3, rowsH0)
            rowsH0 = _lane_force(rowsH0, kk - 1, bnd, first)
            _write_rows(oHhi, oHlo, 0, kk, rowsH0)
        if LEVEL >= 4:
            rowsC0b = matmul3_ff(M3, rowsC0)
            keep3 = ff.where(kk < i - 1, ff.zeros(()),
                             FF(colC.hi[2], colC.lo[2]))
            newc = FF(jnp.stack([beta.hi, jnp.float32(0.0), keep3.hi]),
                      jnp.stack([beta.lo, jnp.float32(0.0), keep3.lo]))
            rowsC0b = _lane_force(rowsC0b, kk - 1, newc, ~first)
            _write_rows(Chi, Clo, 0, kk, rowsC0b)
        if LEVEL >= 5:
            _band_col_apply(Chi, Clo, p - 1, kk, M3, 3, N)
        if LEVEL >= 6:
            R0[0, kk, :] = _flat_mat(M3, 9)
            R1[0, kk, :] = _i2_flat()

        if LEVEL >= 7:
            def fac(t, _):
                f = jnp.int32(p - 1) - t
                rowsCf = _read_rows(Chi, Clo, f, kk, 3)
                if LEVEL == 70:
                    _write_rows(Chi, Clo, f, kk, rowsCf)
                    return jnp.int32(0)
                colv = _lane_extract(rowsCf, kk)
                colv = FF(colv.hi * mask3, colv.lo * mask3)
                if LEVEL == 705:
                    out = FF(rowsCf.hi + colv.hi[:, None],
                             rowsCf.lo + colv.lo[:, None])
                    _write_rows(Chi, Clo, f, kk, out)
                    return jnp.int32(0)
                w2, tau2, beta2 = reflector_ff(colv)
                if LEVEL == 706:
                    out = FF(rowsCf.hi + w2.hi[:, None] * tau2.hi,
                             rowsCf.lo + w2.lo[:, None] * tau2.lo)
                    _write_rows(Chi, Clo, f, kk, out)
                    return jnp.int32(0)
                M3b = refl_mat_ff(w2, tau2)
                if LEVEL == 71:
                    _write_rows(Chi, Clo, f, kk, matmul3_ff(M3b, rowsCf))
                    return jnp.int32(0)
                _write_rows(oHhi, oHlo, f, kk,
                            matmul3_ff(M3b, _read_rows(oHhi, oHlo, f,
                                                       kk, 3)))
                rowsCf = matmul3_ff(M3b, rowsCf)
                newcf = FF(jnp.stack([beta2.hi, jnp.float32(0.0),
                                      jnp.float32(0.0)]),
                           jnp.stack([beta2.lo, jnp.float32(0.0),
                                      jnp.float32(0.0)]))
                rowsCf = _lane_force(rowsCf, kk, newcf, True)
                _write_rows(Chi, Clo, f, kk, rowsCf)
                if LEVEL == 72:
                    return jnp.int32(0)
                _band_col_apply(Chi, Clo, f - 1, kk, M3b, 3, N)
                if LEVEL == 73:
                    return jnp.int32(0)
                R0[f, kk, :] = _flat_mat(M3b, 9)

                if LEVEL >= 8:
                    rows2 = _read_rows(Chi, Clo, f, kk + 1, 2)
                    xc = _lane_extract(rows2, kk + 1)
                    wb, taub, betab = reflector_ff(xc)
                    M2 = refl_mat_ff(wb, taub)
                    from periodicschurdecompositions_jl_tpu.ops.ffkern \
                        import eye32
                    M2 = ff.where(nr3, M2, ff.ff(eye32(2)))
                    _write_rows(oHhi, oHlo, f, kk + 1,
                                matmul3_ff(M2, _read_rows(oHhi, oHlo, f,
                                                          kk + 1, 2)))
                    rows2 = matmul3_ff(M2, rows2)
                    newc2 = FF(jnp.stack([betab.hi, jnp.float32(0.0)]),
                               jnp.stack([betab.lo, jnp.float32(0.0)]))
                    rows2 = _lane_force(rows2, kk + 1, newc2, nr3)
                    _write_rows(Chi, Clo, f, kk + 1, rows2)
                    _band_col_apply(Chi, Clo, f - 1, kk + 1, M2, 2, N)
                    R1[f, kk, :] = _flat_mat(M2, 4)
                return jnp.int32(0)

            lax.fori_loop(jnp.int32(0), jnp.int32(p - 1), fac, jnp.int32(0))
        return jnp.int32(0)

    lax.fori_loop(m, i, step, jnp.int32(0))


call = pl.pallas_call(
    kern,
    out_shape=(jax.ShapeDtypeStruct((p, N, N), jnp.float32),
               jax.ShapeDtypeStruct((p, N, N), jnp.float32),
               jax.ShapeDtypeStruct((p, N, 18), jnp.float32),
               jax.ShapeDtypeStruct((p, N, 8), jnp.float32)),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
    scratch_shapes=[pltpu.VMEM((p, N, N), jnp.float32),
                    pltpu.VMEM((p, N, N), jnp.float32)],
    input_output_aliases={2: 0, 3: 1},
)

scal = jnp.asarray([0, 30], jnp.int32)
v0f = jnp.zeros((6,), jnp.float32)
Hhi = jnp.zeros((p, N, N), jnp.float32)
out = jax.jit(call)(scal, v0f, Hhi, Hhi)
jax.block_until_ready(out)
print(f"LEVEL {LEVEL}: OK")
