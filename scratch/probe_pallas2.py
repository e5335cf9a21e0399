"""Second capability probe: the access patterns the sweep kernel needs."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        t0 = time.time()
        out = fn()
        print(f"[OK] {name} ({time.time()-t0:.1f}s) -> {out}")
        return out
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")
        return None


# 1. 3D ref: read/write [f, pl.ds(k,3), :] with traced f and k
def t_3d_dyn():
    p, N = 4, 128
    def k(x_ref, ij_ref, o_ref):
        f = ij_ref[0]
        kk = ij_ref[1]
        rows = x_ref[f, pl.ds(kk, 3), :]
        x_ref[f, pl.ds(kk, 3), :] = rows * 2.0
        o_ref[:] = x_ref[f, pl.ds(kk, 3), :]
    x = jnp.arange(p * N * N, dtype=jnp.float32).reshape(p, N, N)
    fcall = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((3, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = jax.jit(fcall)(x, jnp.array([2, 13], jnp.int32))
    ok = np.allclose(np.asarray(y), np.asarray(x)[2, 13:16] * 2)
    return f"3d dyn rw ok={ok}"


# 2. lane extraction via mask+reduce from (3, N)
def t_lane_extract():
    N = 256
    def k(x_ref, j_ref, o_ref):
        j = j_ref[0]
        rows = x_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (3, N), 1)
        v = jnp.sum(jnp.where(lane == j, rows, 0.0), axis=1)
        o_ref[0, :3] = v
    x = jnp.arange(3 * N, dtype=jnp.float32).reshape(3, N)
    fcall = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = jax.jit(fcall)(x, jnp.array([77], jnp.int32))
    ok = np.allclose(np.asarray(y)[0, :3], np.asarray(x)[:, 77])
    return f"lane extract ok={ok}"


# 3. fori_loop with dynamic (traced) bounds + nested fori over factors
def t_dyn_fori():
    p, N = 4, 64
    def k(x_ref, mi_ref, o_ref):
        m = mi_ref[0]
        i = mi_ref[1]
        def step(kk, _):
            def fac(t, _):
                f = p - 1 - t
                rows = x_ref[f, pl.ds(kk, 2), :]
                x_ref[f, pl.ds(kk, 2), :] = rows + 1.0
                return 0
            jax.lax.fori_loop(0, p, fac, 0)
            return 0
        jax.lax.fori_loop(m, i, step, 0)
        o_ref[0, 0] = x_ref[0, 0, 0]
    x = jnp.zeros((p, N, N), jnp.float32)
    fcall = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    y = jax.jit(fcall)(x, jnp.array([0, 5], jnp.int32))
    return f"dyn fori result={float(y[0,0])} (expect 5)"


# 4. scratch full-copy init + aliased in/out
def t_scratch_copy():
    p, N = 2, 64
    def k(x_ref, o_scr_unused, scr):
        scr[:] = x_ref[:]
        scr[0, 0, :] = scr[0, 0, :] * 3.0
        x_ref[0, 1, :] = scr[0, 0, :]
    x = jnp.ones((p, N, N), jnp.float32)
    fcall = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((p, N, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((p, N, N), jnp.float32)],
        input_output_aliases={0: 0})
    y = jax.jit(fcall)(x)
    return f"scratch copy y[0,1,0]={float(y[0,1,0])} (expect 3)"


# 5. SMEM float input array
def t_smem_float():
    def k(v_ref, o_ref):
        o_ref[0, 0] = v_ref[2] * 2.0
    v = jnp.arange(6, dtype=jnp.float32)
    fcall = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    y = jax.jit(fcall)(v)
    return f"smem float={float(y[0,0])} (expect 4)"


# 6. batched (p,3,N) row op read+write via [:, ds(k,3), :]
def t_batched_rows():
    p, N = 4, 128
    def k(x_ref, j_ref, o_ref):
        kk = j_ref[0]
        rows = x_ref[:, pl.ds(kk, 3), :]        # (p, 3, N)
        x_ref[:, pl.ds(kk, 3), :] = rows * 2.0
        o_ref[0, 0] = x_ref[1, kk + 1, 5]
    x = jnp.ones((p, N, N), jnp.float32)
    fcall = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    y = jax.jit(fcall)(x, jnp.array([7], jnp.int32))
    return f"batched rows={float(y[0,0])}"


for nm, fn in [("3d dyn rw", t_3d_dyn), ("lane extract", t_lane_extract),
               ("dyn fori", t_dyn_fori), ("scratch copy", t_scratch_copy),
               ("smem float", t_smem_float),
               ("batched rows", t_batched_rows)]:
    run(nm, fn)
print("probe2 done")
