"""Capability probe for Pallas on the axon TPU.

Tests, on the REAL chip:
  1. minimal pallas kernel compile+run
  2. Knuth two-sum exactness inside a kernel (no unsafe reassociation)
  3. dynamic sublane (row) slice and dynamic lane (col) slice
  4. lax.while_loop / lax.cond / scalar SMEM state inside a kernel
  5. VMEM capacity (how big a resident scratch compiles+runs)
  6. input_output_aliases (in-place update)
  7. per-step cost of a chase-like sequential loop (calibrates the design)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dev = jax.devices()[0]
print("device:", dev, dev.platform)


def run(name, fn):
    try:
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"[OK] {name}  ({dt:.1f}s)  -> {out}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# ---- 1. minimal ----------------------------------------------------------
def t_minimal():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.ones((8, 128), jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                       in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                       out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = jax.jit(f)(x)
    return float(jnp.max(y))

run("minimal", t_minimal)


# ---- 2. two-sum exactness -------------------------------------------------
def t_twosum():
    def k(a_ref, b_ref, s_ref, e_ref):
        a = a_ref[:]
        b = b_ref[:]
        s = a + b
        bb = s - a
        err = (a - (s - bb)) + (b - bb)
        s_ref[:] = s
        e_ref[:] = err
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((8, 128)) * 1e8).astype(np.float32)
    b = rng.standard_normal((8, 128)).astype(np.float32)
    f = pl.pallas_call(
        k, out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                      jax.ShapeDtypeStruct((8, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2)
    s, e = jax.jit(f)(jnp.asarray(a), jnp.asarray(b))
    # exact check in float64 on host
    s64 = np.asarray(s, np.float64)
    e64 = np.asarray(e, np.float64)
    ref = a.astype(np.float64) + b.astype(np.float64)
    err = np.abs((s64 + e64) - ref).max()
    return f"twosum max abs err vs f64 = {err}"

run("two_sum exact", t_twosum)


# ---- 2b. two-prod via Veltkamp split -------------------------------------
def t_twoprod():
    SPLIT = np.float32(4097.0)  # 2^12 + 1 for f32 (24-bit mantissa)
    def k(a_ref, b_ref, p_ref, e_ref):
        a = a_ref[:]
        b = b_ref[:]
        c = SPLIT * a
        ahi = c - (c - a)
        alo = a - ahi
        c2 = SPLIT * b
        bhi = c2 - (c2 - b)
        blo = b - bhi
        p = a * b
        err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
        p_ref[:] = p
        e_ref[:] = err
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 128)).astype(np.float32)
    b = rng.standard_normal((8, 128)).astype(np.float32)
    f = pl.pallas_call(
        k, out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                      jax.ShapeDtypeStruct((8, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2)
    p, e = jax.jit(f)(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.float64) * b.astype(np.float64)
    err = np.abs((np.asarray(p, np.float64) + np.asarray(e, np.float64)) - ref).max()
    return f"twoprod max abs err vs f64 = {err}"

run("two_prod (Veltkamp)", t_twoprod)


# ---- 3. dynamic slicing ---------------------------------------------------
def t_dynrow():
    def k(x_ref, i_ref, o_ref):
        i = i_ref[0]
        o_ref[:] = x_ref[pl.ds(i, 3), :]
    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = jax.jit(f)(x, jnp.array([13], jnp.int32))
    ok = np.allclose(np.asarray(y), np.asarray(x)[13:16])
    return f"dyn row slice ok={ok}"

run("dynamic sublane slice (rows)", t_dynrow)


def t_dyncol():
    def k(x_ref, i_ref, o_ref):
        i = i_ref[0]
        o_ref[:] = x_ref[:, pl.ds(i, 4)]
    x = jnp.arange(64 * 256, dtype=jnp.float32).reshape(64, 256)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = jax.jit(f)(x, jnp.array([77], jnp.int32))
    ok = np.allclose(np.asarray(y), np.asarray(x)[:, 77:81])
    return f"dyn col slice ok={ok}"

run("dynamic lane slice (cols)", t_dyncol)


def t_dyncol_write():
    def k(x_ref, i_ref, o_ref):
        i = i_ref[0]
        o_ref[:] = x_ref[:]
        o_ref[:, pl.ds(i, 4)] = jnp.full((64, 4), -1.0, jnp.float32)
    x = jnp.arange(64 * 256, dtype=jnp.float32).reshape(64, 256)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    y = jax.jit(f)(x, jnp.array([77], jnp.int32))
    ok = np.allclose(np.asarray(y)[:, 77:81], -1.0) and \
        np.allclose(np.asarray(y)[:, 81:], np.asarray(x)[:, 81:])
    return f"dyn col write ok={ok}"

run("dynamic lane write (cols)", t_dyncol_write)


def t_scalar_read():
    def k(x_ref, ij_ref, o_ref):
        i = ij_ref[0]
        j = ij_ref[1]
        o_ref[0] = x_ref[i, j]
    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    y = jax.jit(f)(x, jnp.array([13, 77], jnp.int32))
    return f"scalar dyn read = {float(y[0])} (expect {13 * 128 + 77})"

run("scalar dynamic read", t_scalar_read)


# ---- 4. control flow ------------------------------------------------------
def t_controlflow():
    def k(x_ref, o_ref):
        def body(st):
            i, acc = st
            acc = jax.lax.cond(i % 2 == 0, lambda a: a + x_ref[0, 0],
                               lambda a: a * 1.5, acc)
            return i + 1, acc
        def cnd(st):
            return st[0] < 10
        _, acc = jax.lax.while_loop(cnd, body, (jnp.int32(0), jnp.float32(0)))
        o_ref[0] = acc
    x = jnp.ones((8, 128), jnp.float32)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))
    y = jax.jit(f)(x)
    return f"while+cond result = {float(y[0])}"

run("while_loop + cond in kernel", t_controlflow)


# ---- 5. VMEM capacity -----------------------------------------------------
def t_vmem(mb):
    n_el = mb * 1024 * 1024 // 4
    rows = n_el // 512
    def k(x_ref, o_ref, scratch):
        scratch[:] = jnp.zeros_like(scratch)
        scratch[0, :] = x_ref[0, :]
        o_ref[:] = scratch[0:8, 0:128] + 1.0
    x = jnp.ones((8, 512), jnp.float32)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 512), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((mb + 8) * 1024 * 1024)),
    )
    y = jax.jit(f)(x)
    return float(y[0, 0])

for mb in (16, 32, 48, 64, 80, 96, 112, 120):
    r = run(f"VMEM scratch {mb}MB", lambda mb=mb: t_vmem(mb))
    if r is None:
        break


# ---- 6. io aliasing -------------------------------------------------------
def t_alias():
    def k(x_ref, o_ref):
        o_ref[0, :] = o_ref[0, :] + 1.0
    x = jnp.zeros((8, 128), jnp.float32)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0})
    y = jax.jit(f)(x)
    return f"alias out[0,0]={float(y[0, 0])}"

run("input_output_aliases", t_alias)


# ---- 7. chase-like loop timing --------------------------------------------
def t_chase_timing(n=512, p=16, steps=512):
    """Per-step: p x (3 rows read+GEMM-3x3+write, (n,4) col read+write)."""
    def k(h_ref, o_ref):
        def step(kk, _):
            def fac(f, _):
                rows = h_ref[f, pl.ds(kk, 3), :]        # (3, n)
                m = rows[:, 0:3] + 1.0                   # fake 3x3
                nr = (m[:, 0:1] * rows + m[:, 1:2] * rows + m[:, 2:3] * rows)
                h_ref[f, pl.ds(kk, 3), :] = nr
                cols = h_ref[f, :, pl.ds(kk, 4)]         # (n, 4)
                h_ref[f, :, pl.ds(kk, 4)] = cols * 1.000001
                return 0
            jax.lax.fori_loop(0, p, fac, 0)
            return 0
        jax.lax.fori_loop(0, steps - 4, step, 0)
        o_ref[0, 0] = h_ref[0, 0, 0]
    h = jnp.ones((p, n, n), jnp.float32)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(f)
    y = g(h)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(3):
        y = g(h)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / 3
    per_step = dt / (steps - 4) / p
    return f"sweep {dt*1e3:.2f}ms total, {per_step*1e9:.0f}ns per (step,factor)"

run("chase-like loop timing n=512 p=16", t_chase_timing)
print("probe done")
