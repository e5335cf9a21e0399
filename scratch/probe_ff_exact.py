"""Probe: are the ff EFTs exact on the real TPU, in XLA glue and in Mosaic?"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ffkern import givens_ff

tpu = jax.devices()[0]
print("device:", tpu)

rng = np.random.default_rng(0)
n = 1024
# cancellation-heavy data: pairs of near-equal magnitudes with opposite signs
a64 = rng.standard_normal(n)
b64 = -a64 * (1 + rng.standard_normal(n) * 1e-6)
a = jnp.asarray(a64, jnp.float32)
b = jnp.asarray(b64, jnp.float32)
a64 = np.asarray(a, np.float64)
b64 = np.asarray(b, np.float64)


def report(name, s, e):
    s = np.asarray(s, np.float64)
    e = np.asarray(e, np.float64)
    exact = a64 + b64
    err = np.abs((s + e) - exact).max()
    print(f"{name}: max |(s+e)-(a+b)| = {err:.3e}")


# 1) two_sum under XLA:TPU jit, barriers ON
s, e = jax.jit(ff.two_sum, device=tpu)(a, b)
report("xla two_sum (barriers)", s, e)

# 2) two_sum under XLA:TPU jit, barriers OFF
def ts_nb(a, b):
    with ff.no_barriers():
        return ff.two_sum(a, b)
s, e = jax.jit(ts_nb, device=tpu)(a, b)
report("xla two_sum (no barriers)", s, e)

# 3) two_sum inside a Mosaic kernel, no barriers (as the sweep kernels run)
def kern_nb(a_ref, b_ref, s_ref, e_ref):
    with ff.no_barriers():
        s, e = ff.two_sum(a_ref[:], b_ref[:])
    s_ref[:] = s
    e_ref[:] = e

f = pl.pallas_call(
    kern_nb,
    out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 2,
)
s, e = jax.jit(f, device=tpu)(a, b)
report("mosaic two_sum (no barriers)", s, e)

# 4) two_sum inside a Mosaic kernel, barriers ON (does it even lower?)
def kern_b(a_ref, b_ref, s_ref, e_ref):
    s, e = ff.two_sum(a_ref[:], b_ref[:])
    s_ref[:] = s
    e_ref[:] = e
try:
    f = pl.pallas_call(
        kern_b,
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 2,
    )
    s, e = jax.jit(f, device=tpu)(a, b)
    report("mosaic two_sum (barriers)", s, e)
except Exception as ex:
    print("mosaic two_sum (barriers): FAILED to lower:", str(ex)[:200])

# 5) two_prod in Mosaic, no barriers
def kern_tp(a_ref, b_ref, s_ref, e_ref):
    with ff.no_barriers():
        s, e = ff.two_prod(a_ref[:], b_ref[:])
    s_ref[:] = s
    e_ref[:] = e
f = pl.pallas_call(
    kern_tp, out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 2)
s, e = jax.jit(f, device=tpu)(a, b)
s = np.asarray(s, np.float64); e = np.asarray(e, np.float64)
exact = a64 * b64
print(f"mosaic two_prod (no barriers): max err = {np.abs(s+e-exact).max():.3e}")

# 6) givens_ff in Mosaic vs host f64 givens
x64 = rng.standard_normal(n)
y64 = rng.standard_normal(n)
xf = ff.from_f64(jnp.asarray(x64))
yf = ff.from_f64(jnp.asarray(y64))

def kern_g(xh, xl, yh, yl, ch, cl, sh, sl, rh, rl):
    with ff.no_barriers():
        c, s, r = givens_ff(ff.FF(xh[:], xl[:]), ff.FF(yh[:], yl[:]))
    ch[:], cl[:] = c.hi, c.lo
    sh[:], sl[:] = s.hi, s.lo
    rh[:], rl[:] = r.hi, r.lo

f = pl.pallas_call(
    kern_g, out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 6)
outs = jax.jit(f, device=tpu)(xf.hi, xf.lo, yf.hi, yf.lo)
c = np.asarray(outs[0], np.float64) + np.asarray(outs[1], np.float64)
s = np.asarray(outs[2], np.float64) + np.asarray(outs[3], np.float64)
x64v = np.asarray(xf.hi, np.float64) + np.asarray(xf.lo, np.float64)
y64v = np.asarray(yf.hi, np.float64) + np.asarray(yf.lo, np.float64)
r0 = np.hypot(x64v, y64v)
print(f"mosaic givens_ff: max |c - x/r| = {np.abs(c - x64v/r0).max():.3e}, "
      f"max |s - y/r| = {np.abs(s - y64v/r0).max():.3e}, "
      f"max |c^2+s^2-1| = {np.abs(c*c+s*s-1).max():.3e}")
