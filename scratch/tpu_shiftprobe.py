import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.hessenberg_ff import phessenberg_core_ff
from periodicschurdecompositions_jl_tpu.ops.pqr_real import _band_products

p, n = 16, 512
tpu = jax.devices()[0]
cpu = jax.devices("cpu")[0]
rng = np.random.default_rng(0)
A0 = rng.standard_normal((p, n, n))
A1 = rng.standard_normal((p, n, n))
f = ff.from_f64(jnp.asarray(A1))
Hhi, Hlo, QThi, QTlo = phessenberg_core_ff(
    jax.device_put(f.hi, tpu), jax.device_put(f.lo, tpu), want_q=False)
Hhi_n = np.asarray(Hhi); Hlo_n = np.asarray(Hlo)
print("reduction done", flush=True)

@jax.jit
def probe(Hhi, Hlo):
    f64 = jnp.float64
    Hd = Hhi.astype(f64) + Hlo.astype(f64)
    hdiag, hsub, hsup = _band_products(Hd, n)
    i = jnp.int32(n - 1)
    lnew = jnp.int32(0)

    def el(v, idx):
        idx = jnp.clip(jnp.asarray(idx, jnp.int32), 0, n - 1)
        return lax.dynamic_slice(v, (idx,), (1,))[0]
    h44 = el(hdiag, i); h33 = el(hdiag, i - 1)
    h43 = el(hsub, i); h34 = el(hsup, i - 1)
    ssh = jnp.abs(h33) + jnp.abs(h34) + jnp.abs(h43) + jnp.abs(h44)
    sshs = jnp.where(ssh == 0, 1.0, ssh)
    h33n, h44n = h33 / sshs, h44 / sshs
    h34n, h43n = h34 / sshs, h43 / sshs
    trc = (h33n + h44n) * 0.5
    disc = (h33n - trc) * (h44n - trc) - h34n * h43n
    rtdisc = jnp.sqrt(jnp.abs(disc))
    r1 = trc + rtdisc; r2 = trc - rtdisc
    pick = jnp.where(jnp.abs(r1 - h44n) <= jnp.abs(r2 - h44n), r1, r2)
    rt1r = jnp.where(ssh == 0, 0.0, jnp.where(disc >= 0, trc * ssh, pick * ssh))
    rt2r = rt1r
    rt1i = jnp.where(ssh == 0, 0.0, jnp.where(disc >= 0, rtdisc * ssh, 0.0))
    rt2i = -rt1i
    m = lnew
    h11 = el(hdiag, m); h12 = el(hsup, m)
    h21 = el(hsub, m + 1); h22 = el(hdiag, m + 1)
    hsub_m2 = el(hsub, m + 2)
    sv = jnp.abs(h11 - rt2r) + jnp.abs(rt2i) + jnp.abs(h21)
    svs = jnp.where(sv == 0, 1.0, sv)
    h21s = h21 / svs
    v1L = h21s * h12 + (h11 - rt1r) * ((h11 - rt2r) / svs) - rt1i * (rt2i / svs)
    v2L = h21s * (h11 + h22 - rt1r - rt2r)
    v3L = h21s * hsub_m2
    snorm = jnp.abs(v1L) + jnp.abs(v2L) + jnp.abs(v3L)
    snorms = jnp.where(snorm == 0, 1.0, snorm)
    v0d = jnp.stack([v1L, v2L, v3L]) / snorms
    v0hi = v0d.astype(jnp.float32)
    return (hdiag, hsub, hsup, jnp.stack([h11, h12, h21, h22, h33, h34, h43,
                                          h44, rt1r, rt1i, sv, ssh]),
            v0d, v0hi)

for name, dev in [("tpu", tpu), ("cpu", cpu)]:
    hd, hs, hp, scal, v0d, v0hi = jax.device_put(jax.jit(probe), dev)(
        jax.device_put(Hhi_n, dev), jax.device_put(Hlo_n, dev)) if False else \
        jax.jit(probe, device=dev)(jax.device_put(jnp.asarray(Hhi_n), dev),
                                   jax.device_put(jnp.asarray(Hlo_n), dev))
    hd = np.asarray(hd); hs = np.asarray(hs); hp = np.asarray(hp)
    print(f"{name}: band NaN/inf: {np.isnan(hd).any() or np.isnan(hs).any()}"
          f"/{np.isinf(hd).any() or np.isinf(hs).any()}"
          f"  |hdiag| max {np.abs(hd).max():.3e}")
    print(f"  scalars: {np.asarray(scal)}")
    print(f"  v0d: {np.asarray(v0d)}  v0hi: {np.asarray(v0hi)}")
