"""Replay the corrupting sweep (iteration 55: window [0, 8]) in isolation."""
import sys
sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.ff import FF
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep import chase_sweep_ff

Hp = np.load("/tmp/claude-0/Hp_K54.npy")   # (p, n, n) unscrubbed, unpadded
p, n, _ = Hp.shape
N = n + 1
print("state:", Hp.shape)

# band products in f64 (same recurrence as the core)
def band(H):
    P1 = np.ones(n); P2 = np.zeros(n); P3 = np.zeros(n)
    for l in range(1, p):
        D = np.diagonal(H[l]).copy()
        U = np.append(np.diagonal(H[l], 1), 0.0)
        V = np.append(np.diagonal(H[l], 2), [0.0, 0.0])
        D1 = np.append(D[1:], 0.0)
        U1 = np.append(U[1:], 0.0)
        D2 = np.append(D[2:], [0.0, 0.0])
        P3 = P1 * V + P2 * U1 + P3 * D2
        P2 = P1 * U + P2 * D1
        P1 = P1 * D
    d0 = np.diagonal(H[0]).copy()
    u0 = np.append(np.diagonal(H[0], 1), 0.0)
    s0 = np.concatenate([[0.0], np.diagonal(H[0], -1)])
    P1m = np.concatenate([[1.0], P1[:-1]])
    P2m = np.concatenate([[0.0], P2[:-1]])
    P3m = np.concatenate([[0.0], P3[:-1]])
    hsub = s0 * P1m
    hdiag = s0 * P2m + d0 * P1
    P11 = np.append(P1[1:], 0.0)
    hsup = s0 * P3m + d0 * P2 + u0 * P11
    return hdiag, hsub, hsup

hdiag, hsub, hsup = band(Hp)
m, i = 0, 8
h44, h33 = hdiag[i], hdiag[i - 1]
h43, h34 = hsub[i], hsup[i - 1]
ssh = abs(h33) + abs(h34) + abs(h43) + abs(h44)
h33n, h44n, h34n, h43n = h33 / ssh, h44 / ssh, h34 / ssh, h43 / ssh
trc = (h33n + h44n) * 0.5
disc = (h33n - trc) * (h44n - trc) - h34n * h43n
rtd = np.sqrt(abs(disc))
if disc >= 0:
    rt1r = trc * ssh; rt1i = rtd * ssh
else:
    r1, r2 = trc + rtd, trc - rtd
    pick = r1 if abs(r1 - h44n) <= abs(r2 - h44n) else r2
    rt1r = pick * ssh; rt1i = 0.0
rt2r, rt2i = rt1r, -rt1i
h11, h12 = hdiag[m], hsup[m]
h21, h22 = hsub[m + 1], hdiag[m + 1]
sv = abs(h11 - rt2r) + abs(rt2i) + abs(h21)
h21s = h21 / sv
v1 = h21s * h12 + (h11 - rt1r) * ((h11 - rt2r) / sv) - rt1i * (rt2i / sv)
v2 = h21s * (h11 + h22 - rt1r - rt2r)
v3 = h21s * hsub[m + 2]
sn = abs(v1) + abs(v2) + abs(v3)
v0 = np.array([v1, v2, v3]) / sn
print("v0:", v0, " window hsub[l..i]:", hsub[m:i + 1])

def pad(x):
    out = np.zeros((p, N, N), x.dtype)
    out[:, :n, :n] = x
    return out

Hff = ff.from_f64(jnp.asarray(pad(Hp)))
eye = pad(np.broadcast_to(np.eye(n), (p, n, n)).copy())
ZT = FF(jnp.asarray(eye, jnp.float32), jnp.zeros((p, N, N), jnp.float32))
v0f = ff.from_f64(jnp.asarray(v0))

for (mm, ii) in [(m, i), (0, 4), (4, 8), (0, 6), (2, 8), (6, 8), (5, 8)]:
    Hn, ZTn = chase_sweep_ff(Hff, ZT, jnp.int32(mm), jnp.int32(ii), v0f,
                             want_z=True, interpret=True)
    Zv = np.swapaxes(np.asarray(ZTn.hi, np.float64) +
                     np.asarray(ZTn.lo, np.float64), 1, 2)[:, :n, :n]
    orths = [np.abs(Zv[f] @ Zv[f].T - np.eye(n)).max() for f in range(p)]
    print(f"sweep m={mm} i={ii}: orth {['%.1e' % o for o in orths]}")

# --- inspect the logged right-transforms of the bad sweep ---------------
from periodicschurdecompositions_jl_tpu.ops.pallas_sweep import _sweep_call
scal = jnp.asarray([0, 8], jnp.int32)
v0f32 = jnp.concatenate([v0f.hi, v0f.lo]).astype(jnp.float32)
with ff.no_barriers():
    Hhi, Hlo, R0, R1 = _sweep_call(p, N, True)(scal, v0f32, Hff.hi, Hff.lo)
R0 = np.asarray(R0, np.float64)  # (p, N, 18): 3x3 hi | lo
R1 = np.asarray(R1, np.float64)  # (p, N, 8): 2x2 hi | lo
for k in range(0, 8):
    for f in range(p):
        M3 = R0[f, k, :9].reshape(3, 3) + R0[f, k, 9:].reshape(3, 3)
        e3 = np.abs(M3 @ M3.T - np.eye(3)).max()
        M2 = R1[f, k, :4].reshape(2, 2) + R1[f, k, 4:].reshape(2, 2)
        e2 = np.abs(M2 @ M2.T - np.eye(2)).max()
        if e3 > 1e-12 or e2 > 1e-12:
            print(f"k={k} f={f}: R0 orth err {e3:.2e}, R1 orth err {e2:.2e}")
            if e3 > 1e-12:
                print("  M3 =", M3.tolist())
