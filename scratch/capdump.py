import sys; sys.path.insert(0, "/root/repo"); sys.setrecursionlimit(100000)
mode = sys.argv[1]  # cpu | tpu
caps = [int(c) for c in sys.argv[2].split(",")]
import os
if mode == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_disable_hlo_passes=fusion,algsimp"
import numpy as np, jax, jax.numpy as jnp
if mode == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
from periodicschurdecompositions_jl_tpu.ops import ff
from periodicschurdecompositions_jl_tpu.ops.pqr_ff import pqr_real_core_ff

data = np.load("/tmp/capinput.npz")
args = [jnp.asarray(data[k]) for k in ("Hhi", "Hlo", "QThi", "QTlo")]
if mode == "tpu":
    tpu = jax.devices()[0]
    args = [jax.device_put(a, tpu) for a in args]
out = {}
for cap in caps:
    o = pqr_real_core_ff(*args, want_z=True, interpret=(mode == "cpu"),
                         maxiter=cap)
    out[f"T{cap}"] = np.asarray(o[0], np.float64) + np.asarray(o[1], np.float64)
    out[f"Z{cap}"] = np.asarray(o[2], np.float64) + np.asarray(o[3], np.float64)
np.savez(f"/tmp/caps_{mode}.npz", **out)
print("done", mode)
