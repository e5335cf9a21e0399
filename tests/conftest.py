import os
import sys

# Tests run on a virtual 8-device CPU mesh: exactness (x64) + sharding tests
# without TPU hardware.  Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU applies float-value-changing rewrites that destroy the
# error-free transformations of the float-float layer (ops/ff.py): the
# fusion emitter FMA-contracts mul+add chains, and the algebraic
# simplifier cancels (1+x)-1-style patterns.  Disabling both restores
# IEEE op-by-op semantics for the ds tests.  The TPU compilers (XLA:TPU
# and Mosaic) are verified exact unmodified, so this is CPU-test-only.
if "xla_disable_hlo_passes" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=fusion,algsimp").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin registers itself as default even when JAX_PLATFORMS=cpu;
# pin the default device explicitly so tests run on (8 virtual) CPU devices
# with exact float64.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
