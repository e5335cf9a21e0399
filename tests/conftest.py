import os
import resource
import sys

# Deep jax tracing recursion (pallas_sweep raises the Python recursion limit
# to 20000) can exceed the default 8 MiB main-thread C stack during XLA
# compiles late in long suite runs (observed: segfault inside
# backend_compile_and_load around the 43% mark).  The main stack grows up to
# RLIMIT_STACK on Linux, so raise the soft limit up front.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 1 << 26  # 64 MiB
    if _hard == resource.RLIM_INFINITY or _hard >= _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except (ValueError, OSError):
    pass

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

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin registers itself (via sitecustomize) as default even
# when JAX_PLATFORMS=cpu, and its backend INITIALIZATION blocks indefinitely
# when the chip tunnel is down — which would hang the whole (CPU-only) test
# suite.  Registration has happened by the time conftest runs, but
# initialization is lazy: drop the factory before any backend is built so
# tests never touch the tunnel.  Bench/on-chip probes run in separate
# processes and are unaffected.
from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)
# register() also writes jax.config jax_platforms="axon,cpu", which overrides
# the env var; put it back to cpu-only.
jax.config.update("jax_platforms", "cpu")

# Pin the default device explicitly so tests run on (8 virtual) CPU devices
# with exact float64.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    With fusion disabled (required for exact EFT semantics of the ds
    tests) every compile JITs thousands of tiny LLVM functions; across a
    full-suite process the accumulated code allocations eventually crash
    the XLA:CPU compiler itself (segfault inside backend_compile_and_load
    ~45 min in, at whichever compile is active).  Dropping the caches
    between modules keeps the process footprint bounded; within a module
    the cache still amortizes recompiles.
    """
    yield
    jax.clear_caches()
