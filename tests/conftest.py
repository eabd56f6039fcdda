"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path).  float64 is enabled so numeric parity targets (1e-8) are meaningful;
TPU runs use float32/bfloat16 by default.
"""

import os
import resource

# XLA:CPU compile passes recurse deeply on large scan graphs; glibc sizes
# new (compiler) thread stacks from RLIMIT_STACK, and the default 8 MB can
# segfault nondeterministically on the biggest estimation programs.  Raise
# it before JAX spawns any threads.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pre-register an accelerator plugin that prepends itself
# to jax_platforms (e.g. "axon,cpu"); force pure CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A single pytest process accumulates hundreds of XLA:CPU executables
    across the suite; the largest late compiles (pooled-NUTS warmup scans)
    have been observed to segfault inside backend_compile under that
    state, while the same test passes standalone.  Sympy lowering caches
    (`codegen.lower._FN_CACHE`) survive, so only jit re-tracing is paid.
    """
    yield
    jax.clear_caches()
