"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path).  float64 is enabled so numeric parity targets (1e-8) are meaningful;
TPU runs use float32/bfloat16 by default.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pre-register an accelerator plugin that prepends itself
# to jax_platforms (e.g. "axon,cpu"); force pure CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
