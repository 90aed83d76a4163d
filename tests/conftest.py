"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding (dp x tp mesh) is exercised without TPU hardware.

NB: the TPU plugin in this environment ignores the JAX_PLATFORMS env var, so
the platform must be forced via jax.config BEFORE any backend initialization.
Matmul precision is pinned to 'highest' so numerical-parity tests against
torch hold regardless of backend defaults.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
