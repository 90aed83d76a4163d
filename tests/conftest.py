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

# Build the native tokenizer extension up front so the C++ path gets routine
# coverage (fresh checkouts otherwise run pure-Python and skip
# tests/test_native.py). build_ext is incremental — a no-op when the .so is
# newer than native/fadertok.cc — and any failure (no compiler) just leaves
# the pure-Python fallback in place. Runs BEFORE anything imports
# music_fader_nets_tpu.native, whose HAVE_NATIVE is probed at import time.
if os.environ.get("FADERNETS_NO_NATIVE") != "1":
    import subprocess  # noqa: E402
    import sys  # noqa: E402

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_repo, capture_output=True, timeout=600, check=False)
    except Exception:
        pass
