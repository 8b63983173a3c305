"""Test harness: run JAX on a virtual 8-device CPU mesh with float64 enabled.

Mirrors the multi-host test strategy from SURVEY.md section 4: sharding is
validated on ``xla_force_host_platform_device_count`` virtual devices so the
suite runs anywhere; the real-chip path is exercised by bench.py.

NB this machine's axon site hook forces ``JAX_PLATFORMS=axon`` (the tunneled
TPU); the env var is overridden, so CPU must be selected through
``jax.config`` after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
