"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths run without TPU hardware (the fake-backend capability the
reference lacks, SURVEY.md §4).

The container's sitecustomize imports jax and bakes JAX_PLATFORMS=axon into
jax.config at interpreter startup, so plain env vars are too late here —
jax.config.update before first backend init is the reliable override.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
