"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths run without TPU hardware (the fake-backend capability the
reference lacks, SURVEY.md §4).

The container's sitecustomize imports jax and bakes JAX_PLATFORMS=axon into
jax.config at interpreter startup, so plain env vars are too late here —
jax.config.update before first backend init is the reliable override.

Wall-time controls (VERDICT r1 item 9):
- XLA backend optimization level 0: tests are tiny-shape compile-bound;
  skipping XLA's optimization passes cuts compile ~1.6x without changing
  semantics.
- persistent compile cache under /tmp (host-local — CPU AOT artifacts are
  host-arch-specific, so the cache must not travel with the repo): repeat
  runs skip compilation entirely.
- the heaviest e2e tests carry @pytest.mark.slow and are deselected by
  default (pyproject addopts); run `pytest -m ""` for the full matrix.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/dsdiff_xla_test_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
