"""Test configuration: force a virtual 8-device CPU mesh so sharding and
collective paths are exercised without a TPU pod (SURVEY.md §4: multi-chip
tests via ``xla_force_host_platform_device_count``).

Note: the environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (single remote TPU), so we must override via
``jax.config`` rather than env vars.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compilation cache in tests: serializing the large MSM /
# quotient executables for the cache segfaults nondeterministically in
# long-lived CPU test processes (zstd/AOT-serialize crashes observed
# 2026-08-17 in both put_ and get_executable_and_time). The cache saved
# ~2 min on the fast tier — not worth flaky hard crashes. Opt back in
# locally with ZKFHE_TEST_CACHE=1.
if os.environ.get("ZKFHE_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/zkfhe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
