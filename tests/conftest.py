"""Test configuration.

Parity tests run at float64 against dense CPU oracles (matching the
reference's torch.allclose contracts), so tests force the CPU backend with
x64 enabled and expose an 8-device virtual mesh for the multi-chip sharding
tests.  Benchmarks and examples use the real TPU at float32.

Note: this environment pre-registers a TPU PJRT plugin at interpreter
startup, so the backend must be forced via jax.config (env vars are read
too early to help).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the unrolled CR graphs are expensive to
# compile (tens of seconds each on CPU); cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches():
    """Release compiled executables between test modules.

    The suite compiles hundreds of large unrolled programs at float64;
    letting them accumulate in one process has crashed the CPU runtime
    (SIGSEGV late in the run).  The persistent on-disk cache keeps reruns
    fast despite the in-memory clear."""
    yield
    jax.clear_caches()
