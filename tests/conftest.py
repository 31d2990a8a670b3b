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


@pytest.fixture
def no_persistent_cache_writes():
    """Block persistent-compilation-cache WRITES around one test.

    Writing certain large train-step executables to the on-disk cache
    MID-SUITE aborts the process inside XLA:CPU serialization
    (put_executable_and_time -> Fatal Python error: Aborted); the same
    test run standalone writes the same entries fine, so the failure
    depends on accumulated in-process state, not the program.

    Mechanism: `_cache_write` re-reads
    ``persistent_cache_min_compile_time_secs`` on every compile and
    checks it BEFORE serializing, so raising it to infinity suppresses
    exactly the crashing step while cache READS keep working (warm
    reruns stay fast).  Note flipping ``jax_compilation_cache_dir``
    instead disables reads but NOT writes (the write path uses a
    one-time-latched module singleton) -- the worst of both."""
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def fresh_executable_state():
    """Release accumulated compiled executables BEFORE a test.

    XLA:CPU compilation itself can SIGSEGV late in a large module
    (backend_compile_and_load with many executables resident -- the
    same failure mode the module-scoped clear below guards against,
    observed WITHIN tests/test_batched.py once it grew past ~15 heavy
    tests).  Tests observed to hit it request this fixture to start
    from a standalone-like state."""
    jax.clear_caches()
    yield


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches():
    """Release compiled executables between test modules.

    The suite compiles hundreds of large unrolled programs at float64;
    letting them accumulate in one process has crashed the CPU runtime
    (SIGSEGV late in the run).  The persistent on-disk cache keeps reruns
    fast despite the in-memory clear."""
    yield
    jax.clear_caches()
