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


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 #9).  The full f64 CPU suite costs 1:45 h warm
# (one core, hundreds of large unrolled executables), so two cheaper
# gates are published:
#
#   python -m pytest tests/ -m smoke -q        (~3-4 min warm)
#   python -m pytest tests/ -m "not slow" -q   (~30 min warm)
#
# `smoke` is a curated allowlist covering one oracle per engine -- CR
# (permuted-Cholesky identity + closed forms), partitioned, the Pallas
# kernels in interpret mode, the sharded layer, stacked batching,
# celerite, and the triple likelihood parity -- enough to catch a broken
# engine in-session.  `slow` marks the >= 60 s tests (measured,
# --durations from the round-4 full run); exclusion alone cannot reach
# 5 min because the sub-10 s tail already sums past it, hence the
# allowlist tier.  Markers declared in pytest.ini.
# ---------------------------------------------------------------------------

_SMOKE_MODULES = {
    "test_cyclic_reduction.py",  # L0 oracle: CR == permuted Cholesky
    "test_matrices.py",          # closed-form known matrices
    "test_partitioned.py",       # partitioned-engine parity vs CR
    "test_data.py",              # loaders / synthetic data
}
_SMOKE_TESTS = {
    # triple likelihood parity (regular + irregular), small fixture
    "test_log_marginal_likelihood[2-33-regular]",
    "test_log_marginal_likelihood[2-33-irregular]",
    # pallas kernels, interpret mode
    "test_pallas_sweep_matches_scan[0.0]",
    "test_pallas_solve_matches_xla[256]",
    "test_transition_and_noise_pallas_matches_xla",
    # stacked batching / sharded layer / celerite family
    "test_stacked_gradient_equals_sum",
    "test_seq_sharded_mahal_and_logdet[256-partitioned]",
    "test_likelihood_matches_expanded_leg",
}
_SLOW_TESTS = {
    # >= 60 s each in the round-4 full run (warm persistent cache)
    "test_f32_end_to_end_train_predict",
    "test_blocked_loglik_value_and_gradient",
    "test_stacked_kalman_matches_precision",
    "test_posterior_comparison_end_to_end",
    "test_wide_solve_gradient",
    "test_fit_example_end_to_end",
    "test_blocked_filter_smoother_match_flat",
    "test_posterior_method_routing",
    "test_seq_sharded_posterior_matches_single_device",
    "test_seq_sharded_stacked_matches_single_device",
    "test_leg_family_facade",
    "test_wide_mahal_gradient",
    "test_gap_fused_likelihood_matches_xla",
    "test_wide_solve_matches_xla[12-90-0.001]",
    "test_data_parallel_training",
    "test_lbfgs_training_decreases_nll",
    "test_wide_inverse_matches_xla[12-90-0.001]",
    "test_wide_mahal_matches_xla[12-90-0.001]",
    "test_adam_training_decreases_nll",
    "test_seq_sharded_pallas_backend_loglik_grad",
    "test_seq_sharded_per_series_matches_single_device",
    "test_seq_sharded_per_series_pallas_backend",
    "test_log_marginal_likelihood[3-150-regular]",
    "test_wide_solve_matches_xla[9-96-0.0]",
    "test_wide_inverse_matches_xla[9-96-0.0]",
    "test_steady_state_likelihood_matches_filter",
    "test_stacked_gap_mask_pallas_parity",
    "test_log_marginal_likelihood[3-100-regular]",
    "test_k_system_pallas_matches_xla",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.fspath.basename
        if module in _SMOKE_MODULES or item.name in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
        if item.name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches():
    """Release compiled executables between test modules.

    The suite compiles hundreds of large unrolled programs at float64;
    letting them accumulate in one process has crashed the CPU runtime
    (SIGSEGV late in the run).  The persistent on-disk cache keeps reruns
    fast despite the in-memory clear."""
    yield
    jax.clear_caches()
