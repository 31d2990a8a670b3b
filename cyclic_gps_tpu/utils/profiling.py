"""Profiling / timing / debugging utilities.

The reference's only observability is manual time.time() spans
(kalman_timing_script.py:42-64).  Here:

* `timed`: relay-safe wall-clock timing (this rig's PJRT relay caches
  identical calls and `block_until_ready` can return early, so iterations
  run inside one jit with an input perturbation and sync via a host read).
* `trace`: context manager around jax.profiler for on-device traces.
* `nan_guard`: context manager enabling jax's debug-nans mode -- the
  moral equivalent of the reference's psd_safe_cholesky error surface
  (cyclic_reduction.py:7-8): CR's failure mode is a non-PSD Schur
  complement, which surfaces as a NaN from sqrt.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn: Callable, *args, iters: int = 10, repeats: int = 3) -> float:
    """Median per-iteration seconds of ``fn(*args)``.

    ``fn``'s first argument must be an array; it is perturbed per
    iteration so a caching runtime cannot elide the work.
    """
    first, rest = args[0], args[1:]

    @jax.jit
    def loop(x0, c):
        def body(i, acc):
            out = fn(x0 * (c + 1e-9 * i.astype(x0.dtype)), *rest)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l) * 0 + jnp.ravel(l)[0]
                             for l in leaves)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), x0.dtype))

    float(loop(first, 1.0))  # compile + warm
    times = []
    for i in range(repeats):
        t0 = time.time()
        float(loop(first, 1.0 + i * 1e-6))
        times.append((time.time() - t0) / iters)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler device trace (view with tensorboard or
    xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard():
    """Raise on the first NaN produced inside the block (debug mode)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
