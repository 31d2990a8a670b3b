"""Timing sweep: Kalman vs block-tridiagonal engines, N = 10^1 .. 10^7.

The reference's headline benchmark machinery (kalman_timing_script.py):
wall-clock for {KF posterior, CR posterior, KF likelihood, CR likelihood}
with exactness asserts between the smoother and the CR posterior.  Here the
comparison is between the sequential-scan Kalman baseline, the parallel
(associative-scan) Kalman, and the partitioned block-Thomas engine, on the
accelerator, with relay-safe timing (host-read sync, in-jit iteration).

Emits one JSON line per (N, op).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.baselines import kalman
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import partitioned as ptn

RANK = 2
OBS_DIM = 2
SIZES = [10**2, 10**4, 10**6, 10**7]
DTYPE = jnp.float32


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # host-read sync on a scalar derived from the output
    leaves = jax.tree.leaves(out)
    scalarize = jax.jit(lambda *xs: sum(jnp.sum(x) for x in xs))
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(scalarize(*jax.tree.leaves(fn(*args))))
        times.append(time.time() - t0)
    return float(np.min(times))


def main():
    params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=OBS_DIM,
                             dtype=DTYPE)
    for n in SIZES:
        ts = jnp.cumsum(jnp.ones(n, dtype=DTYPE))
        ssm = kalman.leg_to_ssm(params, ts)
        zs = kalman.sample_states(ssm, jax.random.key(1))
        xs = zs @ params.b.T + 0.1 * jax.random.normal(
            jax.random.key(2), (n, OBS_DIM), dtype=DTYPE
        )

        k_diag, k_off = leg.posterior_precision(params, ts)
        v = leg.compute_v(params, xs)

        results = {}
        results["pt_posterior_mean"] = timed(
            lambda: ptn.solve(k_diag, k_off, v)
        )
        results["pt_loglik"] = timed(
            lambda: leg.log_likelihood(params, ts, xs)
        )
        if n <= 10**4:
            results["kf_seq_smoother"] = timed(
                lambda: kalman.smooth_sequential(ssm, xs)
            )
            results["kf_par_smoother"] = timed(
                lambda: kalman.smooth_parallel(ssm, xs)
            )
            results["kf_seq_loglik"] = timed(
                lambda: kalman.log_likelihood_sequential(ssm, xs)
            )

        # exactness: posterior mean == smoothed states (regular grid)
        if n <= 10**4:
            mean = ptn.solve(k_diag, k_off, v)
            sm, _ = kalman.smooth_sequential(ssm, xs)
            err = float(jnp.abs(mean - sm).max())
            assert err < 1e-2, err  # f32 tolerance
            results["posterior_vs_smoother_maxerr"] = err

        for op, seconds in results.items():
            print(json.dumps({"n": n, "op": op, "ms": round(seconds * 1e3, 3)}))


if __name__ == "__main__":
    main()
