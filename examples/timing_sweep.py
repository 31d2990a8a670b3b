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
SIZES = [int(float(a)) for a in _sys.argv[1:]] or [10**2, 10**4, 10**6,
                                                  10**7]
KF_MAX = 10**4  # sequential/parallel smoother comparison sizes
SMOOTHER_MAX = 10**6  # f32 smoother-route posterior (OOMs beyond)
DTYPE = jnp.float32
ITERS = 50  # K=50 in-jit iterations (round-2 methodology; iters=5 carried ~6 ms
            # of fixed relay latency per number -- VERDICT r3 weak #6)


def main():
    ops_filter = _os.environ.get("TIMING_OPS")
    ops_filter = set(ops_filter.split(",")) if ops_filter else None

    params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=OBS_DIM,
                             dtype=DTYPE)
    for n in SIZES:
        ts = jnp.cumsum(jnp.ones(n, dtype=DTYPE))
        xs = 0.5 * jax.random.normal(jax.random.key(2), (n, OBS_DIM),
                                     dtype=DTYPE)

        def run(op, fn, *args):
            # one JSON line per op, printed IMMEDIATELY (a TPU-worker
            # crash mid-sweep must not lose completed rows); TIMING_OPS
            # env (comma-separated) restricts to a subset for the
            # crash-isolating one-op-per-process driver
            if ops_filter is not None and op not in ops_filter:
                return
            try:
                seconds = timed(fn, *args, iters=ITERS)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({"n": n, "op": op,
                                  "error": str(e)[:120]}), flush=True)
                raise SystemExit(1)  # worker likely dead: stop cleanly
            print(json.dumps({"n": n, "op": op,
                              "ms": round(seconds * 1e3, 3)}), flush=True)

        # the partitioned-engine route (f64's default; at f32 it is the
        # raw engine benchmark -- production f32 "auto" routes through the
        # smoother, timed separately below)
        run("pt_posterior_mean",
            lambda x: leg.posterior_mean(params, ts, x, regular=True,
                                         method="precision"), xs)
        if n <= SMOOTHER_MAX:
            # blocked parallel smoother (kalman.SMOOTHER_BLOCK) beyond
            # the flat-scan cap
            run("smoother_posterior_mean",
                lambda x: leg.posterior_mean(params, ts, x, regular=True,
                                             method="smoother"), xs)
        run("pt_loglik",
            lambda x: leg.log_likelihood(params, ts, x, regular=True), xs)
        # IRREGULAR grid (the fused K-system kernel path on TPU f32)
        rng = np.random.RandomState(3)
        ts_irr = jnp.asarray(
            np.cumsum(rng.randint(1, 5, n) * 0.25), DTYPE)
        run("pt_loglik_irregular",
            lambda x: leg.log_likelihood(params, ts_irr, x), xs)
        if n >= 10**4:
            # STACKED multi-series: B = n / 1000 series x 1000 points
            # as ONE masked block-tridiagonal system
            b = n // 1000
            ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), 1000)
            run("pt_loglik_stacked",
                lambda x: leg.log_likelihood_stacked(params, ts_irr, x,
                                                     ids), xs)
        if n <= KF_MAX:
            ssm = kalman.leg_to_ssm(params, ts)
            run("kf_seq_smoother",
                lambda x: kalman.smooth_sequential(ssm, x), xs)
            run("kf_par_smoother",
                lambda x: kalman.smooth_parallel(ssm, x), xs)
            run("kf_seq_loglik",
                lambda x: kalman.log_likelihood_sequential(ssm, x), xs)
            if ops_filter is None or "posterior_vs_smoother_maxerr" in \
                    ops_filter:
                # exactness: posterior mean == smoothed states
                mean = leg.posterior_mean(params, ts, xs, regular=True)
                sm, _ = kalman.smooth_sequential(ssm, xs)
                err = float(jnp.abs(mean - sm).max())
                assert err < 1e-2, err  # f32 tolerance
                print(json.dumps({"n": n,
                                  "op": "posterior_vs_smoother_maxerr",
                                  "maxerr": err}), flush=True)


if __name__ == "__main__":
    main()
