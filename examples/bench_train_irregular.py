"""f32 training at N = 10^7 on an IRREGULAR grid (VERDICT r3 #3).

The exact blocked Kalman filter costs 44.6 s/step at this size (its
per-element pivoted-LU combines); the steady-state path needs a uniform
grid.  The f32-safe residual-form precision likelihood
(`leg.log_likelihood_residual`, loss "cr_residual" -- variational
residual mahalanobis + per-row-paired log-determinants) runs the
partitioned engine instead, so the irregular-grid train step lands at
partitioned-engine speed.  Reference analog: the N = 10^7 scaling story,
kalman_timing_script.py:25-27 -- the reference has no answer at this
scale on ANY grid.

Fixture note (f32 time resolution): 10^7 distinct f32 timestamps only
exist where consecutive gaps stay above the local ULP.  The gaps here
are random multiples of 2^-3 with ts_max < 2^21, so every timestamp and
every diff is EXACT in f32 (integer grid below the 24-bit mantissa
limit) while the grid remains genuinely non-uniform (gap ratio 4x).

Usage: python examples/bench_train_irregular.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from cyclic_gps_tpu.models import leg
    from cyclic_gps_tpu.train import loop as train_loop
    from cyclic_gps_tpu.utils.profiling import timed

    rank, obs = 3, 1
    rng = np.random.RandomState(0)

    # -- parity gate at N = 1e5: residual form vs the exact blocked
    # filter (both f32, same data) ------------------------------------
    n_small = 100_000
    gaps = rng.randint(1, 5, n_small) * 0.125  # {0.125..0.5}, exact in f32
    ts_s = jnp.asarray(np.cumsum(gaps), jnp.float32)
    xs_s = jnp.asarray(rng.randn(n_small, obs), jnp.float32)
    params = leg.init_params(jax.random.key(0), rank=rank, obs_dim=obs,
                             dtype=jnp.float32)
    l_res = float(train_loop.nll_loss_residual(params, ts_s, xs_s))
    l_kf = float(train_loop.nll_loss_kalman(params, ts_s, xs_s))
    rel = abs(l_res - l_kf) / abs(l_kf)
    print(json.dumps({
        "metric": "residual_vs_kalman_nll_n1e5_f32",
        "residual": round(l_res, 6), "kalman": round(l_kf, 6),
        "rel_diff": float(f"{rel:.2e}"),
    }), flush=True)

    # -- the headline: one Adam-ready (value, grad) step at N = 1e7 ----
    n = 10_000_000
    gaps = rng.randint(1, 5, n) * 0.125
    ts = jnp.asarray(np.cumsum(gaps), jnp.float32)  # ts_max ~ 3.1e6 < 2^22
    xs = jnp.asarray(rng.randn(n, obs), jnp.float32)

    step = jax.jit(jax.value_and_grad(train_loop.nll_loss_residual))
    t0 = time.time()
    loss, grads = step(params, ts, xs)
    loss = float(loss)
    compile_s = time.time() - t0
    assert np.isfinite(loss), f"non-finite loss {loss}"
    ms = 1e3 * timed(lambda x, t: step(params, t, x)[0], xs, ts, iters=5)
    print(json.dumps({
        "metric": "irregular_f32_train_step_n1e7",
        "value": round(ms, 1), "unit": "ms",
        "loss": round(loss, 6), "compile_s": round(compile_s, 1),
        "vs_exact_blocked_filter_s": 44.6,
    }), flush=True)


if __name__ == "__main__":
    main()
