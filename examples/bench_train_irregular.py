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
exist where every PARTIAL SUM of gap ticks stays below the 24-bit
mantissa limit (2^24 ~ 1.68e7 ticks) -- otherwise far-end timestamps
round and consecutive diffs quantise (to zero in the worst case ->
singular Q1 -> NaN).  Gaps here are {1, 2} ticks of 0.25 (total ~1.5e7
ticks), so every timestamp and every diff is EXACT in f32 while the
grid remains genuinely non-uniform (gap ratio 2x, i.i.d. random).

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
    gaps = rng.randint(1, 3, n) * 0.25  # ~1.5e7 quarter-ticks < 2^24
    ts = jnp.asarray(np.cumsum(gaps), jnp.float32)
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

    # -- loss-TRAJECTORY parity vs the exact blocked filter: 30 Adam
    # steps at N = 1e5 (where the exact filter is affordable) ----------
    steps = 30
    fit_res = train_loop.fit(params, ts_s, xs_s, num_steps=steps,
                             loss="cr_residual", log_every=0)
    fit_kf = train_loop.fit(params, ts_s, xs_s, num_steps=steps,
                            loss="kalman", log_every=0)
    devs = [abs(a - b) / max(abs(b), 1e-12)
            for a, b in zip(fit_res.losses, fit_kf.losses)]
    print(json.dumps({
        "metric": "residual_vs_kalman_trajectory_n1e5_f32",
        "steps": steps,
        "final_residual": round(fit_res.losses[-1], 6),
        "final_kalman": round(fit_kf.losses[-1], 6),
        "max_rel_dev": float(f"{max(devs):.2e}"),
    }), flush=True)


if __name__ == "__main__":
    main()
