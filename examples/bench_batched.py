"""Batched multi-series likelihood benchmark (the stacked entry).

B = 1000 independent series x n = 1000 points (N_total = 1e6), rank 5,
f32, on the attached TPU.  Three routes:

* stacked, regular grids: `leg.log_likelihood_batch(regular=True)` --
  the whole batch emission is ONE matrix exponential + broadcasts, then
  a single partitioned/Pallas solve over the block-diagonal K.
* stacked, irregular grids: per-gap emission through the fused K-system
  Pallas kernel (the boundary mask rides the kernel's gap_valid input).
* per-series `lax.map`: the reference-style one-series-at-a-time loop
  (cunningham-lab/cyclic-gps can only do this; data_utils.py:73-75) --
  1000 sequential small solves, each padding its 32 chunks to the
  512-wide kernel tile.

Plus one stacked f32 train step (Adam, value_and_grad through the
analytic solver VJPs).

Usage: python examples/bench_batched.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


B, NB, RANK, OBS = 1000, 1000, 5, 2


def main():
    import optax

    from cyclic_gps_tpu.models import leg
    from cyclic_gps_tpu.train import loop as train_loop
    from cyclic_gps_tpu.utils.profiling import timed

    rng = np.random.RandomState(0)
    params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=OBS,
                             dtype=jnp.float32)
    xs_b = jnp.asarray(rng.randn(B, NB, OBS), jnp.float32)

    # regular per-series grids, random offsets (min gap 0.01 >> f32 ULP
    # at ts <= ~60 -- see bench_irregular.py's resolution note)
    dt = 0.01
    ts_reg = jnp.asarray(
        rng.rand(B, 1) * 50.0 + dt * np.arange(NB)[None, :], jnp.float32
    )
    # irregular: per-series cumsum of exponential gaps, same mean
    gaps = (rng.exponential(1.0, (B, NB)) + 0.5) * (dt / 1.5)
    ts_irr = jnp.asarray(np.cumsum(gaps, axis=1), jnp.float32)

    def bench(name, fn, *args, iters=50):
        t0 = time.time()
        val = float(fn(*args))
        compile_s = time.time() - t0
        assert np.isfinite(val), f"{name}: non-finite {val}"
        ms = 1e3 * timed(fn, *args, iters=iters)
        print(json.dumps({
            "metric": name, "value": round(ms, 2), "unit": "ms",
            "ll": round(val, 1), "compile_s": round(compile_s, 1),
        }), flush=True)
        return ms

    bench(
        f"stacked_loglik_B{B}_n{NB}_rank{RANK}_regular",
        lambda t, x: leg.log_likelihood_batch(params, t, x, regular=True),
        ts_reg, xs_b,
    )
    bench(
        f"stacked_loglik_B{B}_n{NB}_rank{RANK}_irregular",
        lambda t, x: leg.log_likelihood_batch(params, t, x),
        ts_irr, xs_b,
    )

    # per-series likelihood VECTOR from one pass (rows sweep + segment
    # sums; the fused kernel's per-gap log|Q1| rows ride along)
    ids_flat = jnp.broadcast_to(
        jnp.arange(B)[:, None], (B, NB)
    ).reshape(-1)

    def per_series_vec(t, x):
        return jnp.sum(leg.log_likelihood_per_series(
            params, t.reshape(-1), x.reshape(B * NB, OBS), ids_flat,
            num_series=B, regular=True,
        ))

    bench(
        f"perseries_vector_B{B}_n{NB}_rank{RANK}_regular",
        per_series_vec, ts_reg, xs_b, iters=20,
    )

    @jax.jit
    def per_series_map(ts_batch, xs_batch):
        return jnp.sum(jax.lax.map(
            lambda tx: leg.log_likelihood(params, tx[0], tx[1],
                                          regular=True),
            (ts_batch, xs_batch),
        ))

    bench(
        f"perseries_map_loglik_B{B}_n{NB}_rank{RANK}_regular",
        per_series_map, ts_reg, xs_b, iters=3,
    )

    # one stacked train step (Adam; reduce_on_plateau off to keep the
    # update a pure optax.adam application)
    ids = jnp.broadcast_to(jnp.arange(B)[:, None], (B, NB)).reshape(-1)
    ts_flat = ts_reg.reshape(-1)
    xs_flat = xs_b.reshape(B * NB, OBS)
    opt = train_loop.make_optimizer("adam", 1e-2, reduce_on_plateau=False)
    opt_state = opt.init(params)

    def step(t, x):
        p2, _, value = train_loop.train_step_stacked(
            params, opt_state, t, x, ids, opt, True
        )
        return value + jax.tree.leaves(p2)[0].ravel()[0]

    bench(
        f"stacked_train_step_B{B}_n{NB}_rank{RANK}_regular",
        step, ts_flat, xs_flat, iters=10,
    )


if __name__ == "__main__":
    main()
