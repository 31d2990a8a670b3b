"""Irregular-grid likelihood benchmark (the fused-emission hot path).

Times `leg.log_likelihood` on an irregular grid at N = 1e6 f32 for
rank in {2, 5} -- the path the Pallas emission kernels own on TPU
(ops/expm_pallas.py: the tn kernel and the fused K-system kernel).
Reference hot loop being beaten: cyclic_gps/models.py:199-239 (N-1
batched `matrix_exp` + two batched `linalg.solve` per likelihood).

Fixture note (f32 time resolution): timestamps reach ~1.5e4, where the
f32 ULP is ~1e-3, so the minimum gap is kept at 5e-3 (5x margin) --
gaps that quantise to ZERO under f32 make Q1 exactly singular and the
likelihood NaN (the model is genuinely undefined for duplicate
timestamps; the reference dedups with threshold_timesteps, ours with
data.loaders.threshold_timesteps).

Usage: python examples/bench_irregular.py [--xla]
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
    from cyclic_gps_tpu.utils.profiling import timed

    n = 1_000_000
    rng = np.random.RandomState(0)
    gaps = (rng.exponential(1.0, n) + 0.5) * 0.01
    ts = jnp.asarray(np.cumsum(gaps), jnp.float32)
    for rank in (2, 5):
        params = leg.init_params(jax.random.key(0), rank=rank, obs_dim=2,
                                 dtype=jnp.float32)
        xs = jnp.asarray(rng.randn(n, 2), jnp.float32)
        t0 = time.time()
        ll = float(leg.log_likelihood(params, ts, xs))
        compile_s = time.time() - t0
        assert np.isfinite(ll), f"non-finite ll {ll}"
        ms = 1e3 * timed(lambda t, x: leg.log_likelihood(params, t, x),
                         ts, xs, iters=50)
        print(json.dumps({
            "metric": f"irregular_loglik_n1e6_rank{rank}",
            "value": round(ms, 2), "unit": "ms",
            "ll": round(ll, 2), "compile_s": round(compile_s, 1),
        }), flush=True)
        if rank == 5:
            # parameter gradient: slab-streamed emission adjoint +
            # structured Pade-7 replay (leg._tn_pallas_bwd)
            grad_fn = jax.grad(
                lambda p, t, x: leg.log_likelihood(p, t, x))
            ms_g = 1e3 * timed(lambda x, t: grad_fn(params, t, x),
                               xs, ts, iters=5)
            print(json.dumps({
                "metric": f"irregular_loglik_grad_n1e6_rank{rank}",
                "value": round(ms_g, 1), "unit": "ms",
            }), flush=True)


if __name__ == "__main__":
    main()
