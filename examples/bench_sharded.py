"""Sequence-sharded vs single-device work overhead (8 virtual CPU devices).

One physical core timeshares the 8 virtual devices, so wall-clock measures
TOTAL WORK: the ratio sharded/single is the sharding overhead factor
(per-shard time vs the single-device engine at 1/P the size).  The round-1
CR-based sharded likelihood carried a ~15x engine penalty; the partitioned
re-platform should be within ~2x (VERDICT r1 item 3).

Round-3 note: earlier numbers (r2's 2.24x, and a 6.3-6.7x measured
before the fix) were dominated by RE-TRACING -- the public entries
rebuilt their jax.jit(shard_map(...)) wrapper per call.  With the
wrappers cached (seq_sharded._cached_shard_fn) the timings below are
pure execution.

Run:  python examples/bench_sharded.py     (forces CPU + 8 virtual devices)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

flags = _os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    _os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import json
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cyclic_gps_tpu.models import leg  # noqa: E402
from cyclic_gps_tpu.parallel import seq_sharded  # noqa: E402

N = 2**17
RANK, OBS = 3, 2


def timeit(fn, *args, iters=3):
    fn(*args)  # compile
    best = np.inf
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ts = jnp.cumsum(
        0.5 + jax.random.uniform(jax.random.key(0), (N,), dtype=jnp.float64)
    )
    xs = jax.random.normal(jax.random.key(1), (N, OBS), dtype=jnp.float64)
    params = leg.init_params(jax.random.key(2), rank=RANK, obs_dim=OBS,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(8)

    ll_single = leg.log_likelihood(params, ts, xs)
    ll_sharded = seq_sharded.log_likelihood(params, ts, xs, mesh)
    rel = abs(float(ll_sharded - ll_single) / float(ll_single))

    t_single = timeit(lambda: leg.log_likelihood(params, ts, xs))
    t_sharded = timeit(
        lambda: seq_sharded.log_likelihood(params, ts, xs, mesh)
    )

    # parameter gradient through the sharded ANALYTIC VJP vs single-device
    g_sharded = jax.jit(jax.grad(
        lambda p: seq_sharded.log_likelihood(p, ts, xs, mesh)
    ))
    g_single = jax.jit(jax.grad(lambda p: leg.log_likelihood(p, ts, xs)))
    tg_single = timeit(lambda: g_single(params))
    tg_sharded = timeit(lambda: g_sharded(params))

    print(json.dumps({
        "metric": "seq_sharded_work_overhead",
        "n": N, "devices": 8,
        "single_ms": round(t_single, 1),
        "sharded_ms": round(t_sharded, 1),
        "overhead_factor": round(t_sharded / t_single, 3),
        "grad_single_ms": round(tg_single, 1),
        "grad_sharded_ms": round(tg_sharded, 1),
        "grad_overhead_factor": round(tg_sharded / tg_single, 3),
        "loglik_rel_err": rel,
    }))


if __name__ == "__main__":
    main()
