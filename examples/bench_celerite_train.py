"""Celerite TRAINING-step bench (VERDICT r4 #2's done-condition): full
f32 Adam steps at N = 1e6 on an irregular grid, structured celerite
parameters (fused precision-sweep route, analytic adjoints) vs the
expanded rank-2*nb LEG parameterisation (the reference-shaped route).

Each route times K in-jit Adam steps via `lax.fori_loop` carrying
(params, opt_state) -- parameters evolve every iteration, so nothing
can be constant-folded and the number is an honest steady-state
training-step cost.

Run: python examples/bench_celerite_train.py [nblocks ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from cyclic_gps_tpu.models import celerite, leg

N = 1_000_000
K = 10


def _grid(n, seed=0):
    rng = np.random.RandomState(seed)
    gaps = rng.randint(1, 5, n) * 0.125
    ts = jnp.asarray(np.cumsum(gaps), jnp.float32)
    xs = jnp.asarray(rng.randn(n, 1), jnp.float32)
    return ts, xs


def time_steps(loss_fn, params, ts, xs):
    opt = optax.adam(1e-3)

    @jax.jit
    def run(params, ts, xs, c):
        # `c` perturbs the data each call: the relay result-caches
        # identical-args calls (CLAUDE.md), which otherwise times ~0
        def body(i, carry):
            p, st = carry
            g = jax.grad(loss_fn)(p, ts, xs * c)
            up, st = opt.update(g, st, p)
            return jax.tree.map(lambda a, b: a + b, p, up), st

        p, st = jax.lax.fori_loop(0, K, body, (params, opt.init(params)))
        return jnp.ravel(jax.tree.leaves(p)[0])[0]

    # host-read sync (block_until_ready does NOT synchronise through the
    # relay -- CLAUDE.md round-1 gotcha)
    t0 = time.time()
    float(run(params, ts, xs, 1.0))
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        float(run(params, ts, xs, 1.0 + 1e-6 * (i + 1)))
        times.append((time.time() - t0) / K)
    return float(np.median(times) * 1e3), compile_s


def main():
    ts, xs = _grid(N)
    nbs = [int(a) for a in _sys.argv[1:]] or [2, 8]
    for nb in nbs:
        p = celerite.init_params(jax.random.PRNGKey(0), nblocks=nb,
                                 obs_dim=1, dtype=jnp.float32)
        out = {"metric": f"celerite_train_n1e6_nblocks{nb}", "unit": "ms"}
        try:
            # the default route: conditional filter + analytic adjoint
            ms, cs = time_steps(celerite.nll_loss, p, ts, xs)
            out["filter_step_ms"] = round(ms, 2)
            out["filter_compile_s"] = round(cs, 1)
        except Exception as e:  # noqa: BLE001 - report and continue
            out["filter_error"] = str(e)[:160]
        try:
            ms, cs = time_steps(
                lambda pp, t, x: celerite.nll_loss(pp, t, x,
                                                   method="precision"),
                p, ts, xs)
            out["fused_step_ms"] = round(ms, 2)
            out["fused_compile_s"] = round(cs, 1)
        except Exception as e:  # noqa: BLE001 - report and continue
            out["fused_error"] = str(e)[:160]
        expanded = celerite.expand(p)

        def leg_loss(pp, t, x):
            return -leg.log_likelihood(pp, t, x) / x.size

        try:
            ms, cs = time_steps(leg_loss, expanded, ts, xs)
            out["expanded_step_ms"] = round(ms, 2)
            out["expanded_compile_s"] = round(cs, 1)
        except Exception as e:  # noqa: BLE001 - report and continue
            out["expanded_error"] = str(e)[:160]
        if out.get("fused_step_ms") and out.get("filter_step_ms"):
            out["speedup_vs_fused"] = round(
                out["fused_step_ms"] / out["filter_step_ms"], 2)
        if out.get("expanded_step_ms") and out.get("filter_step_ms"):
            out["speedup_vs_expanded"] = round(
                out["expanded_step_ms"] / out["filter_step_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
