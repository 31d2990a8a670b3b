"""Celerite closed-form emission vs the expanded-LEG pipeline.

The celerite kernel class (sums of damped oscillators; reference sketch
cyclic_gps/models.py:552-592) is defined by its O(nblocks) per-gap
compute: G is block-diagonal with 2x2 blocks whose exponential is
closed-form, so the gap emission is pure elementwise math -- no Pade
evaluation, no [2r, 2r, N] Van Loan intermediates.  This benchmark
times `celerite.log_likelihood` (closed-form gap emission feeding the
partitioned engine) against the oracle route `leg.log_likelihood`
applied to the expanded full-rank parameters, at N = 1e6 f32 on an
irregular grid.

The solver stage is identical between the two (the posterior precision
couples blocks through B^T (Lambda Lambda^T)^{-1} B, which is dense, so
K must be solved at full rank); the delta is the emission stage the
celerite structure eliminates.

Usage: python examples/bench_celerite.py
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
    from cyclic_gps_tpu.models import celerite, leg
    from cyclic_gps_tpu.utils.profiling import timed

    n = 1_000_000
    rng = np.random.RandomState(0)
    gaps = (rng.exponential(1.0, n) + 0.5) * 0.01
    ts = jnp.asarray(np.cumsum(gaps), jnp.float32)
    xs = jnp.asarray(rng.randn(n, 2), jnp.float32)

    for nb in (2, 8):
        p = celerite.init_params(jax.random.key(0), nb, 2,
                                 dtype=jnp.float32)
        p = p._replace(
            n_sub=jnp.asarray(rng.randn(nb) * 0.3, jnp.float32),
            r_sub=jnp.asarray(rng.randn(nb) * 1.0, jnp.float32),
        )
        t0 = time.time()
        ll_c = float(celerite.log_likelihood(p, ts, xs))
        c_s = time.time() - t0
        assert np.isfinite(ll_c), ll_c
        ms_c = 1e3 * timed(
            lambda t, x: celerite.log_likelihood(p, t, x), ts, xs,
            iters=20)

        expanded = celerite.expand(p)
        t0 = time.time()
        ll_e = float(leg.log_likelihood(expanded, ts, xs))
        e_s = time.time() - t0
        ms_e = 1e3 * timed(
            lambda t, x: leg.log_likelihood(expanded, t, x), ts, xs,
            iters=20)

        t0 = time.time()
        ll_f = float(celerite.log_likelihood_filter(p, ts, xs))
        f_s = time.time() - t0
        assert np.isfinite(ll_f), ll_f
        ms_f = 1e3 * timed(
            lambda t, x: celerite.log_likelihood_filter(p, t, x), ts, xs,
            iters=20)

        rel = abs(ll_c - ll_e) / abs(ll_e)
        rel_f = abs(ll_f - ll_e) / abs(ll_e)
        print(json.dumps({
            "metric": f"celerite_loglik_n1e6_nblocks{nb}",
            "closed_form_ms": round(ms_c, 2),
            "filter_ms": round(ms_f, 2),
            "expanded_ms": round(ms_e, 2),
            "speedup": round(ms_e / ms_c, 2),
            "speedup_filter": round(ms_e / ms_f, 2),
            "ll_rel_diff": float(f"{rel:.2e}"),
            "ll_rel_diff_filter": float(f"{rel_f:.2e}"),
            "compile_s": [round(c_s, 1), round(e_s, 1), round(f_s, 1)],
        }), flush=True)

        # -- GRADIENTS (VERDICT r4 #2): does the filter route's 7.1x
        # survive differentiation?  Times d(loglik)/d(params) for the
        # three routes (fused precision sweep = the round-4 training hot
        # path; filter route; expanded oracle).
        grads = {}
        for name, fn in (
            ("grad_fused", lambda pp, t, x: celerite.log_likelihood(
                pp, t, x)),
            ("grad_filter", lambda pp, t, x: celerite.log_likelihood_filter(
                pp, t, x)),
        ):
            gfn = jax.jit(jax.grad(fn))
            try:
                t0 = time.time()
                g = gfn(p, ts, xs)
                jax.block_until_ready(g)
                g_compile = time.time() - t0
                gms = 1e3 * timed(
                    lambda t, x: gfn(p, t, x).n_diag, ts, xs, iters=10)
                grads[name + "_ms"] = round(gms, 2)
                grads[name + "_compile_s"] = round(g_compile, 1)
            except Exception as e:  # noqa: BLE001 - report and continue
                grads[name + "_error"] = str(e)[:160]
        ge = jax.jit(jax.grad(
            lambda pp, t, x: leg.log_likelihood(pp, t, x)))
        try:
            jax.block_until_ready(ge(expanded, ts, xs))
            grads["grad_expanded_ms"] = round(1e3 * timed(
                lambda t, x: ge(expanded, t, x).n_params, ts, xs,
                iters=10), 2)
        except Exception as e:  # noqa: BLE001
            grads["grad_expanded_error"] = str(e)[:160]
        print(json.dumps({
            "metric": f"celerite_grad_n1e6_nblocks{nb}", **grads,
        }), flush=True)


if __name__ == "__main__":
    main()
