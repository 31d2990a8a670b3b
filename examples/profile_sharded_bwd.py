"""Stage breakdown of the sequence-sharded GRADIENT overhead (VERDICT r3 #5).

The sharded analytic VJP costs 1.95x the single-device gradient in pure
execution (vs 1.07x forward).  This script decomposes both gradients on
the 8-virtual-device CPU mesh into comparable stages so the doubled work
can be located:

  fwd        likelihood forward
  grad       full parameter gradient (emission adjoint + mahal VJP)
  mahal_grad gradient of the fused (mahal, logdet) w.r.t. the K blocks
             (isolates the analytic VJP: one solve + one selected inv)
  solve      solve forward alone
  inverse    selected inversion forward alone
  emis_grad  gradient of the PEG emission alone (expm Frechet adjoint)

Run:  python examples/profile_sharded_bwd.py [N_log2]
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
from cyclic_gps_tpu.ops import partitioned as pt  # noqa: E402
from cyclic_gps_tpu.parallel import seq_sharded  # noqa: E402

N = 2 ** (int(_sys.argv[1]) if len(_sys.argv) > 1 else 16)
ITERS = int(_sys.argv[2]) if len(_sys.argv) > 2 else 3
RANK, OBS = 3, 2


def timeit(fn, *args, iters=None):
    iters = ITERS if iters is None else iters
    jax.block_until_ready(fn(*args))  # compile
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
    g = leg.g_matrix(params)

    # the K system in natural layout (shared input for the mahal stages)
    k_diag, k_off = leg.posterior_precision(params, ts)
    llt = leg.lambda_lambda_t(params)
    v = jnp.linalg.solve(llt, xs.T).T @ params.b  # [N, r]

    out = {}

    def rec(name, single_ms, sharded_ms):
        out[name] = {
            "single_ms": round(single_ms, 1),
            "sharded_ms": round(sharded_ms, 1),
            "overhead": round(sharded_ms / single_ms, 3),
        }
        print(name, out[name], flush=True)

    # ---- forward likelihood
    rec("fwd",
        timeit(lambda: leg.log_likelihood(params, ts, xs)),
        timeit(lambda: seq_sharded.log_likelihood(params, ts, xs, mesh)))

    # ---- full gradient
    g_single = jax.jit(jax.grad(lambda p: leg.log_likelihood(p, ts, xs)))
    g_sharded = jax.jit(jax.grad(
        lambda p: seq_sharded.log_likelihood(p, ts, xs, mesh)))
    rec("grad", timeit(lambda: g_single(params)),
        timeit(lambda: g_sharded(params)))

    # ---- mahal+logdet gradient w.r.t. the K blocks (analytic VJP only)
    def m_single(d_, o_, v_):
        mh, ld = pt.mahal_and_logdet(d_, o_, v_)
        return mh + ld

    def m_sharded(d_, o_, v_):
        mh, ld = seq_sharded.mahal_and_logdet(d_, o_, v_, mesh)
        return mh + ld

    gm_single = jax.jit(jax.grad(m_single, argnums=(0, 1, 2)))
    gm_sharded = jax.jit(jax.grad(m_sharded, argnums=(0, 1, 2)))
    rec("mahal_grad", timeit(lambda: gm_single(k_diag, k_off, v)),
        timeit(lambda: gm_sharded(k_diag, k_off, v)))

    # ---- solve / inverse forwards (the two backward halves, run alone)
    rec("solve",
        timeit(lambda: pt.solve_and_logdet(k_diag, k_off, v)),
        timeit(lambda: seq_sharded.solve(k_diag, k_off, v, mesh)))
    rec("inverse",
        timeit(lambda: pt.inverse_blocks(k_diag, k_off)),
        timeit(lambda: seq_sharded.inverse_blocks(k_diag, k_off, mesh)))

    # ---- emission gradient alone (expm / Q1-terms adjoint).  NOTE:
    # the two stages are not exactly work-matched -- e_single
    # differentiates the N-1 raw gap terms only, while the sharded local
    # adds the gap-valid masking, the eye + shift_down diag assembly and
    # the signed logdet partial from _peg_precision_local -- so the
    # reported ratio slightly OVERSTATES the sharded emission cost.
    diffs = jnp.diff(ts)

    def e_single(gm):
        e, q1 = leg.transition_and_noise_em(gm, diffs)
        off1, d_left, d_right, l1 = leg._q1_terms(e, q1)
        return (jnp.sum(off1) + jnp.sum(d_left) + jnp.sum(d_right)
                + jnp.sum(jnp.log(jnp.diagonal(l1, axis1=0, axis2=1))))

    def e_sharded_local(gm, ts_loc):
        d_em, o_em, ld_loc, _ = seq_sharded._peg_precision_local(
            gm, ts_loc, "seq")
        return jax.lax.psum(jnp.sum(d_em) + jnp.sum(o_em), "seq") + \
            jax.lax.psum(ld_loc, "seq")

    from jax.sharding import PartitionSpec as P
    e_sh = jax.jit(jax.shard_map(
        e_sharded_local, mesh=mesh, in_specs=(P(), P("seq")),
        out_specs=P(), check_vma=False))
    ge_single = jax.jit(jax.grad(e_single))
    ge_sharded = jax.jit(jax.grad(lambda gm: e_sh(gm, ts)))
    rec("emis_grad", timeit(lambda: ge_single(g)),
        timeit(lambda: ge_sharded(g)))

    print(json.dumps({"metric": "sharded_bwd_breakdown", "n": N,
                      "devices": 8, "stages": out}))


if __name__ == "__main__":
    main()
