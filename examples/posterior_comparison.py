"""Direct posterior / likelihood parity harness.

The reference's direct_posterior_comparison.py checks its likelihood and
forecasts under parameters exported from the original TF implementation
(.npy files).  The same pathway here: inject packed parameters (npz via
train_loop.load_params, or any packed arrays via params_from_arrays) and
cross-check every engine against every other:

  * LEG likelihood: partitioned engine vs cyclic reduction vs dense oracle
    vs sequential Kalman filter.
  * In-sample posterior: partitioned solve vs CR solve vs RTS smoother
    (sequential and parallel).
  * Forecast 100 points ahead from 200 observed.

Usage: python examples/posterior_comparison.py [params.npz]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")  # f64 parity needs CPU
jax.config.update("jax_enable_x64", True)

from cyclic_gps_tpu.baselines import dense, kalman
from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import cyclic_reduction as cr
from cyclic_gps_tpu.ops import partitioned as ptn
from cyclic_gps_tpu.train import loop as train_loop


def main(params_path=None):
    n_obs, n_fc, d = 200, 100, 2
    ts, xs = generate_data(n_obs + n_fc, d, dtype=jnp.float64,
                           spacing="regular", seed=0)
    obs_ts, obs_xs = ts[:n_obs], xs[:n_obs]

    if params_path:
        params = train_loop.load_params(params_path, dtype=jnp.float64)
    else:
        params = leg.init_params(jax.random.key(0), rank=5, obs_dim=d,
                                 dtype=jnp.float64)

    # likelihood parity across engines
    ll = float(leg.log_likelihood(params, obs_ts, obs_xs))
    ll_dense = float(
        dense.log_marginal_likelihood_from_params(params, obs_ts, obs_xs)
    )
    ssm = kalman.leg_to_ssm(params, obs_ts)
    ll_kf = float(kalman.log_likelihood_sequential(ssm, obs_xs))
    print(f"loglik: leg={ll:.10f} dense={ll_dense:.10f} kf={ll_kf:.10f}")
    assert abs(ll - ll_dense) < 1e-6 * max(1, abs(ll))
    assert abs(ll - ll_kf) < 1e-6 * max(1, abs(ll))

    # posterior parity
    k_diag, k_off = leg.posterior_precision(params, obs_ts)
    v = leg.compute_v(params, obs_xs)
    mean_pt = ptn.solve(k_diag, k_off, v)
    mean_cr = cr.solve(cr.decompose(k_diag, k_off), v)
    sm_seq, _ = kalman.smooth_sequential(ssm, obs_xs)
    sm_par, _ = kalman.smooth_parallel(ssm, obs_xs)
    print("posterior max diffs:",
          float(jnp.abs(mean_pt - mean_cr).max()),
          float(jnp.abs(mean_pt - sm_seq).max()),
          float(jnp.abs(sm_seq - sm_par).max()))
    assert jnp.allclose(mean_pt, sm_seq, atol=1e-8)

    # forecast the next 100 points
    fc_mean, fc_cov = leg.make_predictions(
        params, obs_ts, obs_xs, ts[n_obs:], include_obs_noise=True
    )
    rmse = float(jnp.sqrt(jnp.mean((fc_mean - xs[n_obs:]) ** 2)))
    print(f"forecast rmse over {n_fc} points: {rmse:.4f}")
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
