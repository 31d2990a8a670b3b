"""Triple likelihood parity: CR == naive dense == Kalman.

The single most important behavioural contract of the reference
(tests/test_likelihood.py:9-29): the O(N) cyclic-reduction marginal
likelihood must equal the naive dense O(N^3) formula for regular AND
irregular spacing, and equal an exact discrete-time Kalman filter for
regular spacing.  Run at float64 with a 1e-6 bar (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclic_gps_tpu.baselines import dense, kalman
from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg

RANK = 5


@pytest.mark.parametrize("spacing", ["regular", "irregular"])
@pytest.mark.parametrize("n", [10, 33, 50, 100, 150])
@pytest.mark.parametrize("d", [1, 2, 3])
def test_log_marginal_likelihood(spacing, n, d):
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing=spacing, seed=n + d)
    params = leg.init_params(
        jax.random.key(0), rank=RANK, obs_dim=d, dtype=jnp.float64
    )

    leg_ll = float(leg.log_likelihood(params, ts, xs))
    naive_ll = float(dense.log_marginal_likelihood_from_params(params, ts, xs))
    assert np.isfinite(leg_ll)
    assert abs(leg_ll - naive_ll) <= 1e-6 * max(1.0, abs(naive_ll))

    if spacing == "regular":
        ssm = kalman.leg_to_ssm(params, ts, use_approximation=False)
        kf_ll = float(kalman.log_likelihood_sequential(ssm, xs))
        assert abs(leg_ll - kf_ll) <= 1e-6 * max(1.0, abs(kf_ll))
        # parallel (associative-scan) filter agrees with sequential
        kf_ll_par = float(kalman.filter_parallel(ssm, xs)[2])
        assert abs(kf_ll - kf_ll_par) <= 1e-8 * max(1.0, abs(kf_ll))
