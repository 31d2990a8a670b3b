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


def _non_normal_params(rank, obs_dim):
    """Params whose generator G is strongly non-normal.

    The default init (N = I) makes G normal, where several orientation
    mistakes in the precision assembly are invisible (the left- and
    right-interval contributions coincide); a random full N breaks the
    symmetry.  Regression for a real bug caught in f32 training."""
    params = leg.init_params(jax.random.key(3), rank=rank, obs_dim=obs_dim,
                             dtype=jnp.float64)
    n_rand = jax.random.normal(jax.random.key(4), params.n_params.shape,
                               dtype=jnp.float64)
    return params._replace(n_params=n_rand)


def test_log_marginal_likelihood_non_normal_generator():
    params = _non_normal_params(4, 2)
    for spacing in ["regular", "irregular"]:
        ts, xs = generate_data(60, 2, dtype=jnp.float64, spacing=spacing,
                               seed=17)
        leg_ll = float(leg.log_likelihood(params, ts, xs))
        naive_ll = float(
            dense.log_marginal_likelihood_from_params(params, ts, xs)
        )
        assert abs(leg_ll - naive_ll) <= 1e-6 * max(1.0, abs(naive_ll))
        if spacing == "regular":
            ssm = kalman.leg_to_ssm(params, ts)
            kf_ll = float(kalman.log_likelihood_sequential(ssm, xs))
            assert abs(leg_ll - kf_ll) <= 1e-6 * max(1.0, abs(kf_ll))


def test_peg_precision_inverts_covariance_non_normal():
    """The assembled precision must invert the dense prior covariance for
    a non-normal generator, and be positive definite."""
    from cyclic_gps_tpu.baselines.dense import prior_covariance

    params = _non_normal_params(3, 1)
    g = leg.g_matrix(params)
    ts = jnp.asarray(np.cumsum(np.random.RandomState(5).rand(30) + 0.02))
    diag, off, sld = leg.peg_precision_and_logdet(g, ts)
    n, r = 30, 3
    S = np.zeros((n * r, n * r))
    for i in range(n):
        S[i*r:(i+1)*r, i*r:(i+1)*r] = np.asarray(diag[i])
    for i in range(n - 1):
        S[(i+1)*r:(i+2)*r, i*r:(i+1)*r] = np.asarray(off[i])
        S[i*r:(i+1)*r, (i+1)*r:(i+2)*r] = np.asarray(off[i]).T
    C = np.asarray(prior_covariance(ts, g))
    np.testing.assert_allclose(S @ C, np.eye(n * r), atol=1e-8)
    assert np.linalg.eigvalsh(S).min() > 0
    # closed-form log|Sigma^{-1}| matches the assembled matrix
    np.testing.assert_allclose(float(sld), np.linalg.slogdet(S)[1],
                               rtol=1e-9)


def test_kalman_loss_equals_cr_loss():
    from cyclic_gps_tpu.train import loop as train_loop

    ts, xs = generate_data(50, 2, dtype=jnp.float64, spacing="regular",
                           seed=23)
    params = _non_normal_params(3, 2)
    a = float(train_loop.nll_loss(params, ts, xs))
    b = float(train_loop.nll_loss_kalman(params, ts, xs))
    assert abs(a - b) < 1e-9 * max(1.0, abs(a))


def test_streamed_gap_emission_matches_plain():
    """Slab-streamed dense gap emission (the large-N gradient replay
    route, `leg._gap_terms_dense_streamed`) is value- and vjp-identical
    to the whole-M `_gap_terms_dense` — forced small slab so the
    `lax.map`-over-checkpointed-slabs path actually runs."""
    rng = np.random.RandomState(11)
    r = 3
    a = rng.randn(r, r)
    g = jnp.asarray(0.5 * (a @ a.T) + (a - a.T) + np.eye(r))
    dt = jnp.asarray(0.1 + rng.rand(37))  # 37 gaps, slab 8 -> 5 slabs

    plain = jax.jit(lambda g_, d_: leg._gap_terms_dense(g_)(d_))
    stream = jax.jit(
        lambda g_, d_: leg._gap_terms_dense_streamed(g_, slab=8)(d_)
    )
    for x, y in zip(plain(g, dt), stream(g, dt)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-12)

    def functional(fn):
        def h(g_, d_):
            o, dl, dr, lq = fn(g_, d_)
            return jnp.sum(o * dl) + jnp.sum(dr ** 2) + jnp.sum(jnp.sin(lq))
        return h

    ga = jax.jit(jax.grad(functional(plain), argnums=(0, 1)))(g, dt)
    gb = jax.jit(jax.grad(functional(stream), argnums=(0, 1)))(g, dt)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                               atol=1e-11)


def test_residual_likelihood_matches_exact_f64():
    """leg.log_likelihood_residual == log_likelihood exactly at f64
    (values AND parameter gradients): the variational residual
    mahalanobis and the per-row-paired logdet are algebraic identities,
    not approximations."""
    n = 400  # above the chunked threshold (s = 32)
    ts, xs = generate_data(n, 2, dtype=jnp.float64, spacing="irregular",
                           seed=3)
    params = leg.init_params(jax.random.key(1), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    ll_a = float(leg.log_likelihood(params, ts, xs))
    ll_b = float(leg.log_likelihood_residual(params, ts, xs))
    np.testing.assert_allclose(ll_b, ll_a, rtol=1e-10)

    g_a = jax.grad(lambda p: leg.log_likelihood(p, ts, xs))(params)
    g_b = jax.grad(lambda p: leg.log_likelihood_residual(p, ts, xs))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-10)


def test_residual_likelihood_f32_smooth_regime():
    """The f32 smooth-fit regime that breaks the naive precision form
    (K blocks ~ 1/(dt lambda_min); train/loop.nll_loss caveat): the
    residual form stays accurate against the f64 reference.  Tight
    gaps + small observation noise make cond(K) ~ 1e6+."""
    rng = np.random.RandomState(7)
    n = 2048
    ts64 = jnp.asarray(np.cumsum(1e-4 + 2e-4 * rng.rand(n)))
    params64 = leg.init_params(jax.random.key(2), rank=2, obs_dim=1,
                               dtype=jnp.float64,
                               prior_length_scale=0.05)
    # smooth latent draw observed with small noise
    xs64 = jnp.asarray(
        np.sin(2 * np.pi * np.asarray(ts64) * 3.0)[:, None]
        + 0.02 * rng.randn(n, 1)
    )
    ll_ref = float(leg.log_likelihood(params64, ts64, xs64))

    to32 = lambda t: jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), t
    )
    p32, ts32, xs32 = to32(params64), to32(ts64), to32(xs64)
    ll_res32 = float(leg.log_likelihood_residual(p32, ts32, xs32,
                                                 backend="xla"))
    ll_naive32 = float(leg.log_likelihood(p32, ts32, xs32, backend="xla"))
    err_res = abs(ll_res32 - ll_ref) / abs(ll_ref)
    err_naive = abs(ll_naive32 - ll_ref) / abs(ll_ref)
    # the residual form must stay accurate; record the naive error for
    # context (it is typically orders of magnitude worse here)
    assert err_res < 5e-4, (err_res, err_naive)
