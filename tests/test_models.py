"""LEG model construction and shape tests (port of reference
tests/test_models.py) plus posterior / prediction parity against dense
oracles and the Kalman smoother.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclic_gps_tpu.baselines import dense, kalman
from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg


def test_parameter_packing():
    params = leg.init_params(jax.random.key(0), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    assert params.n_params.shape == (6,)
    assert params.r_params.shape == (3,)
    assert params.lambda_params.shape == (3,)
    assert params.b.shape == (2, 3)
    assert leg.parameter_count(3, 2) == 18

    # N init: identity packed into lower-tri (reference test_models.py:14-17)
    np.testing.assert_allclose(
        np.asarray(params.n_params), [1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
    )
    # scatter back gives the identity
    np.testing.assert_allclose(np.asarray(leg.n_matrix(params)), np.eye(3))

    # B init: 0.5 * ones / row norm
    b_expect = 0.5 * np.ones((2, 3)) / np.sqrt(3)
    np.testing.assert_allclose(np.asarray(params.b), b_expect)

    # R is antisymmetric up to packing
    r = np.asarray(leg.r_matrix(params))
    assert np.allclose(np.diag(r), 0)

    # Lambda Lambda^T symmetric positive definite
    llt = np.asarray(leg.lambda_lambda_t(params))
    assert llt.shape == (2, 2)
    np.testing.assert_allclose(llt, llt.T)
    assert np.all(np.linalg.eigvalsh(llt) > 0)


def test_g_matrix():
    params = leg.init_params(jax.random.key(1), rank=4, obs_dim=2,
                             dtype=jnp.float64)
    g = np.asarray(leg.g_matrix(params))
    n = np.asarray(leg.n_matrix(params))
    r = np.asarray(leg.r_matrix(params))
    np.testing.assert_allclose(g, n @ n.T + r - r.T + 1e-5 * np.eye(4))
    # G + G^T = 2 N N^T + 2e-5 I is PSD -> stable generator
    assert np.all(np.linalg.eigvalsh(g + g.T) > 0)


def test_peg_precision_shapes_and_value():
    rank, num_obs = 3, 100
    params = leg.init_params(jax.random.key(2), rank=rank, obs_dim=2,
                             dtype=jnp.float64)
    g = leg.g_matrix(params)
    ts = jnp.linspace(0.0, 10.0, num_obs, dtype=jnp.float64)
    diag, off = leg.peg_precision(g, ts)
    assert diag.shape == (num_obs, rank, rank)
    assert off.shape == (num_obs - 1, rank, rank)

    # the precision must invert the dense prior covariance (small case)
    ts_s = jnp.asarray(np.sort(np.random.RandomState(0).rand(12)) * 5,
                       dtype=jnp.float64)
    diag, off = leg.peg_precision(g, ts_s)
    n = 12
    J = np.zeros((n * rank, n * rank))
    for i in range(n):
        J[i*rank:(i+1)*rank, i*rank:(i+1)*rank] = np.asarray(diag[i])
    for i in range(n - 1):
        J[(i+1)*rank:(i+2)*rank, i*rank:(i+1)*rank] = np.asarray(off[i])
        J[i*rank:(i+1)*rank, (i+1)*rank:(i+2)*rank] = np.asarray(off[i]).T
    C = np.asarray(dense.prior_covariance(ts_s, g))
    np.testing.assert_allclose(J @ C, np.eye(n * rank), atol=1e-8)


def test_insample_posterior_matches_kalman_smoother():
    """CR posterior mean == RTS smoother state estimates (regular grid);
    the reference asserts this in kalman_timing_script.py:53 and
    kalman_generation_script.py:28."""
    n, d, rank = 60, 2, 4
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="regular", seed=5)
    params = leg.init_params(jax.random.key(3), rank=rank, obs_dim=d,
                             dtype=jnp.float64)

    mean, cov_diag, cov_off = leg.insample_posterior(params, ts, xs)

    ssm = kalman.leg_to_ssm(params, ts, use_approximation=False)
    sm_mean, sm_cov = kalman.smooth_sequential(ssm, xs)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(sm_mean),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_diag), np.asarray(sm_cov),
                               rtol=1e-8, atol=1e-8)

    # parallel smoother agrees with sequential
    pm, pc = kalman.smooth_parallel(ssm, xs)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(sm_mean),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pc), np.asarray(sm_cov),
                               rtol=1e-7, atol=1e-9)


def _dense_latent_predictive(params, ts, xs, t_star):
    """Exact dense GP predictive of the latent at t_star (numpy oracle)."""
    rank = params.rank
    ts_np = np.asarray(ts)
    g = np.asarray(leg.g_matrix(params))
    b = np.asarray(params.b)
    llt = np.asarray(leg.lambda_lambda_t(params))
    n = len(ts_np)

    def cross_cov(t1, t2):
        import scipy.linalg as sla
        d = t1 - t2
        if d >= 0:
            return sla.expm(-0.5 * d * g)
        return sla.expm(-0.5 * (-d) * g).T

    sig_tt = np.block([[cross_cov(ti, tj) for tj in ts_np] for ti in ts_np])
    b_tilde = np.kron(np.eye(n), b)
    cov_xx = b_tilde @ sig_tt @ b_tilde.T + np.kron(np.eye(n), llt)
    sig_star_t = np.hstack([cross_cov(t_star, tj) for tj in ts_np])
    cov_zx = sig_star_t @ b_tilde.T
    x = np.asarray(xs).reshape(-1)
    mean = cov_zx @ np.linalg.solve(cov_xx, x)
    cov = np.eye(rank) - cov_zx @ np.linalg.solve(cov_xx, cov_zx.T)
    return mean, cov


@pytest.mark.parametrize("t_star_kind", ["interp", "forward", "backward"])
def test_intercast_matches_dense_gp(t_star_kind):
    """The vmapped intercast equals the exact dense GP predictive: the
    Markov-conditioning shortcut (reference models.py:394-514) is exact."""
    n, d, rank = 25, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=11)
    params = leg.init_params(jax.random.key(4), rank=rank, obs_dim=d,
                             dtype=jnp.float64)

    ts_np = np.asarray(ts)
    if t_star_kind == "interp":
        t_star = 0.6 * ts_np[10] + 0.4 * ts_np[11]
    elif t_star_kind == "forward":
        t_star = ts_np[-1] + 1.7
    else:
        t_star = ts_np[0] - 2.3

    target = jnp.asarray([t_star], dtype=jnp.float64)
    lat_mean, lat_cov = leg.predictive_posterior(params, ts, xs, target)

    mean_o, cov_o = _dense_latent_predictive(params, ts, xs, t_star)
    np.testing.assert_allclose(np.asarray(lat_mean[0]), mean_o,
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lat_cov[0]), cov_o,
                               rtol=1e-7, atol=1e-8)


def test_intercast_exact_hits_and_data_space():
    n, d, rank = 20, 1, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=13)
    params = leg.init_params(jax.random.key(5), rank=rank, obs_dim=d,
                             dtype=jnp.float64)

    mean, cov_diag, cov_off = leg.insample_posterior(params, ts, xs)
    # targets hitting the first and last observation exactly
    target = jnp.asarray([float(ts[0]), float(ts[-1])], dtype=jnp.float64)
    lat_mean, lat_cov = leg.intercast(params, mean, cov_diag, cov_off, ts,
                                      target)
    np.testing.assert_allclose(np.asarray(lat_mean[0]), np.asarray(mean[0]))
    np.testing.assert_allclose(np.asarray(lat_cov[0]), np.asarray(cov_diag[0]))
    np.testing.assert_allclose(np.asarray(lat_mean[1]), np.asarray(mean[-1]))
    np.testing.assert_allclose(np.asarray(lat_cov[1]),
                               np.asarray(cov_diag[-1]))

    # data-space mapping
    pm, pc = leg.make_predictions(params, ts, xs, target)
    np.testing.assert_allclose(
        np.asarray(pm), np.asarray(lat_mean @ params.b.T)
    )
    assert pc.shape == (2, d, d)
    # with observation noise the covariance is strictly larger
    pm2, pc2 = leg.make_predictions(params, ts, xs, target,
                                    include_obs_noise=True)
    assert np.all(np.diagonal(np.asarray(pc2 - pc), axis1=1, axis2=2) > 0)


def test_sample_from_prior():
    """Sampling: stationary marginal covariance of z is I; x = Bz + noise."""
    params = leg.init_params(jax.random.key(6), rank=2, obs_dim=1,
                             dtype=jnp.float64)
    ts = jnp.cumsum(jnp.ones(200, dtype=jnp.float64))
    zs, xs = leg.sample_from_prior(params, jax.random.key(7), ts, num=300)
    assert zs.shape == (300, 200, 2)
    assert xs.shape == (300, 200, 1)
    # pooled second moment of z approx identity (stationarity)
    z = np.asarray(zs).reshape(-1, 2)
    emp = z.T @ z / z.shape[0]
    np.testing.assert_allclose(emp, np.eye(2), atol=0.05)


def test_leg_family_facade(tmp_path):
    """The class facade mirrors the reference's API surface."""
    from cyclic_gps_tpu.models import LEGFamily

    model = LEGFamily(rank=3, obs_dim=2, data_type=jnp.float64, lr=1e-2)
    assert model.parameter_count == 18
    assert model.N.shape == (3, 3)
    assert model.calc_Lambda_Lambda_T().shape == (2, 2)

    ts, xs = generate_data(40, 2, dtype=jnp.float64, spacing="irregular",
                           seed=41)
    diag, off = model.compute_PEG_precision(ts)
    assert diag.shape == (40, 3, 3) and off.shape == (39, 3, 3)

    ll0 = float(model.log_likelihood(ts, xs))
    losses = model.fit(ts, xs, num_steps=10, log_every=0)
    assert len(losses) == 10 and np.isfinite(losses).all()
    assert float(model.log_likelihood(ts, xs)) > ll0

    mean, cov_d, cov_o = model.compute_insample_posterior(ts, xs)
    assert mean.shape == (40, 3)
    pm, pc = model.make_predictions(ts, xs, ts[:5] + 0.25,
                                    include_obs_noise=True)
    assert pm.shape == (5, 2) and pc.shape == (5, 2, 2)
    zs, xsamp = model.sample_from_prior(ts, num=2)
    assert xsamp.shape == (2, 40, 2)

    path = str(tmp_path / "fam.npz")
    model.save(path)
    model2 = LEGFamily(rank=3, obs_dim=2, data_type=jnp.float64).load(path)
    np.testing.assert_allclose(np.asarray(model2.params.b),
                               np.asarray(model.params.b))


def test_posterior_method_routing():
    """`method=` exposes the dtype dispatch (VERDICT weak #6): the
    precision route and the parallel-smoother route agree exactly at
    float64, and float32 "auto" resolves to the smoother (whose innovation
    recursions stay within f32, unlike the precision factorization)."""
    n, d, rank = 72, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=11)
    params = leg.init_params(jax.random.key(5), rank=rank, obs_dim=d,
                             dtype=jnp.float64)

    assert leg._resolve_posterior_method("auto", jnp.float64) == "precision"
    assert leg._resolve_posterior_method("auto", jnp.float32) == "smoother"
    with pytest.raises(ValueError):
        leg._resolve_posterior_method("nope", jnp.float64)

    pm_p = leg.posterior_mean(params, ts, xs, method="precision")
    pm_s = leg.posterior_mean(params, ts, xs, method="smoother")
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(pm_s),
                               rtol=1e-9, atol=1e-11)

    ip_p = leg.insample_posterior(params, ts, xs, method="precision")
    ip_s = leg.insample_posterior(params, ts, xs, method="smoother")
    for a, b in zip(ip_p, ip_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)

    # f32: both branches run; auto==smoother matches the f64 oracle
    p32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    ts32, xs32 = ts.astype(jnp.float32), xs.astype(jnp.float32)
    pm32 = leg.posterior_mean(p32, ts32, xs32)  # auto -> smoother
    np.testing.assert_allclose(np.asarray(pm32), np.asarray(pm_p),
                               rtol=0, atol=5e-5)
    pm32_prec = leg.posterior_mean(p32, ts32, xs32, method="precision")
    assert np.all(np.isfinite(np.asarray(pm32_prec)))


def test_smoother_lag1_cross_covariance_oracle():
    """The parallel smoother's lag-1 cross-covariance (the f32
    insample_posterior path feeding intercast's interpolation) against the
    precision-form selected inverse at f64 on an irregular grid
    (ADVICE round 1, item 3)."""
    from cyclic_gps_tpu.ops import partitioned as pt

    n, d, rank = 80, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=13)
    params = leg.init_params(jax.random.key(7), rank=rank, obs_dim=d,
                             dtype=jnp.float64)

    k_diag, k_off = leg.posterior_precision(params, ts)
    cov_diag, cov_off = pt.inverse_blocks(k_diag, k_off)

    ssm = kalman.leg_to_ssm(params, ts, use_approximation=False)
    sm_mean, sm_cov, sm_cross = kalman.smooth_parallel_full(ssm, xs)
    np.testing.assert_allclose(np.asarray(sm_cov), np.asarray(cov_diag),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sm_cross), np.asarray(cov_off),
                               rtol=1e-8, atol=1e-10)


def test_blocked_filter_smoother_match_flat():
    """The blocked (memory-bounded) parallel filter/smoother equal the
    flat associative-scan versions exactly, including non-block-multiple
    T (no-op-step padding) -- the route for f32 posteriors beyond
    N ~ 1e6, where the flat scan's work arrays overflow HBM."""
    n, d, rank = 300, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=17)
    params = leg.init_params(jax.random.key(9), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    ssm = kalman.leg_to_ssm(params, ts)

    m1, p1, ll1 = kalman.filter_parallel(ssm, xs)
    m2, p2, ll2 = kalman.filter_parallel_blocked(ssm, xs, block=64)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-12)

    s1 = kalman.smooth_parallel_full(ssm, xs)
    s2 = kalman.smooth_parallel_full_blocked(ssm, xs, block=64)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-13)


def test_blocked_loglik_value_and_gradient():
    """log_likelihood_blocked == filter_parallel ll, and its PARAMETER
    gradient (through leg_to_ssm, the checkpointed block scan, and the
    associative filter) matches the flat scan's -- the f32 training loss
    at T = 1e7 (VERDICT r2 #1)."""
    from cyclic_gps_tpu.train import loop as train_loop

    n, d, rank = 301, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=23)
    params = leg.init_params(jax.random.key(11), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    ssm = kalman.leg_to_ssm(params, ts)

    ll_flat = kalman.filter_parallel(ssm, xs)[2]
    ll_blk = kalman.log_likelihood_blocked(ssm, xs, block=64)
    np.testing.assert_allclose(float(ll_blk), float(ll_flat), rtol=1e-12)

    def loss_flat(p):
        return -kalman.filter_parallel(kalman.leg_to_ssm(p, ts), xs)[2]

    def loss_blk(p):
        return -kalman.log_likelihood_blocked(
            kalman.leg_to_ssm(p, ts), xs, block=64
        )

    g1 = jax.grad(loss_flat)(params)
    g2 = jax.grad(loss_blk)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)

    # the training-loss entry dispatches to the blocked path above the
    # block threshold; below it the flat path -- both through LOSSES
    v = train_loop.nll_loss_kalman(params, ts, xs)
    np.testing.assert_allclose(float(v), float(-ll_flat / xs.size),
                               rtol=1e-12)


def test_regular_kalman_loss_matches_irregular_entry():
    """kalman_regular (one broadcast expm) == kalman on a uniform grid."""
    n, d, rank = 120, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="regular",
                           seed=5)
    params = leg.init_params(jax.random.key(3), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    from cyclic_gps_tpu.train import loop as train_loop

    v1 = train_loop.nll_loss_kalman(params, ts, xs)
    v2 = train_loop.nll_loss_kalman_regular(params, ts, xs)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-10)


def test_intercast_element_major_matches_batched():
    """The element-major intercast (bounded memory at dense P) equals the
    per-target vmapped oracle across all three regimes, boundary hits,
    and gap-coincident targets."""
    n, d, rank = 40, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=77)
    params = leg.init_params(jax.random.key(9), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    mean, cov_diag, cov_off = leg.insample_posterior(params, ts, xs)

    ts_np = np.asarray(ts)
    targets = np.concatenate([
        ts_np[0] - np.asarray([3.0, 0.2]),           # backward forecasts
        [ts_np[0]],                                  # first-obs hit
        0.5 * (ts_np[:-1] + ts_np[1:])[::3],         # interior midpoints
        ts_np[7:9],                                  # interior exact-ish
        [ts_np[-1]],                                 # last-obs hit
        ts_np[-1] + np.asarray([0.1, 5.0]),          # forward forecasts
    ])
    targets = jnp.asarray(np.sort(targets), dtype=jnp.float64)

    m1, c1 = leg.intercast(params, mean, cov_diag, cov_off, ts, targets)
    m2, c2 = leg._intercast_batched(params, mean, cov_diag, cov_off, ts,
                                    targets)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=1e-9, atol=1e-11)


def test_steady_state_likelihood_matches_filter():
    """log_likelihood_steady (transient Riccati + constant-gain MXU-
    convolution tail) == the exact associative filter, value AND
    parameter gradient, including a non-block-aligned tail."""
    rank, d, t = 3, 2, 600
    params = leg.init_params(jax.random.key(8), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    ts = jnp.arange(t, dtype=jnp.float64) * 0.5
    rng = np.random.RandomState(4)
    xs = jnp.asarray(rng.randn(t, d))
    ssm = kalman.leg_to_ssm(params, ts, regular=True)

    gap = kalman.steady_state_gap(ssm.a[0], ssm.q[0], ssm.h, ssm.r,
                                  t0=128)
    assert gap < 1e-14  # converged: the comparison below is exact

    ll_ref = kalman.filter_parallel(ssm, xs)[2]
    ll_ss = kalman.log_likelihood_steady(ssm.a[0], ssm.q[0], ssm.h,
                                         ssm.r, xs, t0=128, block=64)
    np.testing.assert_allclose(float(ll_ss), float(ll_ref), rtol=1e-12)

    def loss_ss(p):
        s = kalman.leg_to_ssm(p, ts, regular=True)
        return -kalman.log_likelihood_steady(s.a[0], s.q[0], s.h, s.r,
                                             xs, t0=128, block=64)

    def loss_ref(p):
        # sequential-filter oracle: same exact likelihood, but the
        # gradient of the ASSOCIATIVE filter is a huge XLA program whose
        # compile can SIGSEGV a process that has already accumulated a
        # module's worth of executables (value-parity vs filter_parallel
        # is asserted above; gradient-parity parallel==sequential is
        # covered by test_likelihood's KF cross-checks)
        return -kalman.log_likelihood_sequential(
            kalman.leg_to_ssm(p, ts, regular=True), xs)

    g1 = jax.grad(loss_ss)(params)
    g2 = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_intercast_geometry_dual_path_matches_plain():
    """The dense-grid geometry (P >= 2N: dual searchsorted as
    scatter+cumsum, gather-free anchor times via cummax/cummin) ==
    the plain searchsorted path, including exact-tie targets, targets
    outside the observed range, and repeated targets."""
    rng = np.random.RandomState(5)
    n = 37
    ts = jnp.asarray(np.cumsum(rng.rand(n) + 0.1), jnp.float64)
    ts_np = np.asarray(ts)
    targets = np.concatenate([
        ts_np[0] - np.asarray([2.0, 0.5]),
        np.sort(rng.rand(2 * n) * (ts_np[-1] - ts_np[0]) + ts_np[0]),
        ts_np[::5],                                  # exact ties
        [ts_np[3], ts_np[3]],                        # repeated tie
        ts_np[-1] + np.asarray([0.3, 4.0]),
    ])
    targets = jnp.asarray(np.sort(targets), jnp.float64)
    assert targets.shape[0] >= 2 * n                 # dual branch engages

    got = leg._intercast_geometry(ts, targets, 1e-10)

    idx = jnp.searchsorted(ts, targets)
    prev_i = jnp.clip(idx - 1, 0, n - 1)
    next_i = jnp.clip(idx, 0, n - 1)
    want = (idx == 0, idx == n,
            jnp.abs(targets - ts[0]) <= 1e-10,
            jnp.abs(targets - ts[-1]) <= 1e-10,
            prev_i, next_i, jnp.clip(idx - 1, 0, n - 2),
            jnp.maximum(ts[0] - targets, 0.0),
            jnp.maximum(targets - ts[-1], 0.0),
            jnp.maximum(targets - ts[prev_i], 0.0),
            jnp.maximum(ts[next_i] - targets, 0.0))
    names = ["is_back", "is_fwd", "hit_first", "hit_last", "prev_i",
             "next_i", "off_i", "d_back", "d_fwd", "d1", "d2"]
    for g, w, name in zip(got, want, names):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=f"geometry field {name}")
