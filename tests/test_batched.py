"""Stacked multi-series entries (models/leg.py): B independent series
concatenated into ONE block-tridiagonal solve via the series-boundary
gap mask.  Oracle: per-series single-series entries (themselves verified
against dense GP oracles in test_likelihood/test_models).

Reference contrast: cunningham-lab/cyclic-gps trains on one series at a
time (data_utils.py:73-75 always returns element 0; trainer.py's
multi-sample loop is dead code) -- there is no reference counterpart to
check against beyond the single-series likelihood itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg


def _series(lengths, spacing="irregular", obs=2, seed0=7):
    """List of (ts, xs) plus the stacked (ts, xs, ids) arrays."""
    parts = [
        generate_data(n, obs, dtype=jnp.float64, spacing=spacing,
                      seed=seed0 + i)
        for i, n in enumerate(lengths)
    ]
    ts = jnp.concatenate([p[0] for p in parts])
    xs = jnp.concatenate([p[1] for p in parts])
    ids = jnp.concatenate([
        jnp.full((n,), i, dtype=jnp.int32) for i, n in enumerate(lengths)
    ])
    return parts, ts, xs, ids


@pytest.mark.parametrize("lengths", [(137, 301, 64), (10, 11, 9)])
def test_stacked_equals_sum(lengths):
    """Stacked likelihood == sum of per-series likelihoods, ragged
    lengths, irregular grids, timestamps restarting at each boundary
    (negative raw boundary diffs are masked exactly).  The short case
    drives the sub-terminal CR fallback (_mahal_logdet_cm_any_n)."""
    params = leg.init_params(jax.random.key(0), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    parts, ts, xs, ids = _series(lengths)
    ll_sum = sum(float(leg.log_likelihood(params, t, x)) for t, x in parts)
    ll_stacked = float(leg.log_likelihood_stacked(params, ts, xs, ids))
    np.testing.assert_allclose(ll_stacked, ll_sum, rtol=1e-11)


def test_batch_regular_fast_path():
    """Equal-length constant-dt batch: the regular=True route (ONE
    matrix exponential for the whole batch) == irregular route == sum of
    per-series likelihoods.  Offsets differ per series (only gaps
    matter)."""
    b, nb = 4, 128
    params = leg.init_params(jax.random.key(1), rank=2, obs_dim=3,
                             dtype=jnp.float64)
    rng = np.random.RandomState(3)
    dt = 0.37
    ts_b = jnp.asarray(
        rng.rand(b, 1) * 50.0 + dt * np.arange(nb)[None, :]
    )
    xs_b = jnp.asarray(rng.randn(b, nb, 3))
    ll_reg = float(leg.log_likelihood_batch(params, ts_b, xs_b,
                                            regular=True))
    ll_irr = float(leg.log_likelihood_batch(params, ts_b, xs_b))
    ll_sum = sum(
        float(leg.log_likelihood(params, ts_b[i], xs_b[i], regular=True))
        for i in range(b)
    )
    np.testing.assert_allclose(ll_reg, ll_sum, rtol=1e-11)
    np.testing.assert_allclose(ll_irr, ll_sum, rtol=1e-11)


def test_stacked_gradient_equals_sum():
    """Parameter gradient of the stacked likelihood == sum of per-series
    gradients (the gap-mask path is differentiable end to end)."""
    params = leg.init_params(jax.random.key(2), rank=2, obs_dim=2,
                             dtype=jnp.float64)
    parts, ts, xs, ids = _series((90, 150), seed0=11)

    g_stacked = jax.grad(
        lambda p: leg.log_likelihood_stacked(p, ts, xs, ids)
    )(params)
    g_sum = jax.tree.map(
        lambda *a: sum(a),
        *[jax.grad(lambda p, t=t, x=x: leg.log_likelihood(p, t, x))(params)
          for t, x in parts],
    )
    for a, b in zip(jax.tree.leaves(g_stacked), jax.tree.leaves(g_sum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_fit_stacked_decreases_nll():
    """fit_stacked on an equal-length batch: finite monotone-ish descent,
    and the first-step loss equals nll_loss_stacked at init."""
    from cyclic_gps_tpu.train import loop as train_loop

    b, nb = 3, 80
    rng = np.random.RandomState(5)
    ts_b = jnp.asarray(rng.rand(b, 1) * 10 + 0.25 * np.arange(nb)[None, :])
    xs_b = jnp.asarray(rng.randn(b, nb, 2))
    ids = jnp.broadcast_to(jnp.arange(b)[:, None], (b, nb)).reshape(-1)
    params = leg.init_params(jax.random.key(3), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    result = train_loop.fit_stacked(
        params, ts_b.reshape(-1), xs_b.reshape(b * nb, 2), ids,
        num_steps=40, lr=1e-2, log_every=0, regular=True,
    )
    assert np.isfinite(result.losses).all()
    assert np.mean(result.losses[-8:]) < result.losses[0] - 1e-3
    init_loss = float(train_loop.nll_loss_stacked(
        params, ts_b.reshape(-1), xs_b.reshape(b * nb, 2), ids,
        regular=True))
    np.testing.assert_allclose(result.losses[0], init_loss, rtol=1e-9)


@pytest.mark.parametrize("lengths", [(110, 75, 140), (12, 9, 15)])
def test_stacked_posteriors_match_per_series(lengths):
    """posterior_mean_stacked / insample_posterior_stacked row-match the
    per-series precision-route posteriors; lag-1 cross-covariances at
    series boundaries are exactly zero (independent series).  The short
    case drives the sub-terminal natural-order fallback."""
    params = leg.init_params(jax.random.key(4), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    parts, ts, xs, ids = _series(lengths, seed0=20)

    mean_s = leg.posterior_mean_stacked(params, ts, xs, ids)
    mean_st, cov_st, off_st = leg.insample_posterior_stacked(
        params, ts, xs, ids
    )
    np.testing.assert_allclose(np.asarray(mean_st), np.asarray(mean_s),
                               rtol=1e-9, atol=1e-12)
    start = 0
    for (t, x), n in zip(parts, lengths):
        m_i, c_i, o_i = leg.insample_posterior(params, t, x,
                                               method="precision")
        sl = slice(start, start + n)
        np.testing.assert_allclose(np.asarray(mean_s[sl]),
                                   np.asarray(m_i), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(cov_st[sl]),
                                   np.asarray(c_i), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(off_st[sl][: n - 1]),
                                   np.asarray(o_i), rtol=1e-6, atol=1e-9)
        if start + n < ts.shape[0]:  # boundary cross-block: exactly zero
            np.testing.assert_allclose(
                np.asarray(off_st[start + n - 1]), 0.0, atol=1e-12
            )
        start += n


def test_stacked_composes_with_celerite():
    """A celerite-structured parameter set expands to LEGParams and runs
    through the stacked entry unchanged (structure + batching compose):
    stacked == sum of per-series expanded likelihoods."""
    from cyclic_gps_tpu.models import celerite

    cel = celerite.init_params(jax.random.key(9), nblocks=2, obs_dim=2,
                               dtype=jnp.float64)
    lp = celerite.expand(cel)
    parts, ts, xs, ids = _series((70, 90), seed0=31)
    ll_sum = sum(float(leg.log_likelihood(lp, t, x)) for t, x in parts)
    ll_stacked = float(leg.log_likelihood_stacked(lp, ts, xs, ids))
    np.testing.assert_allclose(ll_stacked, ll_sum, rtol=1e-11)


def test_make_predictions_batch_matches_per_series():
    """Batched predictions (one stacked solve + selected inversion +
    vmapped intercast) == per-series make_predictions on the precision
    route, covering all three target regimes (backward forecast,
    interpolation, forward forecast) and include_obs_noise."""
    b, nb, p = 3, 96, 17
    params = leg.init_params(jax.random.key(6), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    rng = np.random.RandomState(13)
    ts_b = jnp.asarray(np.sort(rng.rand(b, nb) * 20, axis=1) + 1.0)
    xs_b = jnp.asarray(rng.randn(b, nb, 2))
    # targets straddling the observed range: before, inside, after
    target_b = jnp.asarray(
        np.sort(rng.rand(b, p) * 26, axis=1) - 2.0
    )
    mean_b, cov_b = leg.make_predictions_batch(
        params, ts_b, xs_b, target_b, include_obs_noise=True
    )
    for i in range(b):
        m_i, c_i = leg.make_predictions(
            params, ts_b[i], xs_b[i], target_b[i],
            include_obs_noise=True, method="precision",
        )
        np.testing.assert_allclose(np.asarray(mean_b[i]), np.asarray(m_i),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(cov_b[i]), np.asarray(c_i),
                                   rtol=1e-7, atol=1e-9)


def test_stack_series_helper():
    """leg.stack_series builds the (ts, xs, ids) arrays the stacked
    entries consume (ragged, no padding)."""
    parts, ts, xs, ids = _series((20, 31, 12), seed0=90)
    ts2, xs2, ids2 = leg.stack_series(parts)
    np.testing.assert_array_equal(np.asarray(ts2), np.asarray(ts))
    np.testing.assert_array_equal(np.asarray(xs2), np.asarray(xs))
    np.testing.assert_array_equal(np.asarray(ids2), np.asarray(ids))


@pytest.mark.parametrize("lengths", [(100, 37, 75, 44), (13, 8, 17)])
def test_per_series_likelihood_vector(lengths):
    """log_likelihood_per_series == the vector of individual per-series
    likelihoods (and its sum == the stacked scalar): ragged irregular
    series, partitioned-path and sub-terminal lengths."""
    params = leg.init_params(jax.random.key(12), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    parts, ts, xs, ids = _series(lengths, seed0=40)
    ll_b = leg.log_likelihood_per_series(params, ts, xs, ids,
                                         num_series=len(lengths))
    ll_ref = np.array(
        [float(leg.log_likelihood(params, t, x)) for t, x in parts]
    )
    np.testing.assert_allclose(np.asarray(ll_b), ll_ref, rtol=1e-10)
    ll_stacked = float(leg.log_likelihood_stacked(params, ts, xs, ids))
    np.testing.assert_allclose(float(jnp.sum(ll_b)), ll_stacked,
                               rtol=1e-11)


def test_per_series_weighted_gradient():
    """Gradient of a WEIGHTED per-series combination sum_b c_b ll_b ==
    the weighted sum of individual per-series gradients: exercises the
    segment-wise analytic adjoint of pt.logdet_rows_cm (valid exactly
    because the cotangent is constant within each series block)."""
    params = leg.init_params(jax.random.key(13), rank=2, obs_dim=2,
                             dtype=jnp.float64)
    lengths = (90, 150, 70)
    parts, ts, xs, ids = _series(lengths, seed0=50)
    c = jnp.asarray([0.3, -1.7, 2.1])

    g_vec = jax.grad(
        lambda p: jnp.sum(c * leg.log_likelihood_per_series(
            p, ts, xs, ids, num_series=3))
    )(params)
    g_ref = jax.tree.map(
        lambda *a: sum(a),
        *[jax.tree.map(
            lambda l, w=float(c[i]): w * l,
            jax.grad(lambda p, t=t, x=x: leg.log_likelihood(p, t, x))(
                params),
        ) for i, (t, x) in enumerate(parts)],
    )
    for a, b in zip(jax.tree.leaves(g_vec), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_stacked_kalman_matches_precision(no_persistent_cache_writes):
    """Boundary-masked SSM (A = 0, Q = I at series starts): the Kalman
    filter restarts from the stationary prior per series exactly --
    stacked filter NLL == precision-form stacked NLL (values AND
    parameter gradient, f64), and the per-step rows segment-sum to each
    series' own sequential-filter likelihood.

    ``no_persistent_cache_writes``: writing this test's train-step
    executable to the on-disk compilation cache mid-suite aborts the
    process (see conftest); cache reads still work."""
    from cyclic_gps_tpu.baselines import kalman
    from cyclic_gps_tpu.train import loop as train_loop

    lengths = (60, 45, 38)
    params = leg.init_params(jax.random.key(14), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    parts, ts, xs, ids = _series(lengths, seed0=70)

    nll_k = float(train_loop.nll_loss_kalman_stacked(params, ts, xs, ids))
    nll_p = float(train_loop.nll_loss_stacked(params, ts, xs, ids))
    np.testing.assert_allclose(nll_k, nll_p, rtol=1e-9)

    ll_b = train_loop.log_likelihood_per_series_kalman(
        params, ts, xs, ids, num_series=len(lengths)
    )
    ll_ref = np.array([
        float(kalman.log_likelihood_sequential(
            kalman.leg_to_ssm(params, t), x))
        for t, x in parts
    ])
    np.testing.assert_allclose(np.asarray(ll_b), ll_ref, rtol=1e-9)

    g_k = jax.grad(
        lambda p: train_loop.nll_loss_kalman_stacked(p, ts, xs, ids)
    )(params)
    g_p = jax.grad(
        lambda p: train_loop.nll_loss_stacked(p, ts, xs, ids)
    )(params)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)

    # the filter-form loss plugs into the stacked train step
    opt = train_loop.make_optimizer("adam", 1e-2,
                                    reduce_on_plateau=False)
    st = opt.init(params)
    _, _, v = train_loop.train_step_stacked(params, st, ts, xs, ids,
                                            opt, False, "kalman")
    np.testing.assert_allclose(float(v), nll_k, rtol=1e-9)


def test_logdet_per_segment_engine():
    """pt.logdet_rows / logdet_per_segment on a synthetic block-diagonal
    block-tridiagonal system: per-segment values == dense slogdet of
    each segment's own subsystem, total == pt.logdet, and the analytic
    segment-weighted gradient == autodiff through the XLA rows sweep."""
    from cyclic_gps_tpu.ops import partitioned as pt

    rng = np.random.RandomState(0)
    d = 3
    lengths = (130, 55, 71)  # 256 total: partitioned path + recursion
    n = sum(lengths)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d))
    off_np = rng.randn(n - 1, d, d) / d
    ids_np = np.repeat(np.arange(len(lengths)), lengths)
    bounds = np.cumsum(lengths)[:-1]
    off_np[bounds - 1] = 0.0  # block-diagonal over the segments
    off = jnp.asarray(off_np)
    ids = jnp.asarray(ids_np, jnp.int32)

    rows = pt.logdet_rows(diag, off)
    np.testing.assert_allclose(float(jnp.sum(rows)),
                               float(pt.logdet(diag, off)), rtol=1e-12)
    seg = pt.logdet_per_segment(diag, off, ids, num_segments=3)
    start = 0
    for b, nb in enumerate(lengths):
        dense = np.zeros((nb * d, nb * d))
        for i in range(nb):
            dense[i * d:(i + 1) * d, i * d:(i + 1) * d] = np.asarray(
                diag[start + i])
            if i + 1 < nb:
                blk = np.asarray(off[start + i])
                dense[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = blk
                dense[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = blk.T
        np.testing.assert_allclose(float(seg[b]),
                                   np.linalg.slogdet(dense)[1], rtol=1e-9)
        start += nb

    # analytic adjoint (selected inversion) vs autodiff through the sweep
    w = jnp.asarray([0.5, -2.0, 1.3])

    def f_analytic(dg, of):
        return jnp.sum(w * pt.logdet_per_segment(dg, of, ids,
                                                 num_segments=3))

    def f_autodiff(dg, of):
        return jnp.sum(w * jax.ops.segment_sum(
            pt.logdet_rows(dg, of), ids, num_segments=3))

    g1 = jax.grad(f_analytic, argnums=(0, 1))(diag, off)
    g2 = jax.grad(f_autodiff, argnums=(0, 1))(diag, off)
    # the analytic off-gradient is the symmetric-convention one; autodiff
    # through the sweep reads only the stored lower triangle -- compare
    # the diag gradients directly and the off gradients through the
    # quadratic form they both represent
    np.testing.assert_allclose(
        np.asarray(0.5 * (g1[0] + np.swapaxes(g1[0], 1, 2))),
        np.asarray(0.5 * (g2[0] + np.swapaxes(g2[0], 1, 2))),
        rtol=1e-8, atol=1e-11,
    )
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-8, atol=1e-11)


def test_per_row_adjoint_guard(fresh_executable_state):
    """The per-row analytic adjoint is only the true adjoint for
    segment-constant cotangents over genuinely decoupled segments
    (pt._ld_rows_cm_bwd).  Misuse -- claiming segments across NONZERO
    couplings -- must NaN-poison the gradient rather than silently
    return wrong values (pt._rows_cotangent_guard).

    ``fresh_executable_state``: XLA:CPU compilation SIGSEGVs here with
    the module's accumulated executables resident (see conftest)."""
    from cyclic_gps_tpu.ops import partitioned as pt

    rng = np.random.RandomState(1)
    d, n = 3, 256
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d))
    off = jnp.asarray(rng.randn(n - 1, d, d) / d)  # fully coupled
    ids = jnp.asarray(np.repeat(np.arange(2), [128, 128]), jnp.int32)

    # misuse: distinct per-segment weights over a coupled "boundary"
    w = jnp.asarray([1.0, -1.0])
    g_bad = jax.grad(lambda dg: jnp.sum(w * pt.logdet_per_segment(
        dg, off, ids, num_segments=2)))(diag)
    assert bool(jnp.all(jnp.isnan(g_bad)))

    # a cotangent constant across every coupling never trips the guard
    # and reproduces the scalar logdet adjoint exactly
    g_ok = jax.grad(lambda dg: jnp.sum(pt.logdet_per_segment(
        dg, off, ids, num_segments=2)))(diag)
    g_ref = jax.grad(lambda dg: pt.logdet(dg, off))(diag)
    assert bool(jnp.all(jnp.isfinite(g_ok)))
    np.testing.assert_allclose(np.asarray(g_ok), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-12)


def test_stacked_gap_mask_pallas_parity(fresh_executable_state):
    """The fused K-system Pallas kernel consumes the series-boundary
    mask through its existing gap_valid input: interpret-mode parity
    against the masked XLA assembly, values and (g, boost) gradients.

    ``fresh_executable_state``: XLA:CPU compilation SIGSEGVs here with
    the module's accumulated executables resident (see conftest)."""
    from jax.experimental.pallas import tpu as pltpu

    rank, s, n = 3, 8, 230
    params = leg.init_params(jax.random.key(5), rank=rank, obs_dim=2,
                             dtype=jnp.float32)
    g = leg.g_matrix(params)
    llt = leg.lambda_lambda_t(params)
    boost = params.b.T @ jnp.linalg.solve(llt, params.b)
    ts = jnp.cumsum(
        jax.random.exponential(jax.random.key(6), (n,)) * 0.3 + 0.01
    ).astype(jnp.float32)
    ids = jnp.asarray(
        np.repeat(np.arange(4), [70, 60, 55, 45]), jnp.int32
    )
    mask = leg._series_gap_mask(ids).astype(jnp.float32)
    c = -(-n // s)

    k_x, o_x, lq_x = leg._k_gap_parts_xla(g, boost, ts, s, False, rank,
                                          jnp.float32, gap_mask=mask)
    with pltpu.force_tpu_interpret_mode():
        k_p, o_p, lq_p = leg._k_gap_parts_pallas(g, boost, ts, mask, s)
    np.testing.assert_allclose(np.asarray(k_p[..., :c]), np.asarray(k_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p[..., :c]), np.asarray(o_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lq_p[:, :c]), np.asarray(lq_x),
                               rtol=1e-4, atol=1e-6)

    rng = np.random.RandomState(8)
    w_k = jnp.asarray(rng.randn(*k_x.shape), jnp.float32)
    w_o = jnp.asarray(rng.randn(*o_x.shape), jnp.float32)

    def loss_x(g_, b_):
        k, o, lq = leg._k_gap_parts_xla(g_, b_, ts, s, False, rank,
                                        jnp.float32, gap_mask=mask)
        return jnp.sum(k * w_k) + jnp.sum(o * w_o) + 0.7 * jnp.sum(lq)

    def loss_p(g_, b_):
        k, o, lq = leg._k_gap_parts_pallas(g_, b_, ts, mask, s)
        return (jnp.sum(k[..., :c] * w_k) + jnp.sum(o[..., :c] * w_o)
                + 0.7 * jnp.sum(lq[:, :c]))

    g1 = jax.grad(loss_x, argnums=(0, 1))(g, boost)
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.grad(loss_p, argnums=(0, 1))(g, boost)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
