"""Celerite-structured LEG family (the reference's commented-out
CeleriteFamily sketch, models.py:552-592, made real)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import celerite, leg


def test_structure_and_parameter_count():
    nb, obs = 3, 2
    p = celerite.init_params(jax.random.key(0), nb, obs, dtype=jnp.float64)
    assert p.rank == 2 * nb and p.nblocks == nb
    flat, _ = jax.flatten_util.ravel_pytree(p)
    assert flat.size == celerite.parameter_count(nb, obs)

    full = celerite.expand(p)
    # G is block-diagonal with 2x2 blocks (celerite structure)
    g = np.asarray(leg.g_matrix(full))
    g_nodiag = g - np.diag(np.diag(g))
    mask = np.kron(np.eye(nb), np.ones((2, 2)))
    assert np.allclose(g_nodiag * (1 - mask), 0.0, atol=1e-12)
    # N expands to the masked positions only
    n_mat = np.asarray(leg.n_matrix(full))
    allowed = np.eye(2 * nb) + np.diag(
        np.tile([1.0, 0.0], nb)[:-1], -1
    )
    assert np.allclose(n_mat * (1 - allowed), 0.0)


def test_likelihood_matches_expanded_leg():
    nb, obs, n = 2, 1, 60
    ts, xs = generate_data(n, obs, dtype=jnp.float64, spacing="irregular",
                           seed=29)
    p = celerite.init_params(jax.random.key(1), nb, obs, dtype=jnp.float64)
    ll_c = float(celerite.log_likelihood(p, ts, xs))
    ll_l = float(leg.log_likelihood(celerite.expand(p), ts, xs))
    np.testing.assert_allclose(ll_c, ll_l, rtol=1e-12)
    assert np.isfinite(ll_c)

    m, c = celerite.make_predictions(p, ts, xs, ts[:10] + 0.25)
    assert np.isfinite(np.asarray(m)).all()


def test_closed_form_gap_terms_match_dense_pipeline():
    """The per-block closed-form emission (expm1-based 2x2 exponentials,
    adjugate inverses) equals the dense Van Loan / Pade pipeline on the
    expanded generator across gap scales -- including tiny gaps (the
    cancellation regime) and huge ones."""
    nb = 3
    p = celerite.init_params(jax.random.key(7), nb, 2, dtype=jnp.float64)
    # make the blocks non-trivial: couplings, unequal rates, rotation
    p = p._replace(
        n_diag=p.n_diag + jax.random.normal(jax.random.key(8),
                                            p.n_diag.shape) * 0.3,
        n_sub=jnp.asarray([0.5, -0.2, 0.9]),
        r_sub=jnp.asarray([2.0, -0.7, 0.01]),
    )
    # moderate-to-large gaps: the dense Van Loan oracle is fully accurate
    diffs = jnp.asarray(np.logspace(-3, 3, 300))
    g_full = leg.g_matrix(celerite.expand(p))
    dense_fn = leg._gap_terms_dense(g_full)
    off_d, dl_d, dr_d, lq_d = dense_fn(diffs)
    off_c, dl_c, dr_c, lq_c = celerite.gap_terms(p)(diffs)
    np.testing.assert_allclose(np.asarray(off_c), np.asarray(off_d),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(dl_c), np.asarray(dl_d),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(dr_c), np.asarray(dr_d),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lq_c), np.asarray(lq_d),
                               rtol=1e-9, atol=1e-12)

    # tiny gaps: the ORACLE itself degrades (Van Loan's Q1 is accurate
    # only absolutely at the O(1) expm-entry scale, so Q1^{-1} ~ 1/d
    # loses ~ -log10(d) digits); the closed form is exact.  Check the
    # closed form against the oracle at its achievable tolerance, and
    # exactly against the defining identities Q1 = I - e e^T,
    # off = -Q1^{-1} e (residual form, conditioning-free).
    tiny = jnp.asarray(np.logspace(-7, -3, 120))
    off_d, dl_d, dr_d, lq_d = dense_fn(tiny)
    off_c, dl_c, dr_c, lq_c = celerite.gap_terms(p)(tiny)
    np.testing.assert_allclose(np.asarray(off_c), np.asarray(off_d),
                               rtol=3e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lq_c), np.asarray(lq_d),
                               rtol=1e-9, atol=1e-12)
    # identity check per block: Q1 (I + d_left = Q1^{-1}) must invert to
    # I - e e^T built from the closed-form e -- residual at f64 eps scale
    gb = celerite.g_blocks(p)
    ecm1, esnc, al, be, ga = celerite._block_e_terms(gb, tiny)
    e00 = 1.0 + ecm1 + esnc * al
    e01 = esnc * be
    e10 = esnc * ga
    e11 = 1.0 + ecm1 - esnc * al
    for k in range(nb):
        sl = np.s_[2 * k:2 * k + 2, 2 * k:2 * k + 2]
        q1inv = np.asarray(dl_c)[sl] + np.eye(2)[:, :, None]
        e_k = np.stack(
            [np.stack([e00[k], e01[k]], -1),
             np.stack([e10[k], e11[k]], -1)], -2
        ).transpose(1, 2, 0)  # [2, 2, M]
        for m in range(0, tiny.shape[0], 13):
            q1 = np.eye(2) - e_k[:, :, m] @ e_k[:, :, m].T
            resid = q1inv[:, :, m] @ q1 - np.eye(2)
            # the I - e e^T reference itself carries ~eps/d relative
            # error at gap d (cancellation), amplified by Q1^{-1} ~ 1/d
            assert np.max(np.abs(resid)) < 1e-7


def test_fast_likelihood_matches_expansion_large_n():
    """Above the chunked threshold the closed-form emission feeds the
    partitioned engine; value AND structured-parameter gradient match
    the expansion route."""
    nb, obs, n = 2, 2, 600  # > max(_TERMINAL, 2s): chunked path
    ts, xs = generate_data(n, obs, dtype=jnp.float64, spacing="irregular",
                           seed=41)
    p = celerite.init_params(jax.random.key(5), nb, obs, dtype=jnp.float64)
    p = p._replace(r_sub=jnp.asarray([1.5, -0.4]),
                   n_sub=jnp.asarray([0.3, 0.8]))

    ll_fast = celerite.log_likelihood(p, ts, xs)
    ll_orac = leg.log_likelihood(celerite.expand(p), ts, xs)
    np.testing.assert_allclose(float(ll_fast), float(ll_orac), rtol=1e-10)

    g_fast = jax.grad(lambda q: celerite.log_likelihood(q, ts, xs))(p)
    g_orac = jax.grad(
        lambda q: leg.log_likelihood(celerite.expand(q), ts, xs)
    )(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_orac)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)

    # regular-grid entry too (one gap evaluation broadcast)
    ts_r = jnp.arange(n, dtype=jnp.float64) * 0.05
    ll_fr = celerite.log_likelihood(p, ts_r, xs, regular=True)
    ll_or = leg.log_likelihood(celerite.expand(p), ts_r, xs, regular=True)
    np.testing.assert_allclose(float(ll_fr), float(ll_or), rtol=1e-10)


def test_fused_celerite_sweep_matches_expansion():
    """The mega-fused celerite sweep (ops/celerite_pallas: closed-form
    2x2 blocks constructed in VMEM, eliminated in place -- the
    O(N * nblocks) solve) == the expansion oracle and the XLA
    closed-form route: values and structured-parameter gradients.
    Interpret mode in CI; f32 fixtures (the kernel's dispatch dtype)."""
    from jax.experimental.pallas import tpu as pltpu

    nb, obs, n = 2, 1, 300
    ts, xs = generate_data(n, obs, dtype=jnp.float32, spacing="irregular",
                           seed=17)
    p = celerite.init_params(jax.random.key(3), nb, obs, dtype=jnp.float32)
    p = p._replace(r_sub=jnp.asarray([1.2, -0.5], jnp.float32),
                   n_sub=jnp.asarray([0.4, 0.7], jnp.float32))

    ll_x = celerite.log_likelihood(p, ts, xs, backend="xla")
    ll_o = leg.log_likelihood(celerite.expand(p), ts, xs, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        ll_f = celerite.log_likelihood(p, ts, xs, backend="pallas")
    np.testing.assert_allclose(float(ll_f), float(ll_x), rtol=2e-5)
    np.testing.assert_allclose(float(ll_f), float(ll_o), rtol=2e-5)

    g_x = jax.grad(
        lambda q: celerite.log_likelihood(q, ts, xs, backend="xla")
    )(p)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(
            lambda q: celerite.log_likelihood(q, ts, xs, backend="pallas")
        )(p)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_chunked_filter_likelihood_matches_engine():
    """The chunk-parallel conditional Kalman filter (the O(N r^2 q)
    celerite solve, ops/chunked_filter.py) == the precision-engine
    route == the expansion oracle, value and gradient (CPU f64, XLA
    twin).  The chunk decomposition (per-chunk filter conditioned on
    the boundary latent + exact boundary-chain integral) must be exact,
    not approximate."""
    nb, obs, n = 2, 2, 700  # > max(_TERMINAL, 2s): chunked path engages
    ts, xs = generate_data(n, obs, dtype=jnp.float64, spacing="irregular",
                           seed=23)
    p = celerite.init_params(jax.random.key(9), nb, obs, dtype=jnp.float64)
    p = p._replace(r_sub=jnp.asarray([1.1, -0.6]),
                   n_sub=jnp.asarray([0.2, 0.9]))

    ll_new = celerite.log_likelihood_filter(p, ts, xs, backend="xla")
    ll_old = celerite.log_likelihood(p, ts, xs, backend="xla")
    ll_orc = leg.log_likelihood(celerite.expand(p), ts, xs, backend="xla")
    np.testing.assert_allclose(float(ll_new), float(ll_old), rtol=1e-11)
    np.testing.assert_allclose(float(ll_new), float(ll_orc), rtol=1e-11)

    g_new = jax.grad(
        lambda q: celerite.log_likelihood_filter(q, ts, xs, backend="xla")
    )(p)
    g_old = jax.grad(
        lambda q: celerite.log_likelihood(q, ts, xs, backend="xla")
    )(p)
    for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_old)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-10)


def test_filter_pallas_kernel_matches_xla_twin():
    """The fused conditional-filter Pallas sweep
    (ops/celerite_pallas.celerite_filter_sweep_pallas) == the XLA scan
    twin: per-chunk boundary statistics, the assembled likelihood, and
    the structured-parameter gradient (whose backward replays the XLA
    twin).  Interpret mode in CI; f32 fixtures (the dispatch dtype)."""
    from jax.experimental.pallas import tpu as pltpu

    nb, obs, n = 2, 1, 700
    ts, xs = generate_data(n, obs, dtype=jnp.float32, spacing="irregular",
                           seed=37)
    p = celerite.init_params(jax.random.key(11), nb, obs,
                             dtype=jnp.float32)
    p = p._replace(r_sub=jnp.asarray([0.9, -0.3], jnp.float32),
                   n_sub=jnp.asarray([0.5, 0.6], jnp.float32))

    ll_x = celerite.log_likelihood_filter(p, ts, xs, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        ll_p = celerite.log_likelihood_filter(p, ts, xs, backend="pallas")
    np.testing.assert_allclose(float(ll_p), float(ll_x), rtol=2e-5)

    g_x = jax.grad(
        lambda q: celerite.log_likelihood_filter(q, ts, xs, backend="xla")
    )(p)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(
            lambda q: celerite.log_likelihood_filter(q, ts, xs,
                                                     backend="pallas")
        )(p)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_training_in_reduced_space():
    """Optimisation moves only the structured parameters and the NLL
    decreases (gradients flow through the expansion)."""
    nb, obs, n = 2, 1, 80
    ts, xs = generate_data(n, obs, dtype=jnp.float64, spacing="regular",
                           seed=31)
    p = celerite.init_params(jax.random.key(2), nb, obs, dtype=jnp.float64)
    opt = optax.adam(1e-2)
    state = opt.init(p)

    @jax.jit
    def step(p, state):
        loss, g = jax.value_and_grad(celerite.nll_loss)(p, ts, xs)
        updates, state = opt.update(g, state)
        return optax.apply_updates(p, updates), state, loss

    losses = []
    for _ in range(40):
        p, state, loss = step(p, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < losses[0]
    # structure preserved after training
    full = celerite.expand(p)
    n_mat = np.asarray(leg.n_matrix(full))
    allowed = np.eye(2 * nb) + np.diag(np.tile([1.0, 0.0], nb)[:-1], -1)
    assert np.allclose(n_mat * (1 - allowed), 0.0)
