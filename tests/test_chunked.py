"""Chunk-major emission paths and the Pallas sweep kernel (interpreter).

The likelihood/posterior switch to chunk-major emission at N >= 64; the
parity suites (test_likelihood at n in {100, 150}) already exercise it.
These tests target the pieces directly at sizes where the chunked path is
active, plus the Pallas kernel in interpreter mode (no TPU in CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclic_gps_tpu.baselines import kalman
from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import cyclic_reduction as cr
from cyclic_gps_tpu.ops import partitioned as pt


def _params(rank, obs):
    p = leg.init_params(jax.random.key(3), rank=rank, obs_dim=obs,
                        dtype=jnp.float64)
    n_rand = jax.random.normal(jax.random.key(4), p.n_params.shape,
                               dtype=jnp.float64)
    return p._replace(n_params=n_rand)


@pytest.mark.parametrize("spacing", ["regular", "irregular"])
@pytest.mark.parametrize("n", [150, 200])
def test_chunked_posterior_matches_cr(spacing, n):
    params = _params(4, 2)
    ts, xs = generate_data(n, 2, dtype=jnp.float64, spacing=spacing, seed=n)
    mean, cov_d, cov_o = leg.insample_posterior(params, ts, xs)
    pm = leg.posterior_mean(params, ts, xs)

    k_diag, k_off = leg.posterior_precision(params, ts)
    dec = cr.decompose(k_diag, k_off)
    m_ref = cr.solve(dec, leg.compute_v(params, xs))
    cd_ref, co_ref = cr.inverse_blocks(dec)

    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(m_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_d), np.asarray(cd_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_o), np.asarray(co_ref),
                               atol=1e-8)


def test_chunked_regular_equals_irregular_path():
    params = _params(3, 1)
    ts = jnp.cumsum(jnp.full(256, 0.7, dtype=jnp.float64))
    xs = jax.random.normal(jax.random.key(9), (256, 1), dtype=jnp.float64)
    a = float(leg.log_likelihood(params, ts, xs))
    b = float(leg.log_likelihood(params, ts, xs, regular=True))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_transition_and_noise_large_gaps():
    """The hybrid Q construction is accurate for every gap scale (the
    pure Van Loan form loses ~e^{|dG|/2} * eps absolute for large gaps)."""
    import scipy.linalg as sla

    params = _params(4, 2)
    g = leg.g_matrix(params)
    gn = np.asarray(g)
    diffs = jnp.asarray(np.logspace(-6, 2, 30))
    e, q = leg.transition_and_noise(g, diffs)
    for i, d in enumerate(np.asarray(diffs)):
        e_ref = sla.expm(-0.5 * d * gn)
        q_ref = np.eye(4) - e_ref @ e_ref.T
        assert np.abs(np.asarray(e[i]) - e_ref).max() < 1e-13
        scale = max(np.abs(q_ref).max(), 1e-12)
        assert np.abs(np.asarray(q[i]) - q_ref).max() / scale < 1e-9 or d < 1e-3


def _pallas_system(n, d, s, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d))
    off = jnp.asarray(rng.randn(n - 1, d, d) / d)
    y = jnp.asarray(rng.randn(n, d))
    return pt._chunk_layout(
        diag.astype(jnp.float32), off.astype(jnp.float32),
        y.astype(jnp.float32), s,
    )[:3]


@pytest.mark.parametrize("jitter", [0.0, 1e-3])
def test_pallas_sweep_matches_scan(jitter):
    """The Pallas forward sweep (interpret mode in CI; same code path
    compiles on TPU -- see PALLAS_TPU.md for the on-device artifact)
    matches the XLA scan sweep, including the jitter path."""
    from jax.experimental.pallas import tpu as pltpu

    from cyclic_gps_tpu.ops import pallas_sweep

    d, s, n = 3, 8, 256
    R_cm, O_cm, y_cm = _pallas_system(n, d, s)
    with pltpu.force_tpu_interpret_mode():
        outs = pallas_sweep.forward_sweep_pallas(R_cm, O_cm, y_cm,
                                                 jitter=jitter)
    state, w1, _ = pt._forward_sweep(R_cm, O_cm, y_cm, jitter, None)
    np.testing.assert_allclose(np.asarray(outs[0]),
                               np.asarray(state.acc00), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs[2]),
                               np.asarray(state.w0), atol=1e-4)
    np.testing.assert_allclose(float(outs[6]), float(state.mh), rtol=1e-5)
    np.testing.assert_allclose(float(outs[7]), float(state.ld), rtol=1e-5)
    # per-row pivot log-dets (the kernel's lq lane output) == the XLA
    # "ldrows" collector, and the full pallas-backend rows entry == xla
    _, _, ld_rows_x = pt._forward_sweep(R_cm, O_cm, y_cm, jitter,
                                        collect="ldrows")
    np.testing.assert_allclose(np.asarray(outs[8]),
                               np.asarray(ld_rows_x), atol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        rows_p = pt.logdet_rows_cm(R_cm, O_cm, jitter=jitter,
                                   backend="pallas")
    rows_x = pt.logdet_rows_cm(R_cm, O_cm, jitter=jitter, backend="xla")
    np.testing.assert_allclose(np.asarray(rows_p), np.asarray(rows_x),
                               atol=1e-5)


@pytest.mark.parametrize("n", [256, 250])  # 250: chunk-pad + kernel-pad
def test_pallas_solve_matches_xla(n):
    """The full Pallas solve path (forward-with-collect kernel + reduced
    solve + descending-step back-substitution kernel) matches the XLA
    path, including non-chunk-aligned N (kernel-tile padding)."""
    from jax.experimental.pallas import tpu as pltpu

    d, s = 3, 8
    R_cm, O_cm, y_cm = _pallas_system(n, d, s, seed=n)
    with pltpu.force_tpu_interpret_mode():
        x_p, ld_p = pt.solve_cm(R_cm, O_cm, y_cm, backend="pallas")
        mh_p, ld2_p = pt.mahal_and_logdet_cm(R_cm, O_cm, y_cm,
                                             backend="pallas")
    x_x, ld_x = pt.solve_cm(R_cm, O_cm, y_cm)
    mh_x, ld2_x = pt.mahal_and_logdet_cm(R_cm, O_cm, y_cm)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x), atol=1e-4)
    np.testing.assert_allclose(float(ld_p), float(ld_x), rtol=1e-5)
    np.testing.assert_allclose(float(mh_p), float(mh_x), rtol=1e-4)
    np.testing.assert_allclose(float(ld2_p), float(ld2_x), rtol=1e-5)


def test_gap_fused_likelihood_matches_xla():
    """The mega-fused gaps->likelihood kernel (leg._gap_mahal_fused:
    per-row precision blocks constructed in VMEM and eliminated in
    place, no materialized K) == the two-stage XLA assembly: values,
    parameter gradients, and the stacked-series masked variant.
    Interpret mode in CI; f32 fixtures (the kernel's dispatch dtype)."""
    from jax.experimental.pallas import tpu as pltpu

    n, rank, obs = 300, 3, 2
    ts, xs = generate_data(n, obs, dtype=jnp.float32,
                           spacing="irregular", seed=21)
    params = leg.init_params(jax.random.key(5), rank=rank, obs_dim=obs,
                             dtype=jnp.float32)

    ll_ref = leg.log_likelihood(params, ts, xs, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        ll_f = leg.log_likelihood(params, ts, xs, backend="pallas")
    np.testing.assert_allclose(float(ll_f), float(ll_ref), rtol=2e-5)

    g_ref = jax.grad(
        lambda p: leg.log_likelihood(p, ts, xs, backend="xla")
    )(params)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(
            lambda p: leg.log_likelihood(p, ts, xs, backend="pallas")
        )(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)

    # stacked: the series-boundary mask rides the kernel's gap_valid
    ids = jnp.asarray(
        np.repeat(np.arange(3), [120, 90, 90]), jnp.int32
    )
    ts_st = jnp.concatenate([ts[:120], ts[:90], ts[:90]])
    xs_st = jnp.concatenate([xs[:120], xs[:90], xs[:90]])
    ll_st_ref = leg.log_likelihood_stacked(params, ts_st, xs_st, ids,
                                           backend="xla")
    with pltpu.force_tpu_interpret_mode():
        ll_st_f = leg.log_likelihood_stacked(params, ts_st, xs_st, ids,
                                             backend="pallas")
    np.testing.assert_allclose(float(ll_st_f), float(ll_st_ref),
                               rtol=2e-5)


@pytest.mark.parametrize("n", [256, 250])
def test_fused_solve_ld_rows_matches_separate(n):
    """pt.solve_and_ld_rows_cm (ONE sweep) == separate solve_cm +
    logdet_rows_cm on both backends, sum(rows) == log|J|, and the shared
    analytic adjoint == the separate entries' adjoints under the same
    (segment-constant-assumption) cotangents."""
    from jax.experimental.pallas import tpu as pltpu

    d, s = 3, 8
    R_cm, O_cm, y_cm = _pallas_system(n, d, s, seed=n + 2)
    x_f, rows_f = pt.solve_and_ld_rows_cm(R_cm, O_cm, y_cm, backend="xla")
    x_x, ld_x = pt.solve_cm(R_cm, O_cm, y_cm)
    rows_x = pt.logdet_rows_cm(R_cm, O_cm, backend="xla")
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rows_f), np.asarray(rows_x),
                               atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(rows_f)), float(ld_x),
                               rtol=1e-5)
    with pltpu.force_tpu_interpret_mode():
        x_p, rows_p = pt.solve_and_ld_rows_cm(R_cm, O_cm, y_cm,
                                              backend="pallas")
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rows_p), np.asarray(rows_f),
                               atol=1e-5)

    # shared-adjoint parity: grad of a weighted consumption through the
    # fused entry == the same weights through the separate entries.
    # The fixture is one fully-coupled system, so the per-row adjoint's
    # validity domain is a GLOBALLY constant row cotangent (a
    # non-constant one NaN-poisons both sides by design --
    # pt._rows_cotangent_guard, tested in test_batched.py).
    w_cm = jnp.full_like(rows_f, 0.7)
    gv = jnp.asarray(np.random.RandomState(n + 1).randn(*x_f.shape),
                     x_f.dtype)

    def fused(R, O, y):
        x, rows = pt.solve_and_ld_rows_cm(R, O, y, backend="xla")
        return jnp.sum(gv * x) + jnp.sum(w_cm * rows)

    def separate(R, O, y):
        x, _ = pt.solve_cm(R, O, y)
        rows = pt.logdet_rows_cm(R, O, backend="xla")
        return jnp.sum(gv * x) + jnp.sum(w_cm * rows)

    g_f = jax.grad(fused, argnums=(0, 1, 2))(R_cm, O_cm, y_cm)
    g_s = jax.grad(separate, argnums=(0, 1, 2))(R_cm, O_cm, y_cm)
    for a, b in zip(g_f, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


@pytest.mark.parametrize("n", [256, 250])
def test_pallas_selected_inversion_matches_xla(n):
    """The Pallas selected-inversion path (raw-factor forward sweep +
    Takahashi backward kernel) matches the XLA path, including
    non-chunk-aligned N."""
    from jax.experimental.pallas import tpu as pltpu

    d, s = 3, 8
    R_cm, O_cm, _ = _pallas_system(n, d, s, seed=n + 1)
    with pltpu.force_tpu_interpret_mode():
        dp, op_ = pt.inverse_blocks_cm(R_cm, O_cm, backend="pallas")
    dx, ox = pt.inverse_blocks_cm(R_cm, O_cm)
    # f32 fixtures; the f64 interpret-mode parity is exact (~1e-16)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(op_), np.asarray(ox), atol=1e-6)


@pytest.mark.parametrize("n", [256, 250])  # 250: chunk-pad + kernel-pad
def test_pallas_fused_solve_inverse_matches_xla(n):
    """The FUSED backward path (round 5: solve+inverse collect sweep +
    ONE descending back-substitution + hat-Takahashi kernel) matches the
    separate solve and selected-inversion paths -- this is the shared
    backward of every analytic VJP (`pt._solve_inverse_from_cm`)."""
    from jax.experimental.pallas import tpu as pltpu

    d, s = 3, 8
    R_cm, O_cm, y_cm = _pallas_system(n, d, s, seed=n + 2)
    with pltpu.force_tpu_interpret_mode():
        x_p, sd_p, so_p = pt.solve_and_inverse_cm(R_cm, O_cm, y_cm,
                                                  backend="pallas")
    x_x, _ = pt.solve_cm(R_cm, O_cm, y_cm)
    sd_x, so_x = pt.inverse_blocks_cm(R_cm, O_cm)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sd_p), np.asarray(sd_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(so_p), np.asarray(so_x),
                               atol=1e-5)


def _filter_fixture(s=6, c=5, r=4, qd=2, seed=0, dtype=jnp.float64):
    """Random SPD-noise conditional-filter inputs (valid mask includes
    zeros so the masked no-op branch is differentiated too)."""
    rng = np.random.RandomState(seed)
    e = rng.randn(s, c, r, r) * 0.3 + np.eye(r)
    q = rng.randn(s, c, r, r) * 0.2
    q = q @ q.transpose(0, 1, 3, 2) + 0.1 * np.eye(r)
    b = rng.randn(qd, r)
    lam = rng.randn(qd, qd) * 0.3
    lam = lam @ lam.T + 0.5 * np.eye(qd)
    y = rng.randn(s, c, qd)
    valid = (rng.rand(s, c) > 0.2).astype(float)
    # invalid gaps must carry e = I, q = 0 (the contract); tie a few
    gv = (rng.rand(s, c) > 0.15).astype(float)[:, :, None, None]
    e = e * gv + np.eye(r) * (1.0 - gv)
    q = q * gv
    return tuple(jnp.asarray(a, dtype) for a in (e, q, b, lam, y, valid))


def test_conditional_filter_analytic_adjoint_matches_autodiff():
    """The analytic O(r^2 q) adjoint of the conditional Kalman filter
    (chunked_filter.conditional_filter_adjoint_xla) == jax.vjp through
    the forward scan, to machine precision, for every input cotangent
    (e, q, B, Lambda, y) under a nontrivial output cotangent on ALL
    seven statistics.  This is the backward that takes celerite
    training to filter-route speed (VERDICT r4 #2)."""
    from cyclic_gps_tpu.ops import chunked_filter as cf

    e, q, b, lam, y, valid = _filter_fixture()
    rng = np.random.RandomState(99)
    out0 = cf.conditional_filter_xla(e, q, b, lam, y, valid)
    cots = cf.ChunkFilterOut(*[
        jnp.asarray(rng.randn(*np.asarray(o).shape), o.dtype)
        for o in out0
    ])

    _, vjp = jax.vjp(
        lambda e_, q_, b_, l_, y_: cf.conditional_filter_xla(
            e_, q_, b_, l_, y_, valid), e, q, b, lam, y)
    ref = vjp(cots)

    _, hist = cf.conditional_filter_collect_xla(e, q, b, lam, y, valid)
    got = cf.conditional_filter_adjoint_xla(e, q, b, lam, y, valid,
                                            hist, tuple(cots))
    for g, r_, name in zip(got, ref, ["e", "q", "B", "lam", "y"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r_), rtol=5e-12, atol=5e-12,
            err_msg=f"cotangent mismatch: {name}")

    # the custom_vjp wrapper routes grads through the analytic adjoint
    def loss(e_, q_, b_, l_, y_):
        out = cf.conditional_filter(e_, q_, b_, l_, y_, valid)
        return sum(jnp.vdot(c_, o) for c_, o in zip(cots, out))

    g2 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(e, q, b, lam, y)
    for g, r_ in zip(g2, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r_),
                                   rtol=5e-12, atol=5e-12)
