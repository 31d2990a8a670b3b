"""End-to-end training slice: autodiff through the whole CR stack.

The reference's minimal fit (fit_example.ipynb: rank-5 LEG on a ~100-point
irregular 2-dim series via Lightning) becomes a jitted optax loop; the
contract is that the NLL decreases and gradients match finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.train import loop as train_loop


def test_nll_gradients_match_finite_differences():
    ts, xs = generate_data(12, 2, dtype=jnp.float64, spacing="irregular",
                           seed=21)
    params = leg.init_params(jax.random.key(0), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    loss_fn = lambda p: train_loop.nll_loss(p, ts, xs)
    grads = jax.grad(loss_fn)(params)

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(grads)
    eps = 1e-6
    rng = np.random.RandomState(0)
    for idx in rng.choice(flat.size, size=6, replace=False):
        bump = np.zeros(flat.size)
        bump[idx] = eps
        fp = float(loss_fn(unravel(flat + bump)))
        fm = float(loss_fn(unravel(flat - bump)))
        fd = (fp - fm) / (2 * eps)
        assert np.allclose(float(gflat[idx]), fd, rtol=1e-5, atol=1e-8), (
            idx, float(gflat[idx]), fd)


def test_adam_training_decreases_nll():
    ts, xs = generate_data(100, 2, dtype=jnp.float64, spacing="irregular",
                           seed=22)
    params = leg.init_params(jax.random.key(1), rank=5, obs_dim=2,
                             dtype=jnp.float64)
    result = train_loop.fit(params, ts, xs, num_steps=60, optimizer="adam",
                            lr=1e-2, log_every=0)
    assert np.isfinite(result.losses).all()
    assert np.mean(result.losses[-10:]) < result.losses[0] - 1e-3


def test_lbfgs_training_decreases_nll():
    ts, xs = generate_data(60, 1, dtype=jnp.float64, spacing="regular",
                           seed=23)
    params = leg.init_params(jax.random.key(2), rank=3, obs_dim=1,
                             dtype=jnp.float64)
    result = train_loop.fit(params, ts, xs, num_steps=25, optimizer="lbfgs",
                            lr=1.0, log_every=0)
    assert np.isfinite(result.losses).all()
    assert np.mean(result.losses[-5:]) < result.losses[0]


def test_params_checkpoint_roundtrip(tmp_path):
    params = leg.init_params(jax.random.key(3), rank=4, obs_dim=2,
                             dtype=jnp.float64)
    path = str(tmp_path / "params.npz")
    train_loop.save_params(path, params)
    loaded = train_loop.load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_f32_end_to_end_train_predict():
    """The full f32 user journey stays finite: Kalman-loss training,
    smoother-based posterior, predictions with positive variances.
    (The precision-form posterior NaNs at f32 once the learned process is
    smooth -- regression for the dtype-based routing.)"""
    ts, xs = generate_data(128, 2, dtype=jnp.float32, spacing="irregular",
                           seed=1)
    params = leg.init_params(jax.random.key(0), rank=4, obs_dim=2,
                             dtype=jnp.float32)
    res = train_loop.fit(params, ts, xs, num_steps=60, lr=1e-2, log_every=0)
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]

    mean, cov_d, cov_o = leg.insample_posterior(res.params, ts, xs)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(cov_d)).all()
    assert np.isfinite(np.asarray(cov_o)).all()

    target = jnp.asarray(
        np.linspace(-2.0, float(ts[-1]) + 5.0, 40), jnp.float32
    )
    pm, pc = leg.make_predictions(res.params, ts, xs, target,
                                  include_obs_noise=True)
    assert np.isfinite(np.asarray(pm)).all()
    assert np.all(np.diagonal(np.asarray(pc), axis1=1, axis2=2) > 0)


def test_nll_gradients_chunked_path_finite_differences():
    """Gradients through the LARGE-N (chunk-major) likelihood path, which
    uses the analytic custom VJP of pt.mahal_and_logdet_cm (one solve +
    one selected inversion) instead of autodiff through the scan."""
    ts, xs = generate_data(100, 2, dtype=jnp.float64, spacing="irregular",
                           seed=23)
    params = leg.init_params(jax.random.key(2), rank=3, obs_dim=2,
                             dtype=jnp.float64)
    loss_fn = lambda p: train_loop.nll_loss(p, ts, xs)
    grads = jax.grad(loss_fn)(params)

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(grads)
    eps = 1e-6
    rng = np.random.RandomState(1)
    for idx in rng.choice(flat.size, size=6, replace=False):
        bump = np.zeros(flat.size)
        bump[idx] = eps
        fp = float(loss_fn(unravel(flat + bump)))
        fm = float(loss_fn(unravel(flat - bump)))
        fd = (fp - fm) / (2 * eps)
        assert np.allclose(float(gflat[idx]), fd, rtol=1e-5, atol=1e-8), (
            idx, float(gflat[idx]), fd)


def test_mahal_cm_custom_vjp_matches_autodiff():
    """The analytic VJP of mahal_and_logdet_cm equals autodiff through
    the scan engine (natural-layout entry, which has no custom VJP)."""
    from cyclic_gps_tpu.ops import partitioned as pt

    n, d, s = 96, 3, 8
    rng = np.random.RandomState(3)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d))
    off = jnp.asarray(rng.randn(n - 1, d, d) / d)
    y = jnp.asarray(rng.randn(n, d))

    def via_cm(diag, off, y):
        R, O, yc, _ = pt._chunk_layout(diag, off, y, s)
        mh, ld = pt.mahal_and_logdet_cm(R, O, yc)
        return 0.7 * mh + 1.3 * ld

    def via_scan(diag, off, y):
        # raw scan-engine recursion (no custom VJP): the autodiff oracle
        mh, ld = pt._mahal_and_logdet_impl(diag, off, y, s, 0.0)
        return 0.7 * mh + 1.3 * ld

    g_cm = jax.grad(via_cm, argnums=(0, 1, 2))(diag, off, y)
    g_sc = jax.grad(via_scan, argnums=(0, 1, 2))(diag, off, y)
    # the diag blocks are symmetric inputs: the scan engine reads only
    # their lower triangles (autodiff gradient lower-concentrated) while
    # the analytic VJP returns the canonical symmetric gradient -- they
    # agree as linear functionals on symmetric perturbations, i.e. after
    # symmetrisation
    sym = lambda a: 0.5 * (a + np.swapaxes(np.asarray(a), -1, -2))
    np.testing.assert_allclose(sym(g_cm[0]), sym(g_sc[0]),
                               rtol=1e-8, atol=1e-10)
    for a, b in zip(g_cm[1:], g_sc[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_solve_cm_custom_vjp_matches_autodiff():
    """The analytic VJP of solve_cm (used by the posterior paths, and
    what makes the Pallas solve differentiable) equals autodiff through
    the scan engine's natural-layout solve."""
    from cyclic_gps_tpu.ops import partitioned as pt

    n, d, s = 96, 3, 8
    rng = np.random.RandomState(5)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d))
    off = jnp.asarray(rng.randn(n - 1, d, d) / d)
    y = jnp.asarray(rng.randn(n, d))
    w = jnp.asarray(rng.randn(n, d))  # probe for the solution cotangent

    def via_cm(diag, off, y):
        R, O, yc, _ = pt._chunk_layout(diag, off, y, s)
        x, ld = pt.solve_cm(R, O, yc)
        return jnp.sum(w * x[:n]) + 1.3 * ld

    def via_scan(diag, off, y):
        # raw scan-engine recursion (no custom VJP): the autodiff oracle
        x, ld = pt._solve_impl(diag, off, y, s, 0.0)
        return jnp.sum(w * x) + 1.3 * ld

    g_cm = jax.grad(via_cm, argnums=(0, 1, 2))(diag, off, y)
    g_sc = jax.grad(via_scan, argnums=(0, 1, 2))(diag, off, y)
    sym = lambda a: 0.5 * (a + np.swapaxes(np.asarray(a), -1, -2))
    np.testing.assert_allclose(sym(g_cm[0]), sym(g_sc[0]),
                               rtol=1e-8, atol=1e-10)
    for a, b in zip(g_cm[1:], g_sc[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
