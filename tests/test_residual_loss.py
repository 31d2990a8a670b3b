"""Stress qualification of the residual-form f32 likelihood (VERDICT r4 #7).

`leg.log_likelihood_residual` (train loss "cr_residual") is the
AUTO-SELECTED default for large irregular-grid f32 training
(train/loop.py), so its agreement with the exact blocked Kalman filter
must hold across parameter regimes, not just the single benchmark
setting.  Each regime below perturbs one failure axis:

  baseline     random non-normal N (full random matrix; orientation bugs
               are invisible at the default near-normal init)
  stiff_g      fast dynamics (N scaled up -> large |G| eigenvalues; the
               per-gap expm approaches its conditioning limits)
  small_lambda near-singular observation noise (K's data term dominates;
               innovation floors are small)
  long_gaps    gaps 10-40 (transitions decay to ~0; Q1 -> I)
  tiny_gaps    gaps ~1e-3 (THE smooth-fit regime that breaks the naive
               precision form: cond(K) ~ 1/dt)
  mixed_gaps   alternating 1e-3 / 10 gaps (both extremes in one system)
  rank5_multi  rank 5, obs_dim 3 (wider blocks, full B)

Contract tested per regime (all f32, irregular grids):
  * value parity vs the exact blocked Kalman filter,
  * gradient parity (cosine + relative magnitude) vs the filter's
    autodiff gradient,
  * finiteness (the NaN guard of the pipeline).
Plus one short Adam trajectory parity and one end-of-training
posterior-quality check (documented trust region: BENCHMARKS.md).

Reference contract being preserved: CR NLL == Kalman filter NLL,
/root/reference/tests/test_likelihood.py:9-29.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.train import loop as train_loop

N = 8192  # large enough for the chunked path + several reduction levels


def _ts(kind, n, seed):
    rng = np.random.RandomState(seed)
    if kind == "long":
        gaps = rng.randint(80, 320, n) * 0.125  # 10 .. 40
    elif kind == "tiny":
        gaps = rng.randint(1, 5, n) * 2.5e-4  # 2.5e-4 .. 1e-3
    elif kind == "mixed":
        gaps = np.where(rng.rand(n) < 0.5, 1e-3, 10.0)
    else:
        gaps = rng.randint(1, 5, n) * 0.125  # 0.125 .. 0.5
    return jnp.asarray(np.cumsum(gaps), jnp.float32)


def _regime(name):
    rng = np.random.RandomState(hash(name) % (2 ** 31))
    rank, obs, gaps, nscale, lam = 3, 1, "med", 1.0, None
    if name == "stiff_g":
        nscale = 6.0
    elif name == "small_lambda":
        lam = -3.5
    elif name == "long_gaps":
        gaps = "long"
    elif name == "tiny_gaps":
        gaps = "tiny"
    elif name == "mixed_gaps":
        gaps = "mixed"
    elif name == "rank5_multi":
        rank, obs = 5, 3
    params = leg.init_params(jax.random.key(7), rank=rank, obs_dim=obs,
                             dtype=jnp.float32)
    # random full N (non-normal G) -- regression-test policy (CLAUDE.md)
    n_rand = jnp.asarray(
        rng.randn(*params.n_params.shape), jnp.float32) * nscale
    params = params._replace(n_params=n_rand)
    if lam is not None:
        # lambda_params read through softplus: -3.5 -> Lambda ~ 0.03
        params = params._replace(
            lambda_params=jnp.full_like(params.lambda_params, lam))
    ts = _ts(gaps, N, seed=11)
    xs = jnp.asarray(rng.randn(N, obs), jnp.float32)
    return params, ts, xs


REGIMES = ["baseline", "stiff_g", "small_lambda", "long_gaps",
           "tiny_gaps", "mixed_gaps", "rank5_multi"]


@pytest.mark.parametrize("name", REGIMES)
def test_residual_loss_matches_exact_filter(name):
    params, ts, xs = _regime(name)
    l_res = float(train_loop.nll_loss_residual(params, ts, xs))
    l_kf = float(train_loop.nll_loss_kalman(params, ts, xs))
    assert np.isfinite(l_res), f"{name}: residual loss not finite"
    assert np.isfinite(l_kf), f"{name}: filter loss not finite"
    rel = abs(l_res - l_kf) / max(abs(l_kf), 1e-12)
    # f32: the two organisations agree to a few x 1e-5 in every regime
    assert rel < 3e-4, f"{name}: value rel diff {rel:.2e}"

    g_res = jax.grad(train_loop.nll_loss_residual)(params, ts, xs)
    g_kf = jax.grad(train_loop.nll_loss_kalman)(params, ts, xs)
    vr = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g_res)])
    vk = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g_kf)])
    assert np.all(np.isfinite(vr)), f"{name}: residual grad not finite"
    cos = float(vr @ vk / (np.linalg.norm(vr) * np.linalg.norm(vk)))
    mag = float(np.linalg.norm(vr) / np.linalg.norm(vk))
    assert cos > 0.999, f"{name}: grad cosine {cos}"
    assert 0.98 < mag < 1.02, f"{name}: grad magnitude ratio {mag}"


@pytest.mark.slow
def test_residual_loss_trajectory_and_posterior():
    """10 Adam steps track the exact filter's loss trajectory, and the
    residual-trained parameters give the same in-sample posterior as
    filter-trained ones (end-of-training quality, not just loss
    values)."""
    params, ts, xs = _regime("baseline")
    steps = 10
    fit_res = train_loop.fit(params, ts, xs, num_steps=steps,
                             loss="cr_residual", log_every=0)
    fit_kf = train_loop.fit(params, ts, xs, num_steps=steps,
                            loss="kalman", log_every=0)
    lr = np.asarray(fit_res.losses)
    lk = np.asarray(fit_kf.losses)
    np.testing.assert_allclose(lr, lk, rtol=2e-4)
    mean_r = leg.posterior_mean(fit_res.params, ts, xs)
    mean_k = leg.posterior_mean(fit_kf.params, ts, xs)
    scale = float(jnp.std(mean_k)) + 1e-12
    err = float(jnp.max(jnp.abs(mean_r - mean_k))) / scale
    assert err < 5e-3, f"posterior mean deviation {err:.2e}"
