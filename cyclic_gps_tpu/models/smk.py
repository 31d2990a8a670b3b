"""Spectral-mixture-kernel exact GP baseline (pure JAX).

Competitor baseline matching the role of the reference's GPyTorch model
(cyclic_gps/other_gps.py:5-49): an exact O(N^3) GP with the spectral
mixture kernel (Wilson & Adams, 2013)

    k(tau) = sum_q w_q exp(-2 pi^2 tau^2 v_q) cos(2 pi mu_q tau)

with a constant mean, trained by Adam on the exact marginal likelihood.
Initialisation follows the same empirical heuristic as gpytorch's
``initialize_from_data``: inverse-scale weights from the data variance,
frequencies from the Nyquist range, length scales from gap statistics.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray


class SMKParams(NamedTuple):
    log_weights: Array  # [Q]
    log_means: Array  # [Q] frequencies mu_q
    log_scales: Array  # [Q] variances v_q
    constant_mean: Array  # []
    log_noise: Array  # []


def init_params(
    key: jax.Array, train_ts: Array, train_xs: Array, num_mixtures: int = 4,
    dtype=jnp.float64,
) -> SMKParams:
    """Empirical-spectrum initialisation (the analogue of gpytorch's
    ``initialize_from_data_empspect``): mixture frequencies at the
    strongest periodogram peaks, weights proportional to the spectral
    mass, bandwidths from the frequency resolution."""
    ts = np.asarray(train_ts, dtype=np.float64)
    xs = np.asarray(train_xs, dtype=np.float64).reshape(-1)
    n = len(ts)
    gaps = np.diff(np.sort(ts))
    med_gap = max(np.median(gaps[gaps > 0]), 1e-6)
    span = ts.max() - ts.min() + med_gap
    q = num_mixtures

    # periodogram on the (approximately regular) index grid
    y = xs - xs.mean()
    spec = np.abs(np.fft.rfft(y)) ** 2
    freqs = np.fft.rfftfreq(n, d=med_gap)
    spec[0] = 0.0  # drop DC
    order = np.argsort(spec)[::-1]
    top = [i for i in order[: 4 * q] if freqs[i] > 0][:q]
    while len(top) < q:
        top.append(order[len(top) % max(1, len(order))])
    means = np.maximum(freqs[np.asarray(top, dtype=int)], 1e-4 / span)
    mass = spec[np.asarray(top, dtype=int)]
    mass = mass / max(mass.sum(), 1e-12)
    weights = np.maximum(mass * xs.var(), 1e-8)
    scales = np.full(q, (1.0 / span) ** 2)
    return SMKParams(
        jnp.asarray(np.log(weights), dtype),
        jnp.asarray(np.log(means), dtype),
        jnp.asarray(np.log(scales), dtype),
        jnp.asarray(xs.mean(), dtype),
        jnp.asarray(np.log(0.1 * xs.var() + 1e-6), dtype),
    )


def _jitter(dtype) -> float:
    """Gram-matrix jitter: f32 needs a much larger floor for the dense
    Cholesky of smooth kernels (observed NaNs at N ~ 300 otherwise)."""
    return 1e-4 if dtype == jnp.float32 else 1e-8


def kernel(params: SMKParams, t1: Array, t2: Array) -> Array:
    """SMK gram matrix between time vectors t1 [N], t2 [M] -> [N, M]."""
    tau = t1[:, None] - t2[None, :]
    w = jnp.exp(params.log_weights)
    mu = jnp.exp(params.log_means)
    v = jnp.exp(params.log_scales)
    comp = (
        w[:, None, None]
        * jnp.exp(-2.0 * jnp.pi**2 * tau[None] ** 2 * v[:, None, None])
        * jnp.cos(2.0 * jnp.pi * mu[:, None, None] * tau[None])
    )
    return jnp.sum(comp, axis=0)


@jax.jit
def neg_log_marginal_likelihood(
    params: SMKParams, ts: Array, xs: Array
) -> Array:
    n = ts.shape[0]
    y = xs.reshape(-1) - params.constant_mean
    k = kernel(params, ts, ts) + (
        jnp.exp(params.log_noise) + _jitter(ts.dtype)
    ) * jnp.eye(n, dtype=ts.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.solve_triangular(chol, y, lower=True)
    return 0.5 * (
        jnp.sum(alpha**2)
        + n * jnp.log(2 * jnp.pi)
        + 2 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    )


def fit(
    params: SMKParams, ts: Array, xs: Array,
    num_steps: int = 1000, lr: float = 1e-2, log_every: int = 0,
) -> Tuple[SMKParams, list]:
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(neg_log_marginal_likelihood)(
            p, ts, xs
        )
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for i in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"SMK iter {i}/{num_steps} loss {float(loss):.3f}")
    return params, losses


@jax.jit
def predict(
    params: SMKParams, ts: Array, xs: Array, target_ts: Array
) -> Tuple[Array, Array]:
    """Exact GP predictive mean and variance (with observation noise)."""
    n = ts.shape[0]
    y = xs.reshape(-1) - params.constant_mean
    noise = jnp.exp(params.log_noise) + _jitter(ts.dtype)
    k = kernel(params, ts, ts) + noise * jnp.eye(n, dtype=ts.dtype)
    k_star = kernel(params, target_ts, ts)  # [M, N]
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    mean = params.constant_mean + k_star @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = (
        kernel(params, target_ts, target_ts).diagonal()
        - jnp.sum(v**2, axis=0)
        + noise
    )
    return mean, var
