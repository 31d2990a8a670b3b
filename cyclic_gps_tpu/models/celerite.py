"""Celerite-structured LEG family.

The reference sketches (commented-out TF code, models.py:552-592) a LEG
family whose latent generator is constrained to celerite structure: with
rank = 2 * nblocks,

  N: diagonal entries plus the subdiagonal entries (2k+1, 2k)
     (one coupling per 2-block),
  R: only the subdiagonal entries (2k+1, 2k),

so G = N N^T + R - R^T (+ eps I) is block-diagonal with 2x2 blocks --
each block a damped oscillator, the celerite kernel class (sums of
exponentially-damped sinusoids).  The parameter count drops from
O(rank^2) to O(nblocks).

This implementation makes the sketch real by EXPANDING the structured
parameters into a full `leg.LEGParams` pytree (zeros in the masked-out
positions) and reusing every LEG function -- likelihood, posteriors,
predictions, training -- unchanged; gradients flow through the expansion
so optimisation stays in the reduced parameter space.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cyclic_gps_tpu.models import leg

Array = jnp.ndarray


class CeleriteParams(NamedTuple):
    """Structured parameters: rank = 2 * nblocks.

    n_diag:  [rank]     diagonal of N
    n_sub:   [nblocks]  N[2k+1, 2k]
    r_sub:   [nblocks]  R[2k+1, 2k] (antisymmetrised by g_matrix)
    lambda_params: [obs*(obs+1)/2] packed lower-tri (softplus on read)
    b:       [obs_dim, rank]
    """

    n_diag: Array
    n_sub: Array
    r_sub: Array
    lambda_params: Array
    b: Array

    @property
    def nblocks(self) -> int:
        return self.n_sub.shape[0]

    @property
    def rank(self) -> int:
        return self.b.shape[1]

    @property
    def obs_dim(self) -> int:
        return self.b.shape[0]


def parameter_count(nblocks: int, obs_dim: int) -> int:
    """3*nblocks (N) + nblocks (R) + obs tril + B (reference psize,
    models.py:570-575, with the structured N/R masks)."""
    rank = 2 * nblocks
    return (
        rank + nblocks + nblocks
        + obs_dim * (obs_dim + 1) // 2
        + obs_dim * rank
    )


def init_params(
    key: jax.Array,
    nblocks: int,
    obs_dim: int,
    prior_process_noise_level: float = 1.0,
    prior_length_scale: float = 0.2,
    dtype=jnp.float32,
) -> CeleriteParams:
    """Initial guess mirroring the reference sketch (models.py:577-583):
    N = noise_level * I (structured entries), R subdiagonal random *
    length_scale, Lambda = 0.1 I, B = 0.5 ones / row norm."""
    rank = 2 * nblocks
    n_diag = jnp.full((rank,), prior_process_noise_level, dtype=dtype)
    n_sub = jnp.zeros((nblocks,), dtype=dtype)
    r_sub = (
        jax.random.normal(key, (nblocks,), dtype=dtype) * prior_length_scale
    )
    lam = 0.1 * jnp.eye(obs_dim, dtype=dtype)
    lambda_params = lam[jnp.tril_indices(obs_dim)]
    b = jnp.ones((obs_dim, rank), dtype=dtype)
    b = 0.5 * b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True))
    return CeleriteParams(n_diag, n_sub, r_sub, lambda_params, b)


def _sub_positions(nblocks: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row/col indices of the structured subdiagonal entries
    (2k+1, 2k)."""
    rows = 2 * np.arange(nblocks) + 1
    return rows, rows - 1


def expand(params: CeleriteParams) -> leg.LEGParams:
    """Structured -> full LEG parameters (packed tril layout); the
    masked-out positions are exact zeros, so gradients of any LEG
    function w.r.t. the structured parameters flow through this map."""
    rank = params.rank
    nb = params.nblocks
    dtype = params.n_diag.dtype

    n_full = jnp.zeros((rank, rank), dtype=dtype)
    n_full = n_full.at[jnp.arange(rank), jnp.arange(rank)].set(
        params.n_diag
    )
    rows, cols = _sub_positions(nb)
    n_full = n_full.at[rows, cols].set(params.n_sub)

    r_full = jnp.zeros((rank, rank), dtype=dtype)
    r_full = r_full.at[rows, cols].set(params.r_sub)

    return leg.LEGParams(
        n_params=n_full[jnp.tril_indices(rank)],
        r_params=r_full[jnp.tril_indices(rank, -1)],
        lambda_params=params.lambda_params,
        b=params.b,
    )


@partial(jax.jit, static_argnames=("regular",))
def log_likelihood(
    params: CeleriteParams, ts: Array, xs: Array, regular: bool = False
) -> Array:
    """LEG marginal log-likelihood under the celerite structure."""
    return leg.log_likelihood(expand(params), ts, xs, regular=regular)


def make_predictions(params: CeleriteParams, ts, xs, target_ts, **kw):
    return leg.make_predictions(expand(params), ts, xs, target_ts, **kw)


def nll_loss(params: CeleriteParams, ts: Array, xs: Array) -> Array:
    """-log_likelihood / nobs on the structured parameters (drop-in for
    train.loop-style optimisation)."""
    return -log_likelihood(params, ts, xs) / xs.size
