"""Naive dense O(N^2)/O(N^3) oracles for correctness testing.

Equivalents of the reference's model_utils.py:110-142.  Used only as test
oracles (tests/test_likelihood.py); never in the fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.models import leg

Array = jnp.ndarray


def prior_covariance(ts: Array, g: Array) -> Array:
    """Dense PEG prior covariance over grid ``ts``.

    Block (i, j) = expm(-0.5 |t_i - t_j| G) for i >= j and its transpose
    for i < j (reference model_utils.py:110-128).  Returns [N*r, N*r].
    """
    n = ts.shape[0]
    r = g.shape[0]
    absd = jnp.abs(ts[:, None] - ts[None, :])  # [N, N]
    e = leg.expm_batch(-0.5 * absd[..., None, None] * g[None, None])  # [N,N,r,r]
    lower = jnp.tril(jnp.ones((n, n), dtype=bool))
    blocks = jnp.where(
        lower[..., None, None], e, jnp.swapaxes(e, -1, -2)
    )
    return jnp.transpose(blocks, (0, 2, 1, 3)).reshape(n * r, n * r)


def log_marginal_likelihood(
    n_mat: Array, r_mat: Array, b: Array, llt: Array, ts: Array, xs: Array
) -> Array:
    """Dense marginal likelihood N(x; 0, Btilde Sigma Btilde^T + Ltilde)
    (reference model_utils.py:131-142)."""
    num = ts.shape[0]
    obs = b.shape[0]
    g = n_mat @ n_mat.T + r_mat - r_mat.T + leg.G_DIAG_EPS * jnp.eye(
        n_mat.shape[0], dtype=n_mat.dtype
    )
    sigma = prior_covariance(ts, g)
    b_tilde = jnp.kron(jnp.eye(num, dtype=b.dtype), b)
    llt_tilde = jnp.kron(jnp.eye(num, dtype=llt.dtype), llt)
    cov = b_tilde @ sigma @ b_tilde.T + llt_tilde
    x = xs.reshape(-1)
    mahal = x @ jnp.linalg.solve(cov, x)
    logdet = jnp.linalg.slogdet(2 * jnp.pi * cov)[1]
    return -0.5 * (mahal + logdet)


@jax.jit
def log_marginal_likelihood_from_params(params, ts: Array, xs: Array) -> Array:
    return log_marginal_likelihood(
        leg.n_matrix(params),
        leg.r_matrix(params),
        params.b,
        leg.lambda_lambda_t(params),
        ts,
        xs,
    )
