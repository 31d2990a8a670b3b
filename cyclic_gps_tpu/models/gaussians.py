"""Small Gaussian-calculus helpers (batched, pure jax).

Equivalents of the reference's model_utils block builders and
``gaussian_stitch`` (cyclic_gps/model_utils.py:31-107), written batched so
prediction runs as one vmap over target points instead of a Python loop.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def build_2x2_block(a: Array, b: Array, c: Array, d: Array) -> Array:
    """[[a, b], [c, d]] with arbitrary leading batch dims."""
    return jnp.concatenate(
        [jnp.concatenate([a, b], axis=-1), jnp.concatenate([c, d], axis=-1)],
        axis=-2,
    )


def build_3x3_block(a, b, c, d, e, f, g, h, i) -> Array:
    rows = [
        jnp.concatenate([a, b, c], axis=-1),
        jnp.concatenate([d, e, f], axis=-1),
        jnp.concatenate([g, h, i], axis=-1),
    ]
    return jnp.concatenate(rows, axis=-2)


def gaussian_stitch(joint_mean, joint_cov, marginal_mean, marginal_cov):
    """Moments of q(y) = integral p(y|x) q(x) dx.

    p(x, y) = N(joint_mean, joint_cov) with x the first m coordinates;
    q(x) = N(marginal_mean, marginal_cov).  Reference:
    cyclic_gps/model_utils.py:64-107 (there with an explicit inverse; here
    with a solve).  Batched over leading dims.
    """
    m = marginal_cov.shape[-1]
    cov_xx = joint_cov[..., :m, :m]
    cov_yx = joint_cov[..., m:, :m]
    cov_xy = joint_cov[..., :m, m:]
    cov_yy = joint_cov[..., m:, m:]

    # T = cov_yx cov_xx^{-1}  (solve on the transposed system)
    T = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(cov_xx, -1, -2), jnp.swapaxes(cov_yx, -1, -2)),
        -1,
        -2,
    )
    mean = joint_mean[..., m:] + (T @ marginal_mean[..., None])[..., 0]
    conditional_cov = cov_yy - T @ cov_xy
    cov = conditional_cov + T @ marginal_cov @ jnp.swapaxes(T, -1, -2)
    return mean, cov
