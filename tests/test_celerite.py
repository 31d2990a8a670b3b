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
