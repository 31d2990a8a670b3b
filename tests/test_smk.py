"""Spectral-mixture-kernel GP baseline sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import smk


def test_kernel_properties():
    params = smk.SMKParams(
        log_weights=jnp.log(jnp.asarray([0.5, 0.25])),
        log_means=jnp.log(jnp.asarray([0.1, 0.4])),
        log_scales=jnp.log(jnp.asarray([0.01, 0.02])),
        constant_mean=jnp.asarray(0.0),
        log_noise=jnp.log(jnp.asarray(0.1)),
    )
    ts = jnp.asarray(np.sort(np.random.RandomState(0).rand(40)) * 10)
    k = np.asarray(smk.kernel(params, ts, ts))
    np.testing.assert_allclose(k, k.T, atol=1e-12)
    # k(0) = sum of weights on the diagonal
    np.testing.assert_allclose(np.diag(k), 0.75, atol=1e-12)
    # PSD (up to roundoff)
    assert np.linalg.eigvalsh(k).min() > -1e-9


def test_training_decreases_nll_and_predicts():
    # a clearly periodic signal -- the spectral mixture kernel's home turf
    rng = np.random.RandomState(3)
    ts = jnp.asarray(np.arange(150, dtype=np.float64))
    y = np.sin(0.3 * np.asarray(ts)) + 0.5 * np.cos(
        0.07 * np.asarray(ts)
    ) + 0.05 * rng.randn(150)
    xs = jnp.asarray(y[:, None])
    params = smk.init_params(jax.random.key(0), ts, xs, num_mixtures=3,
                             dtype=jnp.float64)
    nll0 = float(smk.neg_log_marginal_likelihood(params, ts, xs[:, 0]))
    params, losses = smk.fit(params, ts, xs[:, 0], num_steps=400, lr=5e-2)
    assert losses[-1] < nll0
    mean, var = smk.predict(params, ts, xs[:, 0], ts[:10] + 0.5)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.all(np.asarray(var) > 0)
    # at the training points the posterior mean approaches the data
    m2, _ = smk.predict(params, ts, xs[:, 0], ts)
    corr = np.corrcoef(np.asarray(m2), np.asarray(xs[:, 0]))[0, 1]
    assert corr > 0.9
