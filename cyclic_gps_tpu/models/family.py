"""LEGFamily: class facade over the functional LEG model.

Mirrors the reference's class-based API (cyclic_gps/models.py:20) so users
migrating from cunningham-lab/cyclic-gps find the same surface: the
constructor signature, `log_likelihood`, `compute_PEG_precision`,
`compute_insample_posterior`, `predictive_posterior`, `make_predictions`,
`sample_from_prior`, `parameter_count`, plus `fit` (replacing the
Lightning trainer).  State is a params pytree; every method delegates to
the pure jitted functions in models/leg.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.models import leg

Array = jnp.ndarray


class LEGFamily:
    """z ~ PEG(N, R);  x(t) ~ Normal(B z(t), Lambda Lambda^T).

    Constructor matches the reference (models.py:27): rank, obs_dim,
    prior_process_noise_level, prior_length_scale, lr; ``data_type`` is a
    jnp dtype.  ``optimizer`` in {"adam", "lbfgs"}.
    """

    def __init__(
        self,
        rank: int,
        obs_dim: int,
        prior_process_noise_level: float = 1.0,
        prior_length_scale: float = 0.2,
        optimizer: str = "adam",
        data_type=jnp.float32,
        lr: float = 1e-2,
        seed: int = 0,
    ) -> None:
        self.rank = rank
        self.obs_dim = obs_dim
        self.optimizer = optimizer
        self.data_type = data_type
        self.lr = lr
        self.params = leg.init_params(
            jax.random.key(seed),
            rank=rank,
            obs_dim=obs_dim,
            prior_process_noise_level=prior_process_noise_level,
            prior_length_scale=prior_length_scale,
            dtype=data_type,
        )

    # -- parameter access ------------------------------------------------
    @property
    def parameter_count(self) -> int:
        return leg.parameter_count(self.rank, self.obs_dim)

    @property
    def N(self) -> Array:
        return leg.n_matrix(self.params)

    @property
    def R(self) -> Array:
        return leg.r_matrix(self.params)

    @property
    def Lambda(self) -> Array:
        return leg.lambda_matrix(self.params)

    @property
    def B(self) -> Array:
        return self.params.b

    @property
    def G(self) -> Array:
        return leg.g_matrix(self.params)

    def calc_Lambda_Lambda_T(self) -> Array:
        return leg.lambda_lambda_t(self.params)

    # -- model quantities --------------------------------------------------
    def compute_PEG_precision(self, ts: Array) -> Tuple[Array, Array]:
        return leg.peg_precision(self.G, ts)

    def log_likelihood(self, ts: Array, xs: Array) -> Array:
        return leg.log_likelihood(self.params, ts, xs)

    def compute_insample_posterior(self, ts: Array, xs: Array):
        """(posterior mean [N, r], cov diag [N, r, r], cov off [N-1, r, r])."""
        return leg.insample_posterior(self.params, ts, xs)

    def predictive_posterior(self, ts: Array, xs: Array, target_ts: Array):
        return leg.predictive_posterior(self.params, ts, xs, target_ts)

    def make_predictions(
        self, ts: Array, xs: Array, target_ts: Array,
        include_obs_noise: bool = False,
    ):
        return leg.make_predictions(
            self.params, ts, xs, target_ts,
            include_obs_noise=include_obs_noise,
        )

    def sample_from_prior(self, ts: Array, num: int = 1, seed: int = 0):
        return leg.sample_from_prior(
            self.params, jax.random.key(seed), ts, num=num
        )

    # -- training ----------------------------------------------------------
    def fit(
        self,
        ts: Array,
        xs: Array,
        num_steps: int = 1000,
        log_every: int = 100,
        loss: Optional[str] = None,
    ):
        """Train in place; returns the loss history."""
        from cyclic_gps_tpu.train import loop as train_loop

        result = train_loop.fit(
            self.params, ts, xs, num_steps=num_steps,
            optimizer=self.optimizer, lr=self.lr, log_every=log_every,
            loss=loss,
        )
        self.params = result.params
        return result.losses

    def save(self, path: str) -> None:
        from cyclic_gps_tpu.train import loop as train_loop

        train_loop.save_params(path, self.params)

    def load(self, path: str) -> "LEGFamily":
        from cyclic_gps_tpu.train import loop as train_loop

        self.params = train_loop.load_params(path, dtype=self.data_type)
        return self
