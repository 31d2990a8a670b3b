"""Minimal LEG-GP fit demo (reference fit_example.ipynb).

Synthetic ~100-point irregular 2-dim series, rank-5 LEG, jitted optax
training, posterior interpolation plot.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.train import loop as train_loop

NUM_POINTS = 100
DATA_DIM = 2
RANK = 5
STEPS = 500


def main():
    ts, xs = generate_data(NUM_POINTS, DATA_DIM, dtype=jnp.float32,
                           spacing="irregular", seed=0)
    params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=DATA_DIM,
                             dtype=jnp.float32)
    result = train_loop.fit(params, ts, xs, num_steps=STEPS, lr=1e-2,
                            log_every=100)

    target = jnp.linspace(float(ts[0]), float(ts[-1]) + 10.0, 400)
    mean, cov = leg.make_predictions(result.params, ts, xs,
                                     target.astype(ts.dtype),
                                     include_obs_noise=True)
    print("final NLL:", result.losses[-1])
    print("prediction shapes:", mean.shape, cov.shape)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from cyclic_gps_tpu.utils.plotting import plot_predictions

        fig, ax = plt.subplots(figsize=(10, 4))
        plot_predictions(ax, ts, xs, [target], [mean], [cov])
        fig.savefig("fit_example.png", dpi=120)
        print("saved fit_example.png")
    except Exception as e:  # plotting is optional
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
