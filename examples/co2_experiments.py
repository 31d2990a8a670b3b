"""Mauna Loa CO2 experiments (reference co2_data_experiments.py).

Train a rank-5 LEG on the CO2 series with an interpolation gap and a
forecast holdout, then predict across the gap and 20 years ahead.

Usage: python examples/co2_experiments.py /path/to/co2_mm_mlo.csv
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import sys

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.data.loaders import load_co2
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.train import loop as train_loop

RANK = 5
STEPS = 2000
LR = 1e-2


def main(path):
    series = load_co2(path)
    train_ts = series.train_ts.astype(jnp.float32)
    train_xs = series.train_xs.astype(jnp.float32)

    params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=1,
                             dtype=jnp.float32)
    result = train_loop.fit(params, train_ts, train_xs, num_steps=STEPS,
                            lr=LR, log_every=200)
    train_loop.save_params("co2_leg_params.npz", result.params)

    # interpolate the held-out gap and forecast 20 years (12*20 time
    # units); on a short (sample) file the gap slice is empty, so fall
    # back to a within-range probe grid
    if series.all_ts.shape[0] > 502:
        gap_ts = series.all_ts[262:502].astype(jnp.float32)
        gap_truth = np.asarray(series.all_xs[262:502, 0])
    else:
        gap_ts = (train_ts[:-1] + 0.5 * (train_ts[1:] - train_ts[:-1]))
        gap_truth = None
    fc_ts = jnp.linspace(
        float(series.all_ts[-1]), float(series.all_ts[-1]) + 12 * 20, 200
    ).astype(jnp.float32)

    gap_mean, gap_cov = leg.make_predictions(
        result.params, train_ts, train_xs, gap_ts, include_obs_noise=True
    )
    fc_mean, fc_cov = leg.make_predictions(
        result.params, train_ts, train_xs, fc_ts, include_obs_noise=True
    )

    if gap_truth is not None:
        rmse = float(np.sqrt(np.mean(
            (np.asarray(gap_mean[:, 0]) - gap_truth) ** 2)))
        print(f"gap interpolation RMSE (standardised units): {rmse:.4f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from cyclic_gps_tpu.utils.plotting import plot_predictions

        fig, ax = plt.subplots(figsize=(12, 4))
        plot_predictions(
            ax, series.all_ts, series.all_xs,
            [gap_ts, fc_ts], [gap_mean, fc_mean], [gap_cov, fc_cov],
        )
        fig.savefig("co2_predictions.png", dpi=120)
        print("saved co2_predictions.png")
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1])
