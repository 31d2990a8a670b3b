"""End-to-end LEG training on the BART dataset (reference train_leg.py).

Loads hourly Embarcadero arrivals, trains a rank-5 LEG on the first half,
predicts interpolation (train_ts + 0.5) and a forecast segment, plots.

Usage: python examples/train_leg.py /path/to/bart.csv [params.npz]
With a params.npz argument, training is skipped and the parameters are
injected directly (the reference's LOAD_PARAMS pathway,
train_leg.py:40-62).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import sys

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.data.loaders import load_bart
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.train import loop as train_loop

RANK = 5
STEPS = 5000
LR = 1e-2


def main(path, params_path=None):
    series = load_bart(path, cache="bart_cache.npz")
    train_ts = series.train_ts.astype(jnp.float32)
    train_xs = series.train_xs.astype(jnp.float32)

    if params_path:
        params = train_loop.load_params(params_path, dtype=jnp.float32)
        print("loaded params from", params_path)
    else:
        params = leg.init_params(jax.random.key(0), rank=RANK, obs_dim=1,
                                 dtype=jnp.float32)
        result = train_loop.fit(params, train_ts, train_xs,
                                num_steps=STEPS, lr=LR, log_every=500)
        params = result.params
        train_loop.save_params("bart_leg_params.npz", params)

    interp_ts = train_ts + 0.5
    fc_ts = series.all_ts[len(train_ts):].astype(jnp.float32)

    i_mean, i_cov = leg.make_predictions(params, train_ts, train_xs,
                                         interp_ts, include_obs_noise=True)
    f_mean, f_cov = leg.make_predictions(params, train_ts, train_xs,
                                         fc_ts, include_obs_noise=True)
    print("interp/forecast shapes:", i_mean.shape, f_mean.shape)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from cyclic_gps_tpu.utils.plotting import plot_predictions

        fig, ax = plt.subplots(figsize=(12, 4))
        plot_predictions(
            ax, series.all_ts, series.all_xs,
            [interp_ts, fc_ts], [i_mean, f_mean], [i_cov, f_cov],
        )
        fig.savefig("bart_predictions.png", dpi=120)
        print("saved bart_predictions.png")
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
