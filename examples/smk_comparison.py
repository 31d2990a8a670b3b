"""LEG vs spectral-mixture-kernel GP (reference SMK_GP_comparison.py).

Trains both models on the same series and compares held-out predictive
quality and wall-clock.  The SMK GP is the exact O(N^3) competitor; the
LEG model is O(N).

Usage: python examples/smk_comparison.py [/path/to/bart.csv]
Without a path, a synthetic series is used.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg, smk
from cyclic_gps_tpu.train import loop as train_loop


def main(path=None):
    if path:
        from cyclic_gps_tpu.data.loaders import load_bart

        series = load_bart(path, cache="bart_cache.npz")
        ts = series.train_ts.astype(jnp.float32)
        xs = series.train_xs.astype(jnp.float32)
        test_ts = series.all_ts[len(ts):].astype(jnp.float32)
        test_xs = np.asarray(series.all_xs[len(ts):, 0])
    else:
        all_ts, all_xs = generate_data(400, 1, dtype=jnp.float32,
                                       spacing="regular", seed=0)
        ts, xs = all_ts[:300], all_xs[:300]
        test_ts, test_xs = all_ts[300:], np.asarray(all_xs[300:, 0])

    # LEG
    t0 = time.time()
    lp = leg.init_params(jax.random.key(0), rank=5, obs_dim=1,
                         dtype=jnp.float32)
    lres = train_loop.fit(lp, ts, xs, num_steps=800, lr=1e-2, log_every=0)
    leg_mean, leg_cov = leg.make_predictions(
        lres.params, ts, xs, test_ts, include_obs_noise=True
    )
    t_leg = time.time() - t0

    # SMK
    t0 = time.time()
    sp = smk.init_params(jax.random.key(1), ts, xs, num_mixtures=4,
                         dtype=jnp.float32)
    sp, _ = smk.fit(sp, ts, xs[:, 0], num_steps=800, lr=1e-2)
    smk_mean, smk_var = smk.predict(sp, ts, xs[:, 0], test_ts)
    t_smk = time.time() - t0

    leg_rmse = float(np.sqrt(np.mean((np.asarray(leg_mean[:, 0]) - test_xs) ** 2)))
    smk_rmse = float(np.sqrt(np.mean((np.asarray(smk_mean) - test_xs) ** 2)))
    print(f"LEG: rmse {leg_rmse:.4f}  ({t_leg:.1f}s)")
    print(f"SMK: rmse {smk_rmse:.4f}  ({t_smk:.1f}s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
