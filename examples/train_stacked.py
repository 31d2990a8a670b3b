"""Stacked multi-series training + batched predictions, end to end.

B short independent series sharing one LEG parameter set are trained as
ONE block-diagonal solve per step (`train_loop.fit_stacked` /
`leg.log_likelihood_stacked`), then a batch of prediction grids is
evaluated with ONE stacked posterior + selected inversion
(`leg.make_predictions_batch`).

The reference (cunningham-lab/cyclic-gps) trains one series at a time —
its dataset always returns element 0 (data_utils.py:73-75) and the
multi-sample trainer.py is dead code — so there is no reference
counterpart; this is the many-short-series workflow (e.g. per-station
sensor records) done TPU-style.

Usage: python examples/train_stacked.py [--steps 200]
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--series", type=int, default=16)
    ap.add_argument("--length", type=int, default=200)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (float64)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from cyclic_gps_tpu.data.synthetic import generate_data
    from cyclic_gps_tpu.models import leg
    from cyclic_gps_tpu.train import loop as train_loop

    dtype = jnp.float64 if args.cpu else jnp.float32
    b, nb = args.series, args.length

    # equal-length batch of irregular series (ragged batches work the
    # same way: concatenate and pass explicit ids)
    parts = [
        generate_data(nb, 2, dtype=dtype, spacing="irregular", seed=i)
        for i in range(b)
    ]
    ts_b = jnp.stack([p[0] for p in parts])
    xs_b = jnp.stack([p[1] for p in parts])
    ids = jnp.broadcast_to(jnp.arange(b)[:, None], (b, nb)).reshape(-1)

    params = leg.init_params(jax.random.key(0), rank=3, obs_dim=2,
                             dtype=dtype)
    result = train_loop.fit_stacked(
        params, ts_b.reshape(-1), xs_b.reshape(b * nb, -1), ids,
        num_steps=args.steps, lr=1e-2, log_every=max(args.steps // 10, 1),
    )
    print(f"NLL {result.losses[0]:.4f} -> {result.losses[-1]:.4f} "
          f"over {args.steps} steps on {b} series x {nb} points")

    # one stacked predictive pass over per-series target grids
    target_b = jnp.stack([
        jnp.linspace(float(p[0][0]) - 1.0, float(p[0][-1]) + 1.0, 100)
        for p in parts
    ]).astype(dtype)
    mean, cov = leg.make_predictions_batch(
        result.params, ts_b, xs_b, target_b, include_obs_noise=True
    )
    assert bool(jnp.isfinite(mean).all()) and bool(jnp.isfinite(cov).all())
    print(f"predictions: mean {mean.shape}, cov {cov.shape}, all finite")


if __name__ == "__main__":
    main()
