"""Dataset loaders (reference dataset_process_utils.py).

CO2:  Mauna Loa monthly CO2 CSV -> standardized series with the reference's
      train split (interpolation gap [262:502) and a 28-sample forecast
      holdout, dataset_process_utils.py:9-25).
BART: hourly Embarcadero arrivals for Jan 2011 -- re-implemented with a
      vectorised pandas groupby instead of the reference's triple loop
      (dataset_process_utils.py:44-61), with an npz cache.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class Series(NamedTuple):
    all_ts: Array
    all_xs: Array
    train_ts: Array
    train_xs: Array


def load_co2(path: str, dtype=jnp.float64) -> Series:
    import pandas as pd

    names = [
        "year", "month", "decimal date", "average", "interpolated",
        "trend", "mysterycolumn1", "mysterycolumn2",
    ]
    data = pd.read_csv(path, comment="#", names=names, header=0)
    arr = data.to_numpy().astype(np.float64)
    all_ts = arr[:, 2]
    all_xs = arr[:, 3:4]

    # one unit of time ~= one sample; standardize values
    all_ts = 12.0 * (all_ts - all_ts.min())
    all_xs = (all_xs - all_xs.mean()) / all_xs.std()

    train_ts = np.concatenate([all_ts[:262], all_ts[502:-28]])
    train_xs = np.concatenate([all_xs[:262], all_xs[502:-28]])
    return Series(
        jnp.asarray(all_ts, dtype), jnp.asarray(all_xs, dtype),
        jnp.asarray(train_ts, dtype), jnp.asarray(train_xs, dtype),
    )


def load_bart(
    path: str,
    dtype=jnp.float64,
    cache: str | None = None,
    destination: str = "EMBR",
) -> Series:
    if cache and os.path.exists(cache):
        z = np.load(cache)
        return Series(*(jnp.asarray(z[k], dtype) for k in
                        ("all_ts", "all_xs", "train_ts", "train_xs")))

    import pandas as pd

    df = pd.read_csv(
        path,
        names=["day", "hour", "origin", "destination", "trip count"],
        header=None,
        index_col=None,
    )
    days = pd.date_range(start="1/1/2011", end="1/31/2011").strftime(
        "%Y-%m-%d"
    )
    day_index = {d: i for i, d in enumerate(days)}
    df = df[df["day"].isin(day_index) & (df["destination"] == destination)]
    slot = df["day"].map(day_index).to_numpy() * 24 + df["hour"].to_numpy()
    arrivals = np.zeros(len(days) * 24)
    np.add.at(arrivals, slot.astype(int), df["trip count"].to_numpy())

    all_ts = np.arange(len(days) * 24, dtype=np.float64)
    all_xs = (arrivals - arrivals.mean()) / arrivals.std()
    all_xs = all_xs[:, None]
    half = len(all_ts) // 2
    out = Series(
        jnp.asarray(all_ts, dtype), jnp.asarray(all_xs, dtype),
        jnp.asarray(all_ts[:half], dtype), jnp.asarray(all_xs[:half], dtype),
    )
    if cache:
        np.savez(
            cache,
            all_ts=np.asarray(out.all_ts), all_xs=np.asarray(out.all_xs),
            train_ts=np.asarray(out.train_ts),
            train_xs=np.asarray(out.train_xs),
        )
    return out


def threshold_timesteps(ts, thresh: float = 1e-10, check: bool = True):
    """Deduplicate near-coincident time stamps.

    Returns (thresholded ts, index map original -> thresholded).  The
    reference's version is broken (torch.cum_sum, data_utils.py:12-42);
    this is the working equivalent.
    """
    ts = np.asarray(ts)
    diff = ts[1:] - ts[:-1]
    if check and not np.all(diff >= 0):
        raise ValueError("timestamps must be sorted")
    good = np.concatenate([[True], diff > thresh])
    idxs = np.cumsum(good.astype(np.int64)) - 1
    return jnp.asarray(ts[good]), jnp.asarray(idxs)


def percentage_diff(a, b) -> float:
    """Mean absolute percentage difference (reference data_utils.py:77-78)."""
    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.sum(np.abs((b - a) / a)) / a.size * 100.0)
