"""Prediction plotting (reference plotting_utils.py:5-37)."""

from __future__ import annotations

import numpy as np


def plot_predictions(
    ax,
    train_ts,
    train_xs,
    pred_ts_segments,
    pred_mean_segments,
    pred_var_segments=None,
    confidence_segments=None,
    dim: int = 0,
):
    """Observations + per-segment predictive means with +/-2 sigma bands.

    pred_*_segments are lists of arrays (one per disjoint prediction
    segment); variances may be [N, d, d] blocks or [N] scalars, or
    explicit confidence half-widths can be given.
    """
    train_ts = np.asarray(train_ts)
    train_xs = np.asarray(train_xs)
    ax.plot(train_ts, train_xs[:, dim], "k.", markersize=2, label="data")
    for i, (pt, pm) in enumerate(zip(pred_ts_segments, pred_mean_segments)):
        pt = np.asarray(pt)
        pm = np.asarray(pm)
        mean = pm[:, dim] if pm.ndim > 1 else pm
        ax.plot(pt, mean, label="prediction" if i == 0 else None)
        half = None
        if confidence_segments is not None:
            half = np.asarray(confidence_segments[i])
        elif pred_var_segments is not None:
            pv = np.asarray(pred_var_segments[i])
            var = pv[:, dim, dim] if pv.ndim == 3 else pv
            half = 2.0 * np.sqrt(var)
        if half is not None:
            ax.fill_between(pt, mean - half, mean + half, alpha=0.3)
    ax.legend()
    return ax
