"""Training: jitted optax loop replacing the reference's PyTorch Lightning
integration (reference models.py:374-392, train_leg.py:36-37).

The reference trains full-batch (one "batch" = the whole series) with Adam
or LBFGS and a reduce-on-plateau scheduler monitoring "NLL".  Here the
entire update -- likelihood, gradient, optimiser -- is one jitted function;
`fit` drives it from the host and collects metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cyclic_gps_tpu.models import leg

Array = jnp.ndarray


def nll_loss(params: leg.LEGParams, ts: Array, xs: Array) -> Array:
    """-log_likelihood / nobs (reference models.py:374-381:
    nobs = batch * N * obs_dim; batch is 1 here)."""
    nobs = xs.size
    return -leg.log_likelihood(params, ts, xs) / nobs


def _kalman_ll(params: leg.LEGParams, ts: Array, xs: Array,
               regular: bool) -> Array:
    from cyclic_gps_tpu.baselines import kalman

    ssm = kalman.leg_to_ssm(params, ts, regular=regular)
    if xs.shape[0] > kalman.SMOOTHER_BLOCK:
        # flat associative scan overflows HBM beyond T ~ 1e6; the blocked
        # filter carries (m, P, ll) across checkpointed blocks so both the
        # forward AND the gradient run in O(block) memory at T = 1e7
        return kalman.log_likelihood_blocked(ssm, xs)
    return kalman.filter_parallel(ssm, xs)[2]


def nll_loss_kalman(params: leg.LEGParams, ts: Array, xs: Array) -> Array:
    """Same NLL through the parallel Kalman filter.

    Mathematically identical to `nll_loss`, but numerically robust in
    single precision: the precision-form likelihood factorises
    K = Sigma^{-1} + ..., whose blocks scale like 1/(dt * lambda_min(sym G))
    and overwhelm f32 once the learned process gets very smooth, whereas
    the filter's innovation covariances are bounded below by the
    observation noise.  Use for f32 training runs that drift into smooth
    regimes; ~2-3x slower than the partitioned-solver loss.  Above
    T = 2^17 it dispatches to the blocked (O(block)-memory) filter so
    f32 training works at T = 1e7.
    """
    return -_kalman_ll(params, ts, xs, regular=False) / xs.size


def nll_loss_kalman_regular(params: leg.LEGParams, ts: Array,
                            xs: Array) -> Array:
    """`nll_loss_kalman` for a uniform grid: ONE matrix exponential
    broadcast over the T steps instead of T Van Loan constructions — the
    dominant setup cost at large T (``fit`` auto-selects this when the
    observed grid is uniform)."""
    return -_kalman_ll(params, ts, xs, regular=True) / xs.size


SS_T0 = 2048  # steady-state switch point: exact for decay rates
              # lambda*dt > ~ -ln(eps)/(2*SS_T0) ~ 0.004


def nll_loss_kalman_steady(params: leg.LEGParams, ts: Array,
                           xs: Array) -> Array:
    """Uniform-grid NLL via the STEADY-STATE filter: exact per-step
    Riccati gains for the first SS_T0 steps, then the constant-gain
    tail as dense MXU-matmul convolutions (kalman.log_likelihood_steady)
    — the fast path for large-T f32 training (the exact associative
    filter's per-element LU combines cost ~44 s/step at T = 1e7; this is
    matmul-bound).  Exact to working precision while the Riccati
    recursion converges within SS_T0 steps; `fit` auto-selects it only
    after checking `kalman.steady_state_gap` at the initial parameters,
    and a fit drifting to an extremely smooth process (decay rate
    lambda*dt < ~0.004) should force loss="kalman_regular" instead."""
    from cyclic_gps_tpu.baselines import kalman

    ssm = kalman.leg_to_ssm(params, ts, regular=True)
    return -kalman.log_likelihood_steady(
        ssm.a[0], ssm.q[0], ssm.h, ssm.r, xs, t0=SS_T0
    ) / xs.size


def nll_loss_stacked(params: leg.LEGParams, ts: Array, xs: Array,
                     series_ids: Array, regular: bool = False) -> Array:
    """Mean per-observation NLL over B independent series stacked into
    ONE solver pass (leg.log_likelihood_stacked): the within-chip batch
    counterpart of `parallel.data_parallel.batch_nll` (which shards
    series over devices).  Precision-form caveat from `nll_loss` applies
    per series, but short series keep dt*smoothness moderate -- the f32
    regime this path targets (many short series) is exactly where the
    precision form stays well-conditioned."""
    nobs = xs.size
    return -leg.log_likelihood_stacked(
        params, ts, xs, series_ids, regular=regular
    ) / nobs


def nll_loss_kalman_stacked(params: leg.LEGParams, ts: Array, xs: Array,
                            series_ids: Array) -> Array:
    """Stacked multi-series NLL through the Kalman filter: the
    f32-ROBUST counterpart of `nll_loss_stacked` (same conditioning
    argument as `nll_loss_kalman`, per series).  The series-boundary
    mask replaces boundary transitions with (A = 0, Q = I) so the filter
    restarts from the stationary prior at each series
    (kalman.leg_to_ssm(gap_mask=...)); above T = 2^17 the blocked
    O(block)-memory filter keeps f32 training working at N_total = 1e7."""
    from cyclic_gps_tpu.baselines import kalman

    mask = leg._series_gap_mask(series_ids)
    ssm = kalman.leg_to_ssm(params, ts, gap_mask=mask)
    if xs.shape[0] > kalman.SMOOTHER_BLOCK:
        ll = kalman.log_likelihood_blocked(ssm, xs)
    else:
        ll = kalman.filter_parallel(ssm, xs)[2]
    return -ll / xs.size


def log_likelihood_per_series_kalman(
    params: leg.LEGParams, ts: Array, xs: Array, series_ids: Array,
    num_series: int,
) -> Array:
    """PER-SERIES likelihood vector [num_series] through the Kalman
    filter (f32-robust twin of leg.log_likelihood_per_series): per-step
    one-step-ahead predictive log-densities of the boundary-masked SSM,
    segment-summed by series.  O(block) memory at any N_total."""
    from cyclic_gps_tpu.baselines import kalman

    mask = leg._series_gap_mask(series_ids)
    ssm = kalman.leg_to_ssm(params, ts, gap_mask=mask)
    rows = kalman.log_likelihood_rows_blocked(ssm, xs)
    return jax.ops.segment_sum(rows, series_ids,
                               num_segments=num_series)


def nll_loss_residual(params: leg.LEGParams, ts: Array,
                      xs: Array) -> Array:
    """f32-SAFE precision-form NLL (leg.log_likelihood_residual):
    variational residual mahalanobis + per-row-paired log-determinants.
    Mathematically identical to `nll_loss`, robust where it breaks at
    single precision, and at partitioned-engine speed where
    `nll_loss_kalman`'s exact blocked filter costs 44.6 s/step at
    N = 1e7 irregular -- the large-N irregular-grid f32 training path."""
    return -leg.log_likelihood_residual(params, ts, xs) / xs.size


LOSSES = {
    "cr": nll_loss,
    "cr_residual": nll_loss_residual,
    "kalman": nll_loss_kalman,
    "kalman_regular": nll_loss_kalman_regular,
    "kalman_ss": nll_loss_kalman_steady,
}


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-2,
    reduce_on_plateau: bool = True,
) -> optax.GradientTransformation:
    """Adam (default) or LBFGS, optionally wrapped with a
    reduce-on-plateau LR scheduler monitoring the loss (the reference's
    ReduceLROnPlateau, models.py:384-392)."""
    name = name.lower()
    if name == "adam":
        opt = optax.adam(lr)
    elif name in ("lbfgs", "bfgs"):
        opt = optax.lbfgs(learning_rate=lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    # the reference attaches ReduceLROnPlateau to BOTH Adam and LBFGS
    # (models.py:384-392)
    if reduce_on_plateau:
        opt = optax.chain(
            opt,
            optax.contrib.reduce_on_plateau(
                factor=0.1, patience=10, cooldown=0, accumulation_size=5
            ),
        )
    return optax.with_extra_args_support(opt)


@partial(jax.jit, static_argnames=("optimizer", "loss"))
def train_step(
    params: leg.LEGParams,
    opt_state,
    ts: Array,
    xs: Array,
    optimizer: optax.GradientTransformation,
    loss: str = "cr",
):
    """One full-batch gradient step; returns (params, opt_state, loss)."""
    loss_fn = LOSSES[loss]
    value, grads = jax.value_and_grad(loss_fn)(params, ts, xs)
    updates, opt_state = optimizer.update(
        grads, opt_state, params, value=value, grad=grads,
        value_fn=lambda p: loss_fn(p, ts, xs),
    )
    params = optax.apply_updates(params, updates)
    return params, opt_state, value


@dataclass
class FitResult:
    params: leg.LEGParams
    losses: List[float] = field(default_factory=list)


def fit(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    num_steps: int = 1000,
    optimizer: str = "adam",
    lr: float = 1e-2,
    log_every: int = 100,
    callback: Optional[Callable[[int, float], None]] = None,
    loss: Optional[str] = None,
) -> FitResult:
    """Full-batch training loop (the reference's
    ``pl.Trainer(max_epochs=...).fit`` equivalent).

    ``loss``: "cr" (partitioned block-tridiagonal likelihood, fastest),
    "cr_residual" (f32-safe precision form -- variational residual
    mahalanobis + per-row-paired logdets, see nll_loss_residual), or
    "kalman" (parallel-filter likelihood, also f32-robust).  Default:
    "cr" at float64; at float32, "kalman_ss"/"kalman_regular" on uniform
    grids and "kalman" on small irregular grids, switching to
    "cr_residual" on LARGE irregular grids (where the exact blocked
    filter's 44.6 s/step at N = 1e7 is the only alternative).
    """
    if loss is None:
        if xs.dtype == jnp.float64:
            loss = "cr"
        else:
            from cyclic_gps_tpu.baselines import kalman as _k

            d = np.diff(np.asarray(ts))
            uniform = d.size > 0 and np.allclose(d, d[0], rtol=1e-6, atol=0)
            if uniform:
                loss = "kalman_regular"
            else:
                loss = ("cr_residual" if xs.shape[0] > _k.SMOOTHER_BLOCK
                        else "kalman")
            if uniform and xs.shape[0] > 8 * SS_T0:
                # steady-state fast path if the Riccati recursion is
                # safely converged at the INITIAL parameters (margin:
                # half the switch point); see nll_loss_kalman_steady
                from cyclic_gps_tpu.baselines import kalman

                ssm0 = kalman.leg_to_ssm(params, ts[: SS_T0 + 2],
                                         regular=True)
                gap = kalman.steady_state_gap(
                    ssm0.a[0], ssm0.q[0], ssm0.h, ssm0.r, t0=SS_T0 // 2
                )
                if gap < 1e-6:
                    loss = "kalman_ss"
    opt = make_optimizer(optimizer, lr)
    opt_state = opt.init(params)
    losses = []
    for step in range(num_steps):
        params, opt_state, loss_v = train_step(params, opt_state, ts, xs,
                                               opt, loss)
        loss_f = float(loss_v)
        losses.append(loss_f)
        if callback is not None:
            callback(step, loss_f)
        elif log_every and step % log_every == 0:
            print(f"step {step:5d}  NLL {loss_f:.6f}")
    return FitResult(params=params, losses=losses)


STACKED_LOSSES = {
    "cr": nll_loss_stacked,  # precision-form (fast path)
    "kalman": lambda p, t, x, ids, regular=False:
        nll_loss_kalman_stacked(p, t, x, ids),  # f32-robust filter form
}


@partial(jax.jit, static_argnames=("optimizer", "regular", "loss"))
def train_step_stacked(
    params: leg.LEGParams,
    opt_state,
    ts: Array,
    xs: Array,
    series_ids: Array,
    optimizer: optax.GradientTransformation,
    regular: bool = False,
    loss: str = "cr",
):
    """One gradient step on a stacked multi-series batch."""
    loss_impl = STACKED_LOSSES[loss]

    def loss_fn(p):
        return loss_impl(p, ts, xs, series_ids, regular=regular)

    value, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(
        grads, opt_state, params, value=value, grad=grads,
        value_fn=loss_fn,
    )
    params = optax.apply_updates(params, updates)
    return params, opt_state, value


def fit_stacked(
    params: leg.LEGParams,
    ts: Array,
    xs: Array,
    series_ids: Array,
    num_steps: int = 1000,
    optimizer: str = "adam",
    lr: float = 1e-2,
    log_every: int = 100,
    callback: Optional[Callable[[int, float], None]] = None,
    regular: bool = False,
    loss: str = "cr",
) -> FitResult:
    """Full-batch training on B stacked series (shared parameters, one
    block-diagonal solve per step -- see leg.log_likelihood_stacked).
    Equal-length batches: flatten [B, n] / [B, n, obs] and pass
    consecutive ids (or use leg.log_likelihood_batch's id construction).

    ``loss``: "cr" (precision form, the fast path) or "kalman" (the
    boundary-masked filter, f32-robust for fits drifting into very
    smooth regimes -- see `nll_loss_kalman_stacked`).
    """
    opt = make_optimizer(optimizer, lr)
    opt_state = opt.init(params)
    losses = []
    for step in range(num_steps):
        params, opt_state, loss_v = train_step_stacked(
            params, opt_state, ts, xs, series_ids, opt, regular, loss
        )
        loss_f = float(loss_v)
        losses.append(loss_f)
        if callback is not None:
            callback(step, loss_f)
        elif log_every and step % log_every == 0:
            print(f"step {step:5d}  NLL {loss_f:.6f}")
    return FitResult(params=params, losses=losses)


# ---------------------------------------------------------------------------
# Checkpointing: params as a plain npz pytree (the reference pickles
# torch params, train_leg.py:40-62; the "inject known params" pathway is
# how parity vs the original implementation is done,
# direct_posterior_comparison.py:35-40).
# ---------------------------------------------------------------------------


def save_params(path: str, params: leg.LEGParams) -> None:
    np.savez(
        path,
        n_params=np.asarray(params.n_params),
        r_params=np.asarray(params.r_params),
        lambda_params=np.asarray(params.lambda_params),
        b=np.asarray(params.b),
    )


def load_params(path: str, dtype=None) -> leg.LEGParams:
    data = np.load(path)
    arrs = [data[k] for k in ("n_params", "r_params", "lambda_params", "b")]
    if dtype is not None:
        arrs = [a.astype(dtype) for a in arrs]
    return leg.LEGParams(*map(jnp.asarray, arrs))


def params_from_arrays(n, r, lam, b, dtype=jnp.float64) -> leg.LEGParams:
    """Build params from raw packed arrays (e.g. exported from another
    implementation) -- the parity-injection pathway."""
    return leg.LEGParams(
        jnp.asarray(n, dtype=dtype),
        jnp.asarray(r, dtype=dtype),
        jnp.asarray(lam, dtype=dtype),
        jnp.asarray(b, dtype=dtype),
    )
