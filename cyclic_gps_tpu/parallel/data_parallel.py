"""Data-parallel LEG training over a device mesh.

The reference is strictly single-process/batch-size-1 (its dataset always
returns element 0, data_utils.py:73-75; the intended multi-sample trainer
is dead code, trainer.py).  Here multi-series training is first-class: a
batch of series [B, N] / [B, N, d] is sharded over the 'data' mesh axis
with jax.sharding; the per-series NLLs are computed by vmap of the jitted
likelihood (the whole CR stack vmaps) and mean-reduced, so XLA inserts the
psum for the gradient all-reduce over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cyclic_gps_tpu.models import leg

Array = jnp.ndarray


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = np.asarray(jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(devices, (axis,))


def batch_nll(params: leg.LEGParams, ts_batch: Array, xs_batch: Array) -> Array:
    """Mean per-observation NLL over a batch of series."""
    per_series = jax.vmap(
        lambda t, x: -leg.log_likelihood(params, t, x)
    )(ts_batch, xs_batch)
    nobs = xs_batch.size / xs_batch.shape[0]
    return jnp.mean(per_series) / nobs


def shard_batch(
    mesh: Mesh, ts_batch: Array, xs_batch: Array, axis: str = "data"
) -> Tuple[Array, Array]:
    """Place a batch with the leading axis sharded over the mesh."""
    s_ts = NamedSharding(mesh, P(axis, None))
    s_xs = NamedSharding(mesh, P(axis, None, None))
    return jax.device_put(ts_batch, s_ts), jax.device_put(xs_batch, s_xs)


def make_dp_train_step(mesh: Mesh, optimizer: optax.GradientTransformation,
                       axis: str = "data"):
    """Jitted data-parallel train step: params replicated, batch sharded."""
    replicated = NamedSharding(mesh, P())
    batch_ts = NamedSharding(mesh, P(axis, None))
    batch_xs = NamedSharding(mesh, P(axis, None, None))

    @partial(
        jax.jit,
        in_shardings=(replicated, replicated, batch_ts, batch_xs),
        out_shardings=(replicated, replicated, replicated),
    )
    def step(params, opt_state, ts_batch, xs_batch):
        loss, grads = jax.value_and_grad(batch_nll)(params, ts_batch, xs_batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def fit_data_parallel(
    params: leg.LEGParams,
    ts_batch: Array,
    xs_batch: Array,
    mesh: Optional[Mesh] = None,
    num_steps: int = 100,
    lr: float = 1e-2,
    log_every: int = 0,
):
    """Train on a batch of series, one shard per device."""
    mesh = mesh or make_mesh()
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    ts_batch, xs_batch = shard_batch(mesh, ts_batch, xs_batch)
    step = make_dp_train_step(mesh, opt)
    losses = []
    for i in range(num_steps):
        params, opt_state, loss = step(params, opt_state, ts_batch, xs_batch)
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"dp step {i}  loss {losses[-1]:.6f}")
    return params, losses
