"""Multi-device tests on the 8-device virtual CPU mesh.

- Sequence-sharded CR (halo-exchange cyclic reduction) == single-device CR.
- Sequence-sharded LEG likelihood == single-device likelihood.
- Data-parallel training step runs with sharded batches and replicated
  params, and decreases the loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cyclic_gps_tpu.data.synthetic import generate_data
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import cyclic_reduction as cr
from cyclic_gps_tpu.parallel import data_parallel, seq_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _well_conditioned(n, d, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d, d)
    diag = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d)
    off = rng.randn(n - 1, d, d) / d
    v = rng.randn(n, d)
    return jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v)


@pytest.mark.parametrize("engine", ["partitioned", "cr"])
@pytest.mark.parametrize("n", [64, 256, 4096])
def test_seq_sharded_mahal_and_logdet(n, engine):
    # n = 4096 -> m = 512 per shard: exercises a real shard-local
    # partitioned level with ppermute halo exchange (not just the
    # terminal all-gather); 64/256 cover the terminal-only path.
    d = 3
    diag, off, v = _well_conditioned(n, d)
    mesh = seq_sharded.make_seq_mesh(8)
    mh_s, ld_s = seq_sharded.mahal_and_logdet(diag, off, v, mesh,
                                              engine=engine)
    mh, ld = cr.mahal_and_logdet(diag, off, v)
    np.testing.assert_allclose(float(mh_s), float(mh), rtol=1e-10)
    np.testing.assert_allclose(float(ld_s), float(ld), rtol=1e-10)


@pytest.mark.parametrize("n", [128, 4096])
def test_seq_sharded_log_likelihood(n):
    # n = 4096 exercises the shard-local partitioned sweep + halo level
    # in the likelihood path; 128 covers the terminal-only path.
    d, rank = 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=31)
    params = leg.init_params(jax.random.key(0), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(8)
    ll_sharded = seq_sharded.log_likelihood(params, ts, xs, mesh)
    ll = leg.log_likelihood(params, ts, xs)
    np.testing.assert_allclose(float(ll_sharded), float(ll), rtol=1e-10)


def test_seq_sharded_rejects_bad_sizes():
    diag, off, v = _well_conditioned(96, 2)  # not a power of two
    mesh = seq_sharded.make_seq_mesh(8)
    with pytest.raises(ValueError):
        seq_sharded.mahal_and_logdet(diag, off, v, mesh)


def test_data_parallel_training():
    batch, n, d, rank = 8, 40, 2, 3
    ts_list, xs_list = [], []
    for i in range(batch):
        t, x = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                             seed=100 + i)
        ts_list.append(t)
        xs_list.append(x)
    ts_batch = jnp.stack(ts_list)
    xs_batch = jnp.stack(xs_list)

    params = leg.init_params(jax.random.key(1), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    mesh = data_parallel.make_mesh(8)
    params_out, losses = data_parallel.fit_data_parallel(
        params, ts_batch, xs_batch, mesh=mesh, num_steps=20, lr=1e-2
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # sharded loss == single-device loss for the same params
    loss_single = float(data_parallel.batch_nll(params, ts_batch, xs_batch))
    np.testing.assert_allclose(losses[0], loss_single, rtol=1e-9)


def test_gspmd_partitioned_engine():
    """The partitioned engine runs correctly under plain jit with
    sequence-sharded inputs -- XLA GSPMD inserts the collectives."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from cyclic_gps_tpu.ops import partitioned as ptn

    n, d = 2048, 3
    rng = np.random.RandomState(0)
    q = rng.randn(n, d, d)
    diag = jnp.asarray(q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d))
    off = jnp.asarray(rng.randn(n - 1, d, d) / d)
    v = jnp.asarray(rng.randn(n, d))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    diag_s = jax.device_put(diag, NamedSharding(mesh, P("seq", None, None)))
    v_s = jax.device_put(v, NamedSharding(mesh, P("seq", None)))

    mh_s, ld_s = jax.jit(ptn.mahal_and_logdet)(diag_s, off, v_s)
    mh, ld = ptn.mahal_and_logdet(diag, off, v)
    np.testing.assert_allclose(float(mh_s), float(mh), rtol=1e-12)
    np.testing.assert_allclose(float(ld_s), float(ld), rtol=1e-12)

    x_s = jax.jit(ptn.solve)(diag_s, off, v_s)
    np.testing.assert_allclose(
        np.asarray(x_s), np.asarray(ptn.solve(diag, off, v)), atol=1e-12
    )


def test_gspmd_log_likelihood():
    """Full LEG likelihood under jit with a sequence-sharded series."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n, d, rank = 512, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=77)
    params = leg.init_params(jax.random.key(0), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    ts_s = jax.device_put(ts, NamedSharding(mesh, P("seq")))
    xs_s = jax.device_put(xs, NamedSharding(mesh, P("seq", None)))
    ll_s = float(jax.jit(leg.log_likelihood)(params, ts_s, xs_s))
    ll = float(leg.log_likelihood(params, ts, xs))
    np.testing.assert_allclose(ll_s, ll, rtol=1e-12)
