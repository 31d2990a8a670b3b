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


@pytest.mark.parametrize("n", [64, 4096])
def test_seq_sharded_solve_and_inverse(n):
    """Sharded solve + selected inversion == single-device engines,
    including a real back-substitution level with shift_up halos
    (n = 4096 -> 512 blocks/shard -> one full partitioned level)."""
    from cyclic_gps_tpu.ops import partitioned as ptn

    d = 3
    diag, off, v = _well_conditioned(n, d, seed=3)
    mesh = seq_sharded.make_seq_mesh(8)

    x_s, ld_s = seq_sharded.solve(diag, off, v, mesh)
    x, ld = ptn.solve_and_logdet(diag, off, v)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(ld_s), float(ld), rtol=1e-10)

    cd_s, co_s = seq_sharded.inverse_blocks(diag, off, mesh)
    cd, co = ptn.inverse_blocks(diag, off)
    np.testing.assert_allclose(np.asarray(cd_s), np.asarray(cd),
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(co_s), np.asarray(co),
                               rtol=1e-8, atol=1e-11)


def test_seq_sharded_mahal_analytic_gradient():
    """The sharded fused (mahal, logdet) gradient -- analytic custom VJP:
    one sharded solve + one sharded selected inversion -- matches the
    single-device analytic VJP."""
    from functools import partial as _partial
    from jax.sharding import PartitionSpec as P
    from cyclic_gps_tpu.ops import partitioned as ptn
    from cyclic_gps_tpu.ops import smallblock as sb

    n, d = 256, 3
    diag, off, v = _well_conditioned(n, d, seed=11)
    mesh = seq_sharded.make_seq_mesh(8)

    R = sb.to_em(diag)
    O = jnp.concatenate(
        [sb.to_em(off), jnp.zeros((d, d, 1), dtype=diag.dtype)], axis=-1
    )
    yt = sb.vec_to_em(v)

    fn = jax.jit(
        jax.shard_map(
            _partial(seq_sharded._mahal_local_diff, axis="seq", jitter=0.0),
            mesh=mesh,
            in_specs=(P(None, None, "seq"), P(None, None, "seq"),
                      P(None, "seq")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )

    def loss_sharded(R, O, yt):
        mh, ld = fn(R, O, yt)
        return 0.7 * mh + 0.3 * ld

    def loss_single(R, O, yt):
        # single-device reference through the chunk-major analytic VJP
        dg = sb.from_em(R)
        of = sb.from_em(O)[: n - 1]
        yv = sb.vec_from_em(yt)
        mh, ld = ptn.mahal_and_logdet(dg, of, yv, backend="xla")
        return 0.7 * mh + 0.3 * ld

    g_s = jax.grad(loss_sharded, argnums=(0, 1, 2))(R, O, yt)
    g_r = jax.grad(loss_single, argnums=(0, 1, 2))(R, O, yt)
    for a, b in zip(g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_seq_sharded_posterior_matches_single_device():
    """Multi-chip posterior mean + in-sample posterior == the
    single-device precision engines; likelihood PARAMETER gradient
    through the sharded analytic VJP == single-device gradient."""
    n, d, rank = 512, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=53)
    params = leg.init_params(jax.random.key(2), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(8)

    mean_s = seq_sharded.posterior_mean(params, ts, xs, mesh)
    mean = leg.posterior_mean(params, ts, xs, method="precision")
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean),
                               rtol=1e-8, atol=1e-10)

    m_s, cd_s, co_s = seq_sharded.insample_posterior(params, ts, xs, mesh)
    m, cd, co = leg.insample_posterior(params, ts, xs, method="precision")
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cd_s), np.asarray(cd),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(co_s), np.asarray(co),
                               rtol=1e-7, atol=1e-10)

    g_s = jax.grad(
        lambda p: seq_sharded.log_likelihood(p, ts, xs, mesh)
    )(params)
    g_r = jax.grad(lambda p: leg.log_likelihood(p, ts, xs))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_seq_sharded_stacked_matches_single_device():
    """Multi-chip STACKED multi-series entries == the single-device
    stacked entries (themselves == per-series sums, tests/test_batched):
    ragged series straddling shard edges, timestamps restarting at each
    boundary, values + parameter gradient + posteriors."""
    lengths = (100, 37, 75, 44)  # sums to 256: power of two, 32/shard
    obs = 2
    parts = [
        generate_data(n, obs, dtype=jnp.float64, spacing="irregular",
                      seed=60 + i)
        for i, n in enumerate(lengths)
    ]
    ts = jnp.concatenate([p[0] for p in parts])
    xs = jnp.concatenate([p[1] for p in parts])
    ids = jnp.concatenate([
        jnp.full((n,), i, dtype=jnp.int32) for i, n in enumerate(lengths)
    ])
    params = leg.init_params(jax.random.key(7), rank=3, obs_dim=obs,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(8)

    ll_s = seq_sharded.log_likelihood_stacked(params, ts, xs, ids, mesh)
    ll_r = leg.log_likelihood_stacked(params, ts, xs, ids)
    np.testing.assert_allclose(float(ll_s), float(ll_r), rtol=1e-10)

    g_s = jax.grad(
        lambda p: seq_sharded.log_likelihood_stacked(p, ts, xs, ids, mesh)
    )(params)
    g_r = jax.grad(
        lambda p: leg.log_likelihood_stacked(p, ts, xs, ids)
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)

    mean_s = seq_sharded.posterior_mean(params, ts, xs, mesh,
                                        series_ids=ids)
    mean_r = leg.posterior_mean_stacked(params, ts, xs, ids)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r),
                               rtol=1e-8, atol=1e-10)

    m_s, cd_s, co_s = seq_sharded.insample_posterior(params, ts, xs, mesh,
                                                     series_ids=ids)
    m_r, cd_r, co_r = leg.insample_posterior_stacked(params, ts, xs, ids)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cd_s), np.asarray(cd_r),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(co_s), np.asarray(co_r),
                               rtol=1e-7, atol=1e-10)


def test_seq_sharded_per_series_matches_single_device():
    """Multi-chip per-series likelihood vector == the single-device
    leg.log_likelihood_per_series (itself == individual likelihoods,
    tests/test_batched): values and the WEIGHTED parameter gradient
    (exercises the sharded per-row analytic adjoint _rows_parts_diff)."""
    lengths = (100, 37, 75, 44)
    obs = 2
    parts = [
        generate_data(n, obs, dtype=jnp.float64, spacing="irregular",
                      seed=80 + i)
        for i, n in enumerate(lengths)
    ]
    ts = jnp.concatenate([p[0] for p in parts])
    xs = jnp.concatenate([p[1] for p in parts])
    ids = jnp.concatenate([
        jnp.full((n,), i, dtype=jnp.int32) for i, n in enumerate(lengths)
    ])
    params = leg.init_params(jax.random.key(8), rank=3, obs_dim=obs,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(8)

    ll_s = seq_sharded.log_likelihood_per_series(
        params, ts, xs, ids, len(lengths), mesh
    )
    ll_r = leg.log_likelihood_per_series(params, ts, xs, ids,
                                         num_series=len(lengths))
    np.testing.assert_allclose(np.asarray(ll_s), np.asarray(ll_r),
                               rtol=1e-10)

    c = jnp.asarray([0.4, -1.2, 2.0, 0.9])
    g_s = jax.grad(
        lambda p: jnp.sum(c * seq_sharded.log_likelihood_per_series(
            p, ts, xs, ids, len(lengths), mesh))
    )(params)
    g_r = jax.grad(
        lambda p: jnp.sum(c * leg.log_likelihood_per_series(
            p, ts, xs, ids, num_series=len(lengths)))
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_seq_sharded_pallas_solve_and_inverse(monkeypatch):
    """backend="pallas" sharded solve + selected inversion: each shard's
    large level runs the collect/raw-factor sweep, the descending
    back-substitution, and the Takahashi recursion as the Pallas kernels
    inside shard_map (interpret mode); exact match to the single-device
    engines.  (4-device mesh + _LEVEL_CHUNK=8: see
    test_seq_sharded_pallas_backend_mahal.)"""
    from jax.experimental.pallas import tpu as pltpu
    from cyclic_gps_tpu.ops import partitioned as ptn

    monkeypatch.setattr(seq_sharded, "_LEVEL_CHUNK", 8)
    n, d = 2048, 3
    diag, off, v = _well_conditioned(n, d, seed=6)
    mesh = seq_sharded.make_seq_mesh(4)
    with pltpu.force_tpu_interpret_mode():
        x_p, ld_p = seq_sharded.solve(diag, off, v, mesh,
                                      backend="pallas")
        cd_p, co_p = seq_sharded.inverse_blocks(diag, off, mesh,
                                                backend="pallas")
    x, ld = ptn.solve_and_logdet(diag, off, v)
    cd, co = ptn.inverse_blocks(diag, off)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(ld_p), float(ld), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cd_p), np.asarray(cd),
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(co_p), np.asarray(co),
                               rtol=1e-8, atol=1e-11)


def test_seq_sharded_per_series_pallas_backend(monkeypatch):
    """backend="pallas" per-series vector: the fused shard-local
    solve+ld-rows walk (_solve_ldr_local) runs its large level as the
    collect kernel (hat factors + lq lane) + the descending
    back-substitution kernel inside shard_map; values and the weighted
    gradient (whose sharded solve also runs the kernels) match the
    single-device entry.  (4-device mesh + _LEVEL_CHUNK=8: see
    test_seq_sharded_pallas_backend_mahal.)"""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(seq_sharded, "_LEVEL_CHUNK", 8)
    lengths = (900, 600, 548)  # 2048 total -> m=512/shard, c_loc=64
    obs = 2
    parts = [
        generate_data(n, obs, dtype=jnp.float64, spacing="irregular",
                      seed=90 + i)
        for i, n in enumerate(lengths)
    ]
    ts = jnp.concatenate([p[0] for p in parts])
    xs = jnp.concatenate([p[1] for p in parts])
    ids = jnp.concatenate([
        jnp.full((n,), i, dtype=jnp.int32) for i, n in enumerate(lengths)
    ])
    params = leg.init_params(jax.random.key(9), rank=2, obs_dim=obs,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(4)

    with pltpu.force_tpu_interpret_mode():
        ll_p = seq_sharded.log_likelihood_per_series(
            params, ts, xs, ids, len(lengths), mesh, backend="pallas"
        )
    ll_r = leg.log_likelihood_per_series(params, ts, xs, ids,
                                         num_series=len(lengths))
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_r),
                               rtol=1e-10)

    c = jnp.asarray([0.4, -1.2, 2.0])
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(
            lambda p: jnp.sum(c * seq_sharded.log_likelihood_per_series(
                p, ts, xs, ids, len(lengths), mesh, backend="pallas"))
        )(params)
    g_r = jax.grad(
        lambda p: jnp.sum(c * leg.log_likelihood_per_series(
            p, ts, xs, ids, num_series=len(lengths)))
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


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


def test_seq_sharded_pallas_backend_mahal(monkeypatch):
    """backend="pallas": each shard's large first elimination level runs
    the fused Pallas forward-sweep kernel (interpret mode in CI) inside
    shard_map; exact match to the single-device engine.  _LEVEL_CHUNK is
    shrunk to 8 so the interpreted kernel grid stays small while still
    crossing the c_loc >= 64 dispatch gate (n = 2048 -> m = 512 per
    shard -> s = 8, 64 chunks) and leaving an XLA tail level.

    4-device mesh, NOT the usual 8: interpret-mode pallas_call inside
    shard_map services its per-partition host callbacks from the CPU
    client's thread pool, and at 8 concurrent partitions on this 1-core
    box the run starves/deadlocks (>10 min; 4 devices complete in ~9 s).
    4 shards still exercise the halo ppermutes, a multi-level reduction
    and the replicating psum."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(seq_sharded, "_LEVEL_CHUNK", 8)
    n, d = 2048, 3
    diag, off, v = _well_conditioned(n, d, seed=5)
    mesh = seq_sharded.make_seq_mesh(4)
    with pltpu.force_tpu_interpret_mode():
        mh_p, ld_p = seq_sharded.mahal_and_logdet(diag, off, v, mesh,
                                                  backend="pallas")
    mh, ld = cr.mahal_and_logdet(diag, off, v)
    np.testing.assert_allclose(float(mh_p), float(mh), rtol=1e-9)
    np.testing.assert_allclose(float(ld_p), float(ld), rtol=1e-9)


def test_seq_sharded_pallas_backend_loglik_grad(monkeypatch):
    """backend="pallas" likelihood: forward kernel level + the analytic
    sharded backward (XLA solve + selected inversion).  Value and
    parameter gradient match the single-device likelihood.  (4-device
    mesh: see test_seq_sharded_pallas_backend_mahal.)"""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(seq_sharded, "_LEVEL_CHUNK", 8)
    n, d, rank = 2048, 2, 3
    ts, xs = generate_data(n, d, dtype=jnp.float64, spacing="irregular",
                           seed=13)
    params = leg.init_params(jax.random.key(2), rank=rank, obs_dim=d,
                             dtype=jnp.float64)
    mesh = seq_sharded.make_seq_mesh(4)

    def loss_p(p):
        return -seq_sharded.log_likelihood(p, ts, xs, mesh,
                                           backend="pallas")

    def loss_ref(p):
        return -leg.log_likelihood(p, ts, xs)

    with pltpu.force_tpu_interpret_mode():
        val_p, grad_p = jax.value_and_grad(loss_p)(params)
    val_r, grad_r = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(val_p), float(val_r), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grad_p), jax.tree.leaves(grad_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)
