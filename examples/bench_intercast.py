"""Dense prediction grids through `intercast` (VERDICT r2 #7): time the
latent predictive moments at P = 1e5 and 1e6 sorted targets over an
N = 1e5 in-sample posterior, rank 5 f32.  The element-major rewrite
(models/leg.py `intercast`) keeps every temporary [*, *, P]; the old
vmapped stitch built [P, 3r, 3r] batch-major temporaries that tile-pad
~9-40x and OOM at P ~ 1e6.  One JSON line per grid size.

Reference being outclassed: the per-target Python loop at
/root/reference/cyclic_gps/models.py:454-514.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), ".."))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.models import leg

RANK = 5
OBS = 2
N = 100_000
K = 20


def main():
    rng = np.random.RandomState(0)
    params = leg.init_params(jax.random.PRNGKey(0), rank=RANK,
                             obs_dim=OBS, dtype=jnp.float32)
    ts = jnp.asarray(np.sort(rng.rand(N)).astype(np.float32) * N * 0.1)
    # posterior-moment stand-ins with the right shapes/scales (the
    # intercast stage only consumes the moments, so synthetic PD blocks
    # time identically to a real posterior)
    m = jnp.asarray(rng.randn(N, RANK).astype(np.float32))
    q = rng.randn(N, RANK, RANK).astype(np.float32) * 0.1
    cd = jnp.asarray(q @ q.transpose(0, 2, 1) + 0.5 * np.eye(RANK,
                                                             dtype=np.float32))
    co = jnp.asarray((rng.randn(N - 1, RANK, RANK) * 0.05).astype(np.float32))

    for p in (100_000, 1_000_000):
        lo = float(ts[0]) - 5.0
        hi = float(ts[-1]) + 5.0
        targets = jnp.asarray(
            np.linspace(lo, hi, p, dtype=np.float32))

        @jax.jit
        def loop(m, cd, co, ts, targets, c):
            def body(i, acc):
                mean, cov = leg.intercast(
                    params, m * (c + 1e-9 * i.astype(m.dtype)), cd, co,
                    ts, targets)
                return acc + jnp.ravel(mean)[0] + jnp.ravel(cov)[0]
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), m.dtype))

        try:
            float(loop(m, cd, co, ts, targets, 1.0))
            times = []
            for i in range(3):
                t0 = time.time()
                float(loop(m, cd, co, ts, targets, 1.0 + i * 1e-6))
                times.append((time.time() - t0) / K)
            ms = float(np.median(times) * 1e3)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({
                "metric": f"intercast_n1e5_p{p}", "error": str(e)[:120]}),
                flush=True)
        else:
            print(json.dumps({
                "metric": f"intercast_n1e5_p{p}", "value": round(ms, 3),
                "unit": "ms", "rank": RANK}), flush=True)

        # ---- stage split (VERDICT r4 #5): expm / gather / stitch ----
        from cyclic_gps_tpu.ops import smallblock as sb
        from cyclic_gps_tpu.ops.expm_em import expm_em

        g = leg.g_matrix(params)

        def stage_expm(tg, c):
            geo = leg._intercast_geometry(ts, tg, 1e-10)
            gaps = jnp.concatenate(geo[7:])  # [4P]
            return expm_em(-0.5 * gaps[None, None, :] * (c * g[:, :, None]))

        def stage_gather(tg, c):
            # mirrors the in-path PACKED row gather (leg.intercast):
            # one [N, 2r + 3r^2] take by prev_i + the unpack transpose
            geo = leg._intercast_geometry(ts, tg, 1e-10)
            prev_i = geo[4]
            n_obs = m.shape[0]
            r2 = RANK * RANK
            z_pack = jnp.concatenate([
                m * c,
                jnp.concatenate([m[1:], m[-1:]], axis=0),
                cd.reshape(n_obs, r2),
                jnp.concatenate([cd[1:], cd[-1:]],
                                axis=0).reshape(n_obs, r2),
                jnp.concatenate(
                    [co, jnp.zeros((1, RANK, RANK), co.dtype)], axis=0
                ).reshape(n_obs, r2),
            ], axis=1)
            return jnp.transpose(
                jnp.take(z_pack, prev_i, axis=0, mode="clip"))

        def run_stage(fn):
            @jax.jit
            def lp(tg, c):
                def body(i, acc):
                    out = fn(tg, c + 1e-9 * i.astype(tg.dtype))
                    return acc + sum(jnp.ravel(l)[0]
                                     for l in jax.tree.leaves(out))
                return jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((), tg.dtype))
            float(lp(targets, 1.0))
            times = []
            for i in range(3):
                t0 = time.time()
                float(lp(targets, 1.0 + i * 1e-6))
                times.append((time.time() - t0) / K)
            return float(np.median(times) * 1e3)

        def stage_geometry(tg, c):
            return leg._intercast_geometry(ts * c, tg, 1e-10)

        try:
            geo_ms = run_stage(stage_geometry)
            expm_ms = run_stage(stage_expm)
            gather_ms = run_stage(stage_gather)
            # geometry is recomputed inside BOTH stages above; subtract
            # it once so the three exclusive parts + geo sum to total
            print(json.dumps({
                "metric": f"intercast_stages_n1e5_p{p}",
                "geometry_ms": round(geo_ms, 2),
                "expm_4p_ms": round(expm_ms - geo_ms, 2),
                "gather_ms": round(gather_ms - geo_ms, 2),
                "stitch_rest_ms": round(ms - expm_ms - gather_ms + geo_ms,
                                        2),
                "total_ms": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "metric": f"intercast_stages_n1e5_p{p}",
                "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
