"""Grid over (noise level, length scale): generate latent paths from the
SSM bridge and assert the RTS smoother matches the block-tridiagonal
posterior exactly (reference kalman_generation_script.py /
kalman_test_script.py).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")  # f64 parity needs CPU
jax.config.update("jax_enable_x64", True)

from cyclic_gps_tpu.baselines import kalman
from cyclic_gps_tpu.models import leg
from cyclic_gps_tpu.ops import partitioned as ptn


def main():
    n, d = 300, 2
    ts = jnp.cumsum(jnp.ones(n, dtype=jnp.float64))
    key = jax.random.key(0)
    for noise in [0.5, 1.0, 2.0]:
        for scale in [0.1, 0.2, 0.5]:
            params = leg.init_params(
                jax.random.key(42), rank=3, obs_dim=d,
                prior_process_noise_level=noise, prior_length_scale=scale,
                dtype=jnp.float64,
            )
            ssm = kalman.leg_to_ssm(params, ts)
            key, k1, k2 = jax.random.split(key, 3)
            zs = kalman.sample_states(ssm, k1)
            xs = zs @ params.b.T + 0.05 * jax.random.normal(
                k2, (n, d), dtype=jnp.float64
            )

            sm, _ = kalman.smooth_sequential(ssm, xs)
            k_diag, k_off = leg.posterior_precision(params, ts)
            mean = ptn.solve(k_diag, k_off, leg.compute_v(params, xs))
            err = float(jnp.abs(sm - mean).max())
            status = "OK" if err < 1e-8 else "MISMATCH"
            print(f"noise={noise} scale={scale}: smoother-vs-posterior "
                  f"max err {err:.2e} {status}")
            assert err < 1e-8


if __name__ == "__main__":
    main()
