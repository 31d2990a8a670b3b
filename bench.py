"""Headline benchmark: block-tridiagonal solve + logdet at N = 1e6, d = 5.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <x>}

vs_baseline is the speedup factor against the driver's north-star target
of 10 ms (BASELINE.md) -- the reference itself publishes no numbers.

Engine: the partitioned block-Thomas solver (ops/partitioned.py), which
computes J^{-1} y and log|J| in one streaming forward sweep + chain
back-substitution.

Timing notes for this rig (see .claude/skills/verify/SKILL.md): the PJRT
relay result-caches identical calls and block_until_ready returns early,
so we loop K iterations inside one jit with an input perturbation and
synchronise via a host read (amortising the ~30 ms relay round-trip).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.ops import partitioned as pt

N = 1_000_000
D = 5
K = 10  # iterations inside one jit
TARGET_MS = 10.0


def make_system(n, d, dtype=np.float32, seed=0):
    """Well-conditioned SPD block-tridiagonal system (diagonally dominant;
    condition number O(1) at any N)."""
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d, d).astype(dtype)
    diag = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d, dtype=dtype)
    off = (rng.randn(n - 1, d, d) / d).astype(dtype)
    v = rng.randn(n, d).astype(dtype)
    return jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v)


def main():
    diag, off, v = make_system(N, D)

    @jax.jit
    def loop(dg, of, y, c):
        def body(i, acc):
            x, ld = pt.solve_and_logdet(
                dg * (c + 1e-9 * i.astype(dg.dtype)), of, y
            )
            return acc + ld + x[0, 0] + x[-1, -1]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dg.dtype))

    float(loop(diag, off, v, 1.0))  # compile + warm
    times = []
    for i in range(3):
        t0 = time.time()
        float(loop(diag, off, v, 1.0 + i * 1e-6))
        times.append((time.time() - t0) / K)
    ms = float(np.min(times) * 1e3)
    print(
        json.dumps(
            {
                "metric": "cr_solve_logdet_n1e6_d5",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
