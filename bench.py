"""Headline benchmark: block-tridiagonal solve + logdet at N = 1e6, d = 5.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <x>}

vs_baseline is the speedup factor against the driver's north-star target
of 10 ms (BASELINE.md) -- the reference itself publishes no numbers.

Engine: the partitioned block-Thomas solver (ops/partitioned.py) on its
native chunk-major layout ([s, d, d, C]; the model layer emits this
directly -- leg._k_system_chunked), with both passes as fused Pallas TPU
kernels (ops/pallas_sweep.py): the forward sweep streams hat
back-substitution factors to HBM as it eliminates, the backward kernel
walks them in descending step order.  Falls back to the XLA scan path
off-TPU.

Timing notes for this rig (see .claude/skills/verify/SKILL.md): the PJRT
relay result-caches identical calls and block_until_ready returns early,
so we loop K iterations inside one jit with an input perturbation and
synchronise via a host read (amortising the ~30 ms relay round-trip).
The reported value is the MEDIAN of 5 runs.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.ops import partitioned as pt

N = 1_000_000
D = 5
K = 50  # iterations inside one jit (fixed relay cost ~30 ms / K)
TARGET_MS = 10.0


def make_system_cm(n, d, dtype=np.float32, seed=0):
    """Well-conditioned SPD block-tridiagonal system (diagonally dominant;
    condition number O(1) at any N), constructed directly in the
    engine's native chunk-major layout [s, d, d, C] / [s, d, C]."""
    s = pt.default_chunk_len(n)
    rng = np.random.RandomState(seed)
    c = -(-n // s)
    m = c * s  # identity/zero padding to the chunk multiple is exact
    q = rng.randn(n, d, d).astype(dtype)
    diag = np.broadcast_to(np.eye(d, dtype=dtype), (m, d, d)).copy()
    diag[:n] = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d, dtype=dtype)
    off = np.zeros((m, d, d), dtype=dtype)
    off[: n - 1] = (rng.randn(n - 1, d, d) / d).astype(dtype)
    v = np.zeros((m, d), dtype=dtype)
    v[:n] = rng.randn(n, d).astype(dtype)
    R_cm = jnp.asarray(diag.reshape(c, s, d, d).transpose(1, 2, 3, 0))
    O_cm = jnp.asarray(off.reshape(c, s, d, d).transpose(1, 2, 3, 0))
    y_cm = jnp.asarray(v.reshape(c, s, d).transpose(1, 2, 0))
    return R_cm, O_cm, y_cm


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    backend = "pallas" if on_tpu else "xla"
    R_cm, O_cm, y_cm = make_system_cm(N, D)

    @jax.jit
    def loop(R, O, y, c):
        def body(i, acc):
            # perturb the (small) RHS so XLA cannot hoist the solve;
            # perturbing R would add a 100 MB copy per iteration
            x, ld = pt.solve_cm(
                R, O, y * (c + 1e-9 * i.astype(R.dtype)), backend=backend
            )
            return acc + ld + x[0, 0] + x[-1, -1]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), R.dtype))

    float(loop(R_cm, O_cm, y_cm, 1.0))  # compile + warm
    times = []
    for i in range(5):
        t0 = time.time()
        float(loop(R_cm, O_cm, y_cm, 1.0 + i * 1e-6))
        times.append((time.time() - t0) / K)
    ms = float(np.median(times) * 1e3)
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
