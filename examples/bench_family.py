"""Benchmark family: block-tridiagonal solve + logdet at N = 1e6 for
d = 3..10 (the BASELINE.md tracked metric family), plus the fused
mahal+logdet and selected inversion.  One JSON line per measurement.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.ops import partitioned as pt

N = 1_000_000
K = 8


def make_system(n, d, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d, d).astype(dtype)
    diag = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d, dtype=dtype)
    off = (rng.randn(n - 1, d, d) / d).astype(dtype)
    v = rng.randn(n, d).astype(dtype)
    return jnp.asarray(diag), jnp.asarray(off), jnp.asarray(v)


def timeit(fn, diag, off, v):
    @jax.jit
    def loop(dg, of, y, c):
        def body(i, acc):
            out = fn(dg * (c + 1e-9 * i.astype(dg.dtype)), of, y)
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.ravel(l)[0] for l in leaves)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dg.dtype))

    float(loop(diag, off, v, 1.0))
    times = []
    for i in range(3):
        t0 = time.time()
        float(loop(diag, off, v, 1.0 + i * 1e-6))
        times.append((time.time() - t0) / K)
    return float(np.min(times) * 1e3)


def main():
    for d in range(3, 11):
        diag, off, v = make_system(N, d)
        ms = timeit(pt.solve_and_logdet, diag, off, v)
        print(json.dumps({"metric": f"solve_logdet_n1e6_d{d}", "value": ms,
                          "unit": "ms"}), flush=True)
        ms2 = timeit(pt.mahal_and_logdet, diag, off, v)
        print(json.dumps({"metric": f"mahal_logdet_n1e6_d{d}", "value": ms2,
                          "unit": "ms"}), flush=True)


if __name__ == "__main__":
    main()
