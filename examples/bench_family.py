"""Benchmark family: block-tridiagonal solve + logdet at N = 1e6 for
d = 3..10 (the BASELINE.md tracked metric family), plus the fused
mahal+logdet, on the engine's native chunk-major layout.  One JSON line
per measurement.  On TPU both passes run as Pallas kernels
(ops/pallas_sweep.py); pass --xla to time the XLA scan path instead.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from cyclic_gps_tpu.ops import partitioned as pt

N = 1_000_000
K = 50


def make_system_cm(n, d, dtype=np.float32, seed=0):
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


def timeit(fn, R, O, y):
    @jax.jit
    def loop(R, O, y, c):
        def body(i, acc):
            # perturb the (small) RHS so XLA cannot hoist the solve;
            # perturbing R would add a ~100 MB copy per iteration
            # (matches bench.py's methodology)
            out = fn(R, O, y * (c + 1e-9 * i.astype(R.dtype)))
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.ravel(l)[0] for l in leaves)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), R.dtype))

    float(loop(R, O, y, 1.0))
    times = []
    for i in range(3):
        t0 = time.time()
        float(loop(R, O, y, 1.0 + i * 1e-6))
        times.append((time.time() - t0) / K)
    return float(np.median(times) * 1e3)


def make_system_nat(n, d, dtype=np.float32, seed=0):
    """The same system in the NATURAL [N, d, d] layout -- what an
    external user of the solver library hands to pt.solve_and_logdet
    (the timing includes the chunk-major relayout passes)."""
    rng = np.random.RandomState(seed)
    q = rng.randn(n, d, d).astype(dtype)
    diag = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(d, dtype=dtype)
    off = (rng.randn(n - 1, d, d) / d).astype(dtype)
    y = rng.randn(n, d).astype(dtype)
    return jnp.asarray(diag), jnp.asarray(off), jnp.asarray(y)


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    backend = "xla" if "--xla" in sys.argv else (
        "pallas" if on_tpu else "xla")
    for d in range(3, 11):
        R, O, y = make_system_cm(N, d)
        for name, fn in (
            ("solve_logdet", lambda R, O, y: pt.solve_cm(
                R, O, y, backend=backend)),
            ("mahal_logdet", lambda R, O, y: pt.mahal_and_logdet_cm(
                R, O, y, backend=backend)),
        ):
            try:
                ms = timeit(fn, R, O, y)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({
                    "metric": f"{name}_n1e6_d{d}", "backend": backend,
                    "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({
                "metric": f"{name}_n1e6_d{d}", "value": round(ms, 3),
                "unit": "ms", "backend": backend}), flush=True)
        if on_tpu and 8 < d < 16:
            # wide 8-aligned layout (ops/wideblock): the native on-device
            # format for 8 < d < 16, prebuilt like the chunk-major inputs
            diag, off, yv = make_system_nat(N, d)
            s = pt.default_chunk_len(N)
            r11, rst, o11, ost, y_cmw, _ = pt._chunk_layout_wide(
                diag, off, yv, s)
            r11, rst, o11, ost, y_cmw = jax.block_until_ready(
                (r11, rst, o11, ost, y_cmw))
            @jax.jit
            def wide_loop(r11, rst, o11, ost, y, c):
                # arrays as ARGUMENTS, not closures (closed-over device
                # arrays serialize into the remote-compile request)
                def body(i, acc):
                    mh, ld = pt.mahal_and_logdet_wide(
                        r11, rst, o11, ost,
                        y * (c + 1e-9 * i.astype(y.dtype)))
                    return acc + mh + ld
                return jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((), y.dtype))

            @jax.jit
            def wide_solve_loop(r11, rst, o11, ost, y, c):
                def body(i, acc):
                    x, ld = pt.solve_and_logdet_wide(
                        r11, rst, o11, ost,
                        y * (c + 1e-9 * i.astype(y.dtype)))
                    return acc + jnp.ravel(x)[0] + ld
                return jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((), y.dtype))

            for wname, wloop in (("mahal_logdet_wide", wide_loop),
                                 ("solve_logdet_wide", wide_solve_loop)):
                def run_wide(c, _l=wloop):
                    return float(_l(r11, rst, o11, ost, y_cmw, c))

                try:
                    run_wide(1.0)
                    times = []
                    for i in range(5):
                        t0 = time.time()
                        run_wide(1.0 + i * 1e-6)
                        times.append((time.time() - t0) / K)
                    ms = float(np.median(times) * 1e3)
                except Exception as e:  # noqa: BLE001 - report and continue
                    print(json.dumps({
                        "metric": f"{wname}_n1e6_d{d}",
                        "error": str(e)[:120]}), flush=True)
                else:
                    print(json.dumps({
                        "metric": f"{wname}_n1e6_d{d}",
                        "value": round(ms, 3), "unit": "ms",
                        "backend": "pallas-wide"}), flush=True)
        if "--natural" in sys.argv or d == 5:
            # the library-API entry: natural [N, d, d] inputs, relayout
            # included (VERDICT r2 #6)
            diag, off, yv = make_system_nat(N, d)
            try:
                ms = timeit(
                    lambda Rn, On, yn: pt.solve_and_logdet(
                        Rn, On, yn, backend=backend),
                    diag, off, yv)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({
                    "metric": f"solve_logdet_natural_n1e6_d{d}",
                    "backend": backend, "error": str(e)[:120]}), flush=True)
            else:
                print(json.dumps({
                    "metric": f"solve_logdet_natural_n1e6_d{d}",
                    "value": round(ms, 3), "unit": "ms",
                    "backend": backend}), flush=True)


if __name__ == "__main__":
    main()
