"""Stage profile of the WIDE solve at d = 9..12 (VERDICT r4 #4): where
do the 16.1 / 18.2 ms (d = 9 / 10, N = 1e6) go?

Rows per d (all on prebuilt wide-layout inputs, y-perturbed, K = 50
in-jit iterations):

  sweep_nc      forward_sweep_wide_pallas -- the elimination sweep with
                NO hat collection (the mahal kernel): the compute floor
                of any one-sweep design.
  sweep_col     forward_sweep_collect_wide_pallas -- + hat-factor
                streams to HBM (the solve's first pass).
  solve_full    pt.solve_and_logdet_wide -- collect + reduced ladder +
                descending back-substitution (the tracked family
                metric on wide inputs).

collect - nc = the hat-write cost; full - collect = ladder + backsub.
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


def main():
    from cyclic_gps_tpu.ops import pallas_wide as pw

    dmin = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    dmax = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    s = pt.default_chunk_len(N)
    for d in range(dmin, dmax + 1):
        rng = np.random.RandomState(0)
        q = rng.randn(N, d, d).astype(np.float32)
        diag = q @ q.transpose(0, 2, 1) / d + 4 * np.eye(
            d, dtype=np.float32)
        off = (rng.randn(N - 1, d, d) / d).astype(np.float32)
        y = rng.randn(N, d).astype(np.float32)
        r11, rst, o11, ost, y_cm, c = pt._chunk_layout_wide(
            jnp.asarray(diag), jnp.asarray(off), jnp.asarray(y), s)
        r11, rst, o11, ost, y_cm = jax.block_until_ready(
            (r11, rst, o11, ost, y_cm))

        def sweep_nc(r11, rst, o11, ost, y):
            return pw.forward_sweep_wide_pallas(r11, rst, o11, ost, y,
                                                0.0)

        def sweep_col(r11, rst, o11, ost, y):
            return pw.forward_sweep_collect_wide_pallas(r11, rst, o11,
                                                        ost, y, 0.0)

        def solve_full(r11, rst, o11, ost, y):
            return pt.solve_and_logdet_wide(r11, rst, o11, ost, y)

        out = {"metric": f"solve_stages_wide_n1e6_d{d}", "unit": "ms"}
        for name, fn in (("sweep_nc", sweep_nc), ("sweep_col", sweep_col),
                         ("solve_full", solve_full)):
            @jax.jit
            def loop(r11, rst, o11, ost, y, cs, _fn=fn):
                def body(i, acc):
                    o = _fn(r11, rst, o11, ost,
                            y * (cs + 1e-9 * i.astype(y.dtype)))
                    return acc + sum(jnp.ravel(a)[0]
                                     for a in jax.tree.leaves(o))
                return jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((), y.dtype))

            try:
                float(loop(r11, rst, o11, ost, y_cm, 1.0))
                times = []
                for i in range(3):
                    t0 = time.time()
                    float(loop(r11, rst, o11, ost, y_cm, 1.0 + i * 1e-6))
                    times.append((time.time() - t0) / K)
                out[name] = round(float(np.median(times) * 1e3), 3)
            except Exception as e:  # noqa: BLE001 - report and continue
                out[name + "_error"] = str(e)[:120]
        if "sweep_nc" in out and "sweep_col" in out:
            out["hat_write_cost"] = round(out["sweep_col"]
                                          - out["sweep_nc"], 3)
        if "solve_full" in out and "sweep_col" in out:
            out["ladder_backsub"] = round(out["solve_full"]
                                          - out["sweep_col"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
