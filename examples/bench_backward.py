"""HONEST per-d backward-path bench (VERDICT r4 #1).

Times the chunk-major engine entries directly -- NO natural-layout
relayout in any column.  Input-perturbation policy:

  * y-perturbed rows ("honest"): the small RHS changes per iteration, so
    XLA cannot hoist the op out of the timing loop and no large copy is
    added.  Used for every entry that consumes y.
  * R-perturbed rows: ops without an RHS (the selected inversion) must
    perturb R itself, which adds a full [s, d, d, C] scale-copy per
    iteration (~2x R bytes of traffic).  That bias is CALIBRATED per d
    by timing the solve both ways (bias_d = solve_Rpert - solve_ypert)
    and SUBTRACTED from the R-perturbed columns -- fixing the round-4
    tables' acknowledged bias.

Columns per d:
  fwd_solve    solve_cm (pallas)                      -- the forward
  fwd_mahal    mahal_and_logdet_cm (pallas)
  inv_raw      inverse_blocks_cm (raw sweep + raw Takahashi), debiased
  bwd_old      solve_cm + inverse_blocks_cm (the round-4 VJP backward),
               debiased
  bwd_fused    solve_and_inverse_cm (round-5: ONE collect sweep + ONE
               descending back-substitution + hat-Takahashi kernel)
  ratio        bwd_fused / fwd_solve  (target <= 2.0 at every d)

Run:  python examples/bench_backward.py [dmin dmax]
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
    m = c * s
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
    nat = (jnp.asarray(diag[:n]), jnp.asarray(off[: n - 1]),
           jnp.asarray(v[:n]))
    return R_cm, O_cm, y_cm, nat


def timeit(fn, R, O, y, perturb):
    """K in-jit iterations; ``perturb`` = "y" (cheap, honest) or "R"
    (adds the calibrated scale-copy bias)."""

    @jax.jit
    def loop(R, O, y, c):
        def body(i, acc):
            e = c + 1e-9 * i.astype(R.dtype)
            if perturb == "y":
                out = fn(R, O, y * e)
            else:
                out = fn(R * e, O, y)
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


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    backend = "pallas" if on_tpu else "xla"
    dmin = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dmax = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    for d in range(dmin, dmax + 1):
        R, O, y, nat = make_system_cm(N, d)
        out = {"metric": f"backward_n1e6_d{d}", "backend": backend,
               "unit": "ms"}

        def solve(R, O, y):
            return pt.solve_cm(R, O, y, backend=backend)

        def mahal(R, O, y):
            return pt.mahal_and_logdet_cm(R, O, y, backend=backend)

        def inv(R, O, y):
            return pt.inverse_blocks_cm(R, O, backend=backend)

        def bwd_old(R, O, y):
            x, _ = pt.solve_cm(R, O, y, backend=backend)
            sd, so = pt.inverse_blocks_cm(R, O, backend=backend)
            return x, sd, so

        def bwd_fused(R, O, y):
            return pt.solve_and_inverse_cm(R, O, y, backend=backend)

        try:
            out["fwd_solve"] = round(timeit(solve, R, O, y, "y"), 3)
            out["fwd_mahal"] = round(timeit(mahal, R, O, y, "y"), 3)
            solve_rp = timeit(solve, R, O, y, "R")
            bias = max(0.0, solve_rp - out["fwd_solve"])
            out["rpert_bias"] = round(bias, 3)
            out["inv_raw"] = round(timeit(inv, R, O, y, "R") - bias, 3)
            out["bwd_old"] = round(timeit(bwd_old, R, O, y, "R") - bias, 3)
            out["bwd_fused"] = round(timeit(bwd_fused, R, O, y, "y"), 3)
            out["ratio"] = round(out["bwd_fused"] / out["fwd_solve"], 3)
        except Exception as e:  # noqa: BLE001 - report and continue
            out["error"] = str(e)[:160]
        print(json.dumps(out), flush=True)

        # WIDE-entry rows (8 < d < 16): the natural-layout library route
        # (solve_and_logdet dispatches the wide collect sweep; the
        # analytic-VJP backward routes through the round-5 wide fused
        # solveinv pair).  Both columns include the natural -> wide
        # relayout, so the ratio is the honest library-level one.
        if 8 < d < 16 and backend == "pallas":
            dn, on, yn = nat
            s_w = pt.default_chunk_len(N)
            r11, rst, o11, ost, y_wcm, _ = pt._chunk_layout_wide(
                dn, on, yn, s_w)
            wout = {"metric": f"backward_wide_n1e6_d{d}",
                    "backend": backend, "unit": "ms"}

            def fwd_w(dg, of, yy):
                # natural library entry: includes the natural -> wide
                # relayout (the forward primal's true cost)
                return pt.solve_and_logdet(dg, of, yy, backend="pallas")

            # the VJP-backward reality: wide residuals are CACHED by the
            # forward, so the backward starts from wide inputs.  All five
            # arrays are ARGUMENTS (a closure over rst/ost serializes
            # ~150 MB into the remote-compile request -> HTTP 413 /
            # broken pipe; CLAUDE.md round-3 gotcha).
            @jax.jit
            def loop_wcm(r11p, rstp, o11p, ostp, ycmp, cs):
                def body(i, acc):
                    e = cs + 1e-9 * i.astype(r11p.dtype)
                    out = pt._solve_inverse_wide_cm(
                        r11p, rstp, o11p, ostp, ycmp * e, 0.0)
                    return acc + sum(jnp.ravel(a)[0]
                                     for a in jax.tree.leaves(out))
                return jax.lax.fori_loop(0, K, body,
                                         jnp.zeros((), r11p.dtype))

            def time_wcm():
                float(loop_wcm(r11, rst, o11, ost, y_wcm, 1.0))
                times = []
                for i in range(3):
                    t0 = time.time()
                    float(loop_wcm(r11, rst, o11, ost, y_wcm,
                                   1.0 + i * 1e-6))
                    times.append((time.time() - t0) / K)
                return float(np.median(times) * 1e3)

            def loss_w(dg, of, yy):
                m, ld = pt.mahal_and_logdet(dg, of, yy,
                                            backend="pallas")
                return m + ld

            gfn = jax.grad(loss_w, argnums=(0, 1, 2))

            try:
                wout["fwd_solve_wide"] = round(
                    timeit(fwd_w, dn, on, yn, "y"), 3)
                wout["bwd_fused_wide_cm"] = round(time_wcm(), 3)
                wout["ratio_wide"] = round(
                    wout["bwd_fused_wide_cm"] / wout["fwd_solve_wide"],
                    3)
                # user-level: full VJP of the fused (mahal, logdet)
                # through the wide custom VJP (fwd + cached-wide bwd +
                # cotangent assembly)
                wout["grad_mahal_wide"] = round(
                    timeit(gfn, dn, on, yn, "y"), 3)
            except Exception as e:  # noqa: BLE001 - report and continue
                wout["error"] = str(e)[:160]
            print(json.dumps(wout), flush=True)


if __name__ == "__main__":
    main()
