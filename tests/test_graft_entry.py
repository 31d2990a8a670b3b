"""Driver-entry contract tests.

The driver imports __graft_entry__ in a BARE environment (one real TPU
device, no XLA_FLAGS pre-set) and calls dryrun_multichip(8) directly --
round 1 failed exactly there (MULTICHIP_r01.json: rc=1).  These tests run
the driver-style invocation in a clean subprocess so the failure mode is
covered by CI, not just by the driver.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Environment as the driver sees it: no forced device count, no
    platform selection, no bootstrap marker."""
    env = dict(os.environ)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "_CYCLIC_GPS_MC_BOOTSTRAP"):
        env.pop(k, None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return env


def test_dryrun_multichip_driver_style():
    """import __graft_entry__; dryrun_multichip(8) in a bare env must
    bootstrap its own 8-virtual-device CPU mesh and print the OK line."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # keep CI off-TPU
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    assert "dryrun_multichip OK" in res.stdout, res.stdout + res.stderr


def test_entry_compiles():
    """entry() returns (fn, args) that jit-compile and produce a finite
    scalar, in-process (the conftest env already provides a backend)."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
    finally:
        sys.path.pop(0)
    import jax
    import numpy as np

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
