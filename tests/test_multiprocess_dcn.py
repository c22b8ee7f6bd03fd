"""True multi-process (simulated multi-host / DCN) validation.

Spawns the benchmarks/multihost_dryrun.py launcher: two OS processes with
4 CPU devices each joined via jax.distributed.initialize, running a
dp-sharded batch solve and a tp-sharded block-arrow Schur factorization
across process boundaries.  This is the closest this single-host
environment can get to a real multi-host pod (same JAX distributed
runtime; Gloo instead of DCN)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multiprocess_dcn_dryrun():
    env = dict(os.environ)
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub conftest's
    env.pop("XLA_FLAGS", None)
    env["MULTIHOST_DRYRUN_PORT"] = "12399"
    out = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "benchmarks", "multihost_dryrun.py")],
        capture_output=True, text=True, timeout=560, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST DRYRUN PASS" in out.stdout
