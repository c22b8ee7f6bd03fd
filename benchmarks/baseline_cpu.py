"""Measured single-core CPU baseline for the batched-SOCP headline bench.

BASELINE.md calls for "measured single-core Clarabel.jl at 1e-8" on the
benchmark instances, but this image has no Julia runtime and installing
the Rust `clarabel` wheel is not permitted.  The closest honest stand-in
that is a *measurement*, not a guess: the SAME interior-point algorithm
(this package's IPM at identical 1e-8 tolerances), XLA-compiled for CPU,
solving the SAME instances strictly sequentially (`lax.map`, batch size
1) on a single thread.  This matches the reference's execution model —
one compiled native solve at a time on one core — and the same
iteration counts, so it measures hardware + execution model, not
algorithmic differences.

Run standalone (prints one JSON line) or via `measure_or_load()` which
caches the measurement per config in `.baseline_cpu.json`:

    python -m benchmarks.baseline_cpu
"""

import json
import os
import subprocess
import sys

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".baseline_cpu.json")


def _run_measurement(batch: int, n: int, seed: int) -> dict:
    """Executed in a fresh single-threaded CPU-only subprocess."""
    import time

    import numpy as np
    import jax

    # the env var alone does not always keep jax off the tunneled TPU
    # platform (observed: silent multi-minute hang resolving 'axon')
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from clarabel_tpu import NonnegativeConeT, SecondOrderConeT, Settings
    from clarabel_tpu.cones.layout import ConeLayout
    from clarabel_tpu.ipm.loop import build_solve
    from clarabel_tpu.statuscodes import SolverStatus

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from bench import make_batch

    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    layout = ConeLayout(cones)
    solve_one = build_solve(layout, Settings(), n, p_nonzero=True)

    data = tuple(jnp.asarray(x) for x in make_batch(batch, n, seed=seed))

    # strictly sequential: lax.map processes one instance at a time (the
    # single-core solver execution model); outputs only the scalars so
    # the result fetch is negligible
    def one(args):
        out = solve_one(*args)
        return (out["status"], out["iterations"], out["r_prim"],
                out["r_dual"])

    fn = jax.jit(lambda d: lax.map(one, d))
    # warm-up / compile at the FULL shape (lax.map recompiles per batch
    # length; warming a prefix would leave the compile inside the timing)
    jax.block_until_ready(fn(data))

    t0 = time.perf_counter()
    st, it, rp, rd = jax.block_until_ready(fn(data))
    dt = time.perf_counter() - t0
    st = np.asarray(st)
    return {
        "solves_per_sec": batch / dt,
        "wall_s": dt,
        "batch": batch,
        "n": n,
        "solved": int(np.sum(st == int(SolverStatus.SOLVED))),
        "mean_iters": float(np.mean(np.asarray(it))),
        "method": "same-algorithm XLA-CPU sequential lax.map, "
                  "single thread, 1e-8 tolerances",
    }


def measure(batch: int = 4096, n: int = 6, seed: int = 0) -> dict:
    """Spawn the single-threaded CPU measurement subprocess."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
    )
    # pin BLAS/Eigen threading too
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        env[v] = "1"
    code = (
        "import sys, json; sys.path.insert(0, {root!r}); "
        "from benchmarks.baseline_cpu import _run_measurement; "
        "print('BASELINE_JSON ' + json.dumps("
        "_run_measurement({batch}, {n}, {seed})))"
    ).format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             batch=batch, n=n, seed=seed)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("BASELINE_JSON "):
            return json.loads(line[len("BASELINE_JSON "):])
    raise RuntimeError(
        f"baseline measurement failed:\n{out.stdout}\n{out.stderr}"
    )


def measure_or_load(batch: int = 4096, n: int = 6, seed: int = 0) -> dict:
    key = f"b{batch}_n{n}_s{seed}"
    cache = {}
    if os.path.exists(_CACHE):
        try:
            with open(_CACHE) as f:
                cache = json.load(f)
        except (json.JSONDecodeError, OSError):
            cache = {}
    if key not in cache:
        cache[key] = measure(batch, n, seed)
        with open(_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    return cache[key]


if __name__ == "__main__":
    print(json.dumps(measure_or_load()))
