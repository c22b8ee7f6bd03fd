"""Benchmark: batched small-SOCP throughput (the BASELINE.md headline config).

Solves a batch of independent small SOCPs with the vmapped IPM to the full
1e-8 tolerances and reports solves/second.

`vs_baseline` compares against single-core Clarabel.jl throughput on the
same instances.  The reference publishes no numbers (BASELINE.md), and no
Julia runtime is present in this image, so the baseline constant below is a
conservative stand-in: 2000 solves/s single-core for ~12-variable SOCPs
(~0.5 ms per solve, consistent with Clarabel-class solvers on trivial
SOCPs).  Replace with the driver's measured Clarabel number when available.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import time

# persistent compilation cache: the headline program takes minutes to
# compile through the remote TPU compiler; cache it across processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

BASELINE_SINGLE_CORE_SOLVES_PER_SEC = 2000.0
BATCH = 4096
N = 6  # variables per instance


def make_batch(B, n, seed=0):
    rng = np.random.default_rng(seed)
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        Ps.append(F @ F.T + 0.5 * np.eye(n))
        qs.append(rng.standard_normal(n))
        As.append(np.vstack([np.eye(n), np.zeros((1, n)), -np.eye(n)]))
        bs.append(np.concatenate([rng.uniform(0.5, 1.5, n),
                                  [rng.uniform(1.0, 2.0)], np.zeros(n)]))
    return (np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs))


def main():
    import os

    from clarabel_tpu import (
        BatchSolver, NonnegativeConeT, SecondOrderConeT, Settings,
    )
    from clarabel_tpu.statuscodes import SolverStatus

    # benchmark configuration: the condensed (normal-equations) backend is
    # the fastest measured on-chip and keeps every instance under ~15
    # iterations.  Override with BENCH_BACKEND=ldl-f64 / ldl-mixed /
    # condensed-mixed.
    mode = os.environ.get("BENCH_BACKEND", "condensed")
    settings = {
        "ldl-f64": Settings(),
        "ldl-mixed": Settings(mixed_precision=True),
        "condensed": Settings(kkt_backend="condensed"),
        "condensed-mixed": Settings(kkt_backend="condensed",
                                    mixed_precision=True),
    }[mode]

    cones = [NonnegativeConeT(N), SecondOrderConeT(N + 1)]
    bs = BatchSolver(cones, N, settings)
    data = make_batch(BATCH, N)

    # warm-up (compile)
    bs.solve(*(x[:BATCH] for x in data))

    t0 = time.perf_counter()
    out = bs.solve(*data)
    dt = time.perf_counter() - t0

    n_solved = int(np.sum(out.status == int(SolverStatus.SOLVED)))
    solves_per_sec = n_solved / dt

    print(json.dumps({
        "metric": f"batched_socp_throughput_B{BATCH}_n{N}",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s (1e-8 tol)",
        "vs_baseline": round(solves_per_sec / BASELINE_SINGLE_CORE_SOLVES_PER_SEC, 2),
        "batch": BATCH,
        "solved": n_solved,
        "wall_s": round(dt, 3),
        "mean_iters": float(np.mean(out.iterations)),
    }))


if __name__ == "__main__":
    main()
