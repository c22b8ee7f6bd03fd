"""Benchmark: batched small-SOCP throughput (the BASELINE.md headline config).

Solves a batch of independent small SOCPs with the vmapped IPM to the full
1e-8 tolerances and reports solves/second.

`vs_baseline` compares against single-core CPU throughput on the SAME
instances.  The reference publishes no numbers (BASELINE.md) and no Julia
runtime / installable Clarabel wheel exists in this image, so the
denominator is the CONSERVATIVE (larger) of:
  (a) a MEASURED single-core run of the identical algorithm at identical
      1e-8 tolerances: XLA-compiled for CPU, strictly sequential lax.map,
      single thread (benchmarks/baseline_cpu.py; cached in
      .baseline_cpu.json) — 254.8 solves/s on this image's CPU; and
  (b) 2000 solves/s, a deliberately generous estimate of what a tuned
      native CPU solver (Clarabel.jl/rs class) achieves on ~12-variable
      SOCPs (~0.5 ms per setup+solve).
Using max(a, b) means `vs_baseline` UNDER-states rather than overstates
the TPU advantage.  Both numbers are reported in the JSON line.

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

BASELINE_ESTIMATE_SOLVES_PER_SEC = 2000.0  # generous native-CPU estimate
BATCH = 4096
N = 6  # variables per instance


def measured_cpu_baseline():
    """Load (or measure) the single-core same-algorithm CPU throughput.
    Returns None if the measurement is unavailable and cannot be run."""
    try:
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.baseline_cpu import measure_or_load

        return measure_or_load(BATCH, N, seed=0)
    except Exception as exc:  # pragma: no cover - best-effort
        print(f"# cpu baseline unavailable: {exc}", flush=True)
        return None


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
    # "mega" (default): the whole batched IPM as one Pallas kernel per
    # 1024-lane block (ipm/megakernel.py) — measured 2 orders of
    # magnitude over the vmapped XLA loop, which is latency-bound on
    # per-op dispatch.  Override with BENCH_BACKEND=condensed /
    # ldl-f64 / ldl-mixed / condensed-mixed for the XLA paths.
    mode = os.environ.get("BENCH_BACKEND", "mega")
    settings = {
        "mega": Settings(kkt_backend="megakernel"),
        "ldl-f64": Settings(),
        "ldl-mixed": Settings(mixed_precision=True),
        "condensed": Settings(kkt_backend="condensed"),
        "condensed-mixed": Settings(kkt_backend="condensed",
                                    mixed_precision=True),
    }[mode]

    cones = [NonnegativeConeT(N), SecondOrderConeT(N + 1)]
    # two-phase batch: lanes the fast on-chip pass leaves below SOLVED are
    # re-solved on native-f64 CPU (TPU f64 is ~2^-49 float-float; marginal
    # instances cannot reach the last half-digit on-chip) — BASELINE.md
    # acceptance requires ALL instances at the full 1e-8 tolerances
    bs = BatchSolver(cones, N, settings, rescue="cpu")
    data = make_batch(BATCH, N)

    # warm-up (compile): full batch AND a representative rescue shape so
    # the timed run pays no compile
    warm = bs.solve(*data)
    n_warm_rescued = int(np.sum(warm.status == int(SolverStatus.SOLVED)))

    t0 = time.perf_counter()
    out = bs.solve(*data)
    dt = time.perf_counter() - t0

    n_solved = int(np.sum(out.status == int(SolverStatus.SOLVED)))
    solves_per_sec = n_solved / dt

    baseline = measured_cpu_baseline()
    base_rate = BASELINE_ESTIMATE_SOLVES_PER_SEC
    if baseline is not None:
        base_rate = max(base_rate, baseline["solves_per_sec"])

    print(json.dumps({
        "metric": f"batched_socp_throughput_B{BATCH}_n{N}",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s (1e-8 tol)",
        "vs_baseline": round(solves_per_sec / base_rate, 2),
        "baseline_solves_per_sec": base_rate,
        "baseline_measured_cpu_1core": (
            None if baseline is None
            else round(baseline["solves_per_sec"], 1)
        ),
        "baseline_method": (
            "max(measured same-algorithm XLA-CPU 1-thread sequential, "
            "2000/s native-solver estimate)"
        ),
        "batch": BATCH,
        "solved": n_solved,
        "wall_s": round(dt, 3),
        "mean_iters": float(np.mean(out.iterations)),
        # achieved useful arithmetic (docs/PERF.md derives ~4k f64
        # flops/iteration/instance for this config): the workload is
        # latency-bound, not FLOP-bound — MFU vs the MXU peak is O(1e-6)
        # by design and the relevant ceiling is kernel sequencing
        "est_useful_gflops_per_s": round(
            solves_per_sec * float(np.mean(out.iterations)) * 4e3 / 1e9, 3
        ),
    }))


if __name__ == "__main__":
    main()
