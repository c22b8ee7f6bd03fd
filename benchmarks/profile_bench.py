"""Profile one warm batched solve and print the per-op self-time table.

Usage:  python benchmarks/profile_bench.py [trace_dir]

Grounds the kernel-fusion plan (docs/PERF.md): shows how per-iteration
wall time distributes over the hundreds of small fused VPU ops inside
the IPM while_loop.
"""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ipm_trace"
    import jax

    from clarabel_tpu import (
        BatchSolver, NonnegativeConeT, SecondOrderConeT, Settings,
    )
    from bench import make_batch, BATCH, N

    cones = [NonnegativeConeT(N), SecondOrderConeT(N + 1)]
    bs = BatchSolver(cones, N, Settings(kkt_backend="condensed"))
    data = make_batch(BATCH, N)
    bs.solve(*data)  # warm / compile (persistent cache)

    with jax.profiler.trace(trace_dir):
        out = bs.solve(*data)
    print(f"profiled solve: {out.solve_time:.3f}s "
          f"solved={int((out.status == 1).sum())}/{BATCH}")

    from benchmarks.trace_summary import main as summarize  # noqa: F401
    # trace_summary exposes a __main__-style flow; call it via argv
    sys.argv = ["trace_summary", trace_dir, "30"]
    import runpy

    runpy.run_module("benchmarks.trace_summary", run_name="__main__")


if __name__ == "__main__":
    main()
