"""Measured single-core CPU baselines for EVERY BASELINE.md config
(VERDICT r2 #5), with the TPU/CPU ratio table.

Same stand-in rationale as baseline_cpu.py (no Julia runtime in this
image): the baseline is the SAME algorithm at the same 1e-8 tolerances,
XLA-compiled for CPU, single thread, warm re-solve (compile excluded —
the reference's symbolic-once + numeric-refactor model).  The TPU side
is the same warm re-solve on the attached chip.

Configs (BASELINE.md "Baseline to be measured"):
  markowitz     Markowitz portfolio QP (200 assets)
  cvxqp         CVXQP-style sparse QP (n=200)
  aug2d         AUG2D-style equality QP (grid 10)
  robust_ls     robust least-squares SOCP (m=2000, n=500)
  maxcut        max-cut SDP with chordal decomposition (nv=60; pass
                --maxcut-nv 500 for the full BASELINE.md size)
  batched       4096x small SOCPs (handled by bench.py / baseline_cpu)

Usage:
  python benchmarks/baseline_all.py           # table + JSON artifact
  python benchmarks/baseline_all.py --cpu-only / --tpu-only
Results cache per side in .baseline_all.json at the repo root.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
_CACHE = os.path.join(ROOT, ".baseline_all.json")


def _configs(maxcut_nv=60):
    from benchmarks import configs

    return {
        "markowitz": lambda: configs.markowitz_qp(n_assets=200),
        "cvxqp": lambda: configs.cvxqp_style(n=200),
        "aug2d": lambda: configs.aug2d_style(grid=10),
        "robust_ls": lambda: configs.robust_least_squares_socp(
            m=2000, n=500),
        "maxcut": lambda: configs.maxcut_sdp(nv=maxcut_nv),
    }


def _measure_one(name, maxcut_nv=60, repeats=3):
    """Warm re-solve time of one config on the CURRENT jax platform."""
    from clarabel_tpu import Solver, Settings

    gen = _configs(maxcut_nv)[name]
    P, q, A, b, cones = gen()
    solver = Solver(P, q, A, b, cones, Settings())
    sol = solver.solve()          # compile + first solve
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sol = solver.solve()
        times.append(time.perf_counter() - t0)
    return {
        "status": int(sol.status),
        "iters": int(sol.iterations),
        "obj": float(sol.obj_val),
        "warm_solve_s": min(times),
    }


def _measure_cpu_subprocess(name, maxcut_nv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
    )
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
              "MKL_NUM_THREADS"):
        env[v] = "1"
    code = (
        "import sys, json, jax; sys.path.insert(0, {root!r}); "
        "jax.config.update('jax_platforms', 'cpu'); "
        "from benchmarks.baseline_all import _measure_one; "
        "print('BASE_JSON ' + json.dumps("
        "_measure_one({name!r}, {nv})))"
    ).format(root=ROOT, name=name, nv=maxcut_nv)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=7200)
    for line in out.stdout.splitlines():
        if line.startswith("BASE_JSON "):
            return json.loads(line[len("BASE_JSON "):])
    raise RuntimeError(f"cpu baseline {name} failed:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def _load_cache():
    if os.path.exists(_CACHE):
        try:
            with open(_CACHE) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            pass
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-only", action="store_true")
    ap.add_argument("--tpu-only", action="store_true")
    ap.add_argument("--maxcut-nv", type=int, default=60)
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    cache = {} if args.fresh else _load_cache()
    names = list(_configs(args.maxcut_nv))
    for name in names:
        nv = args.maxcut_nv if name == "maxcut" else 0
        ck = f"cpu1:{name}:{nv}"
        if not args.tpu_only and ck not in cache:
            print(f"# measuring CPU 1-thread: {name} ...", flush=True)
            cache[ck] = _measure_cpu_subprocess(name, args.maxcut_nv)
            with open(_CACHE, "w") as f:
                json.dump(cache, f, indent=1)
        tk = f"tpu:{name}:{nv}"
        if not args.cpu_only and tk not in cache:
            print(f"# measuring TPU: {name} ...", flush=True)
            os.environ.setdefault(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(ROOT, ".jax_cache"))
            cache[tk] = _measure_one(name, args.maxcut_nv)
            with open(_CACHE, "w") as f:
                json.dump(cache, f, indent=1)

    print(f"\n{'config':12s} {'cpu-1core':>10s} {'tpu':>10s} "
          f"{'tpu/cpu':>8s}  iters(c/t) status(c/t)")
    for name in names:
        nv = args.maxcut_nv if name == "maxcut" else 0
        c = cache.get(f"cpu1:{name}:{nv}")
        t = cache.get(f"tpu:{name}:{nv}")
        if not c or not t:
            print(f"{name:12s} (incomplete)")
            continue
        ratio = c["warm_solve_s"] / t["warm_solve_s"]
        print(f"{name:12s} {c['warm_solve_s']*1e3:9.1f}ms "
              f"{t['warm_solve_s']*1e3:9.1f}ms {ratio:7.2f}x  "
              f"{c['iters']}/{t['iters']}  {c['status']}/{t['status']}")


if __name__ == "__main__":
    main()
