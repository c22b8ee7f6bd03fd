"""Run all BASELINE.md benchmark configs and print a results table.

Usage:  python benchmarks/run_all.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from clarabel_tpu import Solver, Settings, SolverStatus
from clarabel_tpu.parallel.batch_impl import BatchSolver

from benchmarks import configs


def run_single(name, gen, settings=None, repeats=3):
    P, q, A, b, cones = gen()
    settings = settings or Settings()
    solver = Solver(P, q, A, b, cones, settings)
    sol = solver.solve()  # compile + first solve
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sol = solver.solve()
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(
        f"{name:28s} status={sol.status.name:9s} iters={sol.iterations:3d} "
        f"obj={sol.obj_val: .6e} rp={sol.r_prim:.1e} rd={sol.r_dual:.1e} "
        f"time={t*1e3:8.1f}ms"
    )
    return sol, t


def run_batched(B, n, settings=None):
    (P, q, A, b), cones = configs.batched_socp(B=B, n=n)
    bs = BatchSolver(cones, n, settings or Settings())
    bs.solve(P, q, A, b)  # compile
    t0 = time.perf_counter()
    out = bs.solve(P, q, A, b)
    dt = time.perf_counter() - t0
    ns = int(np.sum(out.status == int(SolverStatus.SOLVED)))
    print(
        f"{'batched SOCP B=' + str(B):28s} solved={ns}/{B} "
        f"iters(mean)={out.iterations.mean():.1f} "
        f"rp(max)={out.r_prim.max():.1e} time={dt*1e3:8.1f}ms "
        f"-> {ns/dt:8.0f} solves/s"
    )
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    scale = 0.25 if args.quick else 1.0

    # Maros–Mészáros-style named instances, ingested from real QPS files
    # through the QPS reader (benchmarks/data; regenerate with
    # python benchmarks/qps_instances.py)
    from benchmarks import qps_instances
    from clarabel_tpu.io.qps import load_qps

    qps_instances.write_all()
    for fname in sorted(qps_instances.INSTANCES):
        path = os.path.join(qps_instances.DATA_DIR, fname)
        prob = load_qps(path)

        def _gen(p=prob):
            return p.P.toarray(), p.q, p.A.toarray(), p.b, p.cones

        run_single(f"qps {prob.name}", _gen)

    run_single("markowitz QP (200)", lambda: configs.markowitz_qp(
        n_assets=int(200 * scale) or 50))
    run_single("cvxqp-style sparse QP", lambda: configs.cvxqp_style(
        n=int(200 * scale) or 50))
    run_single("aug2d-style QP", lambda: configs.aug2d_style(
        grid=int(10 * scale) or 5))
    run_single("robust LS SOCP", lambda: configs.robust_least_squares_socp(
        m=int(2000 * scale), n=int(500 * scale)))
    run_single("max-cut SDP (chordal)", lambda: configs.maxcut_sdp(
        nv=int(60 * scale) or 20))
    run_batched(B=int(4096 * scale), n=6)


if __name__ == "__main__":
    main()
