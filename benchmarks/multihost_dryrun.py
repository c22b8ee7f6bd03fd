"""Multi-host (DCN) functional validation on simulated hosts.

Real multi-host TPU hardware is not available in this environment; this
script simulates it faithfully at the JAX level: two OS processes, each
with its own set of local CPU devices, joined through
`jax.distributed.initialize` (the same runtime used by real multi-host
TPU pods; collectives ride Gloo here, ICI/DCN there).  It validates the
two scaling paths end-to-end ACROSS PROCESS BOUNDARIES:

* **dp across DCN** — a batch of independent QP instances sharded over
  the process-spanning `dp` axis of the hybrid mesh built by
  `clarabel_tpu.parallel.multihost.make_solver_mesh`; every instance must
  converge and match single-process results.
* **tp on local devices** — the block-arrow Schur factorization
  (`parallel/schur.py`) over the `tp` axis, with its per-iteration psum
  staying within each host's local devices, result checked against a
  dense numpy solve.

Usage:
    python benchmarks/multihost_dryrun.py            # launcher (2 procs)
    python benchmarks/multihost_dryrun.py --nproc 2  # explicit
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("MULTIHOST_DRYRUN_PORT", "12367"))


def worker(pid: int, nproc: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=nproc, process_id=pid,
    )
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from clarabel_tpu import NonnegativeConeT, Settings
    from clarabel_tpu.cones.layout import ConeLayout
    from clarabel_tpu.ipm.loop import build_solve
    from clarabel_tpu.parallel.multihost import (
        make_solver_mesh, mesh_placement_report,
    )

    def log(msg):
        if pid == 0:
            print(msg, flush=True)

    mesh = make_solver_mesh(dp=nproc, tp=4)
    log(mesh_placement_report(mesh))

    # ---- workload 1: dp-sharded instance batch across processes --------
    n = 3
    cones = [NonnegativeConeT(2 * n)]
    layout = ConeLayout(cones)
    solve_one = build_solve(layout, Settings(), n, p_nonzero=True)

    B = 4 * nproc  # 2 instances per dp shard... B/dp must be integer
    rng = np.random.default_rng(0)  # same seed everywhere: global batch
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        Ps.append(F @ F.T + 0.5 * np.eye(n))
        qs.append(rng.standard_normal(n))
        As.append(np.vstack([np.eye(n), -np.eye(n)]))
        bs.append(np.concatenate([rng.uniform(0.5, 1.5, n),
                                  np.zeros(n)]))
    data = [np.stack(x) for x in (Ps, qs, As, bs)]

    sharding = NamedSharding(mesh, P("dp"))
    lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)
    gdata = [
        jax.make_array_from_process_local_data(sharding, d[lo:hi])
        for d in data
    ]
    fn = jax.jit(jax.vmap(solve_one), in_shardings=(sharding,) * 4)
    out = fn(*gdata)
    # every process checks its own dp shard; a failure anywhere surfaces
    # through the launcher's exit-code check
    local_status = np.concatenate([
        np.asarray(sh.data).ravel()
        for sh in out["status"].addressable_shards
    ])
    assert np.all(local_status == 1), (
        f"proc {pid} dp statuses: {local_status}"
    )
    log(f"dp across processes: {B} instances total, local shard of "
        f"{local_status.size} all SOLVED")

    # ---- workload 2: tp-sharded block-arrow Schur factorization --------
    from clarabel_tpu.parallel.schur import BlockArrowKKT

    p, nb, nt = 8, 16, 8
    rng = np.random.default_rng(1)
    D = np.stack([np.eye(nb) * 2 + 0.1 * np.ones((nb, nb))
                  for _ in range(p)])
    Bc = 0.1 * rng.standard_normal((p, nb, nt))
    C = np.eye(nt) * 3.0

    kkt = BlockArrowKKT(mesh, p, nb, nt)
    shard = NamedSharding(mesh, P("tp"))
    rep = NamedSharding(mesh, P())
    mk = jax.make_array_from_process_local_data
    ok = kkt.factor(mk(shard, D), mk(shard, Bc), mk(rep, C))
    assert ok, "block-arrow factorization failed"
    rhs_b = rng.standard_normal((p, nb))
    rhs_t = rng.standard_normal(nt)
    x, y = kkt.solve(mk(shard, rhs_b), mk(rep, rhs_t))

    # reassemble from the locally addressable shards (the tp axis is
    # process-local and the dp axis is replicated, so every process can
    # reconstruct the full solution without cross-process gathers)
    def to_np(arr):
        out = np.zeros(arr.shape, arr.dtype)
        for sh in arr.addressable_shards:
            out[sh.index] = np.asarray(sh.data)
        return out

    # dense reference
    N = p * nb + nt
    K = np.zeros((N, N))
    for i in range(p):
        K[i*nb:(i+1)*nb, i*nb:(i+1)*nb] = D[i]
        K[i*nb:(i+1)*nb, p*nb:] = Bc[i]
        K[p*nb:, i*nb:(i+1)*nb] = Bc[i].T
    K[p*nb:, p*nb:] = C
    ref = np.linalg.solve(K, np.concatenate([rhs_b.ravel(), rhs_t]))
    got = np.concatenate([to_np(x).ravel(), to_np(y).ravel()])
    err = np.abs(got - ref).max()
    assert err < 1e-8, f"schur solve err {err}"
    log(f"tp Schur factorization across mesh: solve err {err:.2e}")

    # ---- workload 3: end-to-end IPM with the tp-sharded KKT ------------
    # one conic program solved through Solver(mesh=...): the block-arrow
    # factorization runs under shard_map on the hybrid mesh's tp axis
    # (replicated over dp), with identical data on every process
    from clarabel_tpu import Solver, ZeroConeT

    rng = np.random.default_rng(7)
    grid = 12
    nq = 2 * grid
    Pq = np.diag(rng.uniform(1.0, 3.0, nq))
    for i in range(nq - 1):
        v = rng.uniform(-0.3, 0.3)
        Pq[i, i + 1] = Pq[i + 1, i] = v
    qq = rng.standard_normal(nq)
    Aeq = np.zeros((grid, nq))
    for i in range(grid):
        Aeq[i, 2 * i], Aeq[i, 2 * i + 1] = 1.0, -1.0
    A2 = np.vstack([Aeq, np.eye(nq), -np.eye(nq)])
    b2 = np.concatenate([rng.standard_normal(grid) * 0.1,
                         5 * np.ones(nq), 5 * np.ones(nq)])
    cones_q = [ZeroConeT(grid), NonnegativeConeT(2 * nq)]
    solver = Solver(Pq, qq, A2, b2, cones_q, mesh=mesh)
    assert solver._backend == "blockarrow"
    sol = solver.solve()
    assert int(sol.status) == 1, f"tp-in-IPM status {sol.status}"
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
    log(f"tp-sharded IPM across the hybrid mesh: SOLVED in "
        f"{sol.iterations} iters, r_prim={sol.r_prim:.2e}")
    log("MULTIHOST DRYRUN PASS")


def main():
    nproc = 2
    if "--nproc" in sys.argv:
        nproc = int(sys.argv[sys.argv.index("--nproc") + 1])
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), nproc)
        return
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(p), "--nproc", str(nproc)],
            stdout=subprocess.PIPE if p else None,
            stderr=subprocess.STDOUT if p else None,
        )
        for p in range(nproc)
    ]
    codes = [p.wait() for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")


if __name__ == "__main__":
    main()
