"""Multi-device scaling validation on a virtual CPU mesh.

Real multi-chip hardware is not available in this environment; this script
validates that the two scaling paths (dp-sharded instance batches and the
tp-sharded block-arrow Schur factorization) compile and execute over
1/2/4/8-device meshes and reports relative timings.  On real ICI the
collectives in the Schur reduction are bandwidth-bound psums; on a host
CPU mesh the numbers only demonstrate functional scaling.

Usage: python benchmarks/scaling_dryrun.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh

from clarabel_tpu import NonnegativeConeT, SecondOrderConeT, Settings
from clarabel_tpu.parallel.batch_impl import BatchSolver
from clarabel_tpu.parallel.schur import BlockArrowKKT


def bench_dp(ndev, B=64, n=6):
    rng = np.random.default_rng(0)
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        Ps.append(F @ F.T + 0.5 * np.eye(n))
        qs.append(rng.standard_normal(n))
        As.append(np.vstack([np.eye(n), np.zeros((1, n)), -np.eye(n)]))
        bs.append(np.concatenate([rng.uniform(0.5, 1.5, n),
                                  [rng.uniform(1.0, 2.0)], np.zeros(n)]))
    data = (np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs))

    mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("dp",))
    bsolver = BatchSolver(cones, n, mesh=mesh)
    bsolver.solve(*data)  # compile
    t0 = time.perf_counter()
    out = bsolver.solve(*data)
    dt = time.perf_counter() - t0
    return dt, int((out.status == 1).sum())


def bench_tp(ndev, p=8, nb=64, nt=16):
    rng = np.random.default_rng(1)
    D = np.stack([
        (lambda F: F @ F.T + nb * np.eye(nb))(rng.standard_normal((nb, nb)))
        for _ in range(p)
    ])
    B = rng.standard_normal((p, nb, nt))
    G = rng.standard_normal((nt, nt))
    C = G @ G.T + (nt + p * nb) * np.eye(nt)

    mesh = Mesh(np.array(jax.devices()[:ndev]), axis_names=("tp",))
    kkt = BlockArrowKKT(mesh, p, nb, nt)
    kkt.factor(D, B, C)  # compile + factor
    t0 = time.perf_counter()
    kkt.factor(D, B, C)
    dt = time.perf_counter() - t0
    return dt


def main():
    print("devices available:", len(jax.devices()))
    print("\ndp (batched instances sharded over mesh):")
    base = None
    for ndev in (1, 2, 4, 8):
        dt, solved = bench_dp(ndev)
        base = base or dt
        print(f"  {ndev} devices: {dt*1e3:8.1f} ms  "
              f"(speedup {base/dt:4.2f}x, solved {solved})")

    print("\ntp (block-arrow Schur factorization sharded over mesh):")
    base = None
    for ndev in (1, 2, 4, 8):
        dt = bench_tp(ndev)
        base = base or dt
        print(f"  {ndev} devices: {dt*1e3:8.1f} ms  (speedup {base/dt:4.2f}x)")


if __name__ == "__main__":
    main()
