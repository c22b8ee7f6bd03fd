"""Multi-device solve: one conic program's KKT factorization sharded
across a `tp` mesh axis inside the IPM (per-device block LDLs + a
psum-reduced dense Schur complement over ICI).

Runs on any device count — try it without hardware via:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multidevice_solve.py
"""

import numpy as np
import jax
from jax.sharding import Mesh

import clarabel_tpu as ct


def multiscenario_qp(scenarios=12, n_loc=6, n_shared=3, seed=0):
    """Scenario blocks coupled through a few shared variables — the
    canonical block-arrow shape (multi-scenario / MPC problems)."""
    rng = np.random.default_rng(seed)
    n = n_shared + scenarios * n_loc
    P = np.zeros((n, n))
    P[:n_shared, :n_shared] = np.eye(n_shared)
    for s in range(scenarios):
        o = n_shared + s * n_loc
        F = rng.standard_normal((n_loc, n_loc)) / 2
        P[o:o + n_loc, o:o + n_loc] = F @ F.T + np.eye(n_loc)
    q = rng.standard_normal(n) * 0.1
    rows, bs, cones = [], [], []
    for s in range(scenarios):
        o = n_shared + s * n_loc
        Asoc = np.zeros((n_loc + 1, n))
        Asoc[0, 0] = -1.0
        for i in range(n_loc):
            Asoc[1 + i, o + i] = -1.0
        rows.append(Asoc)
        bs.append(np.concatenate([[2.0], np.zeros(n_loc)]))
        cones.append(ct.SecondOrderConeT(n_loc + 1))
    return P, q, np.vstack(rows), np.concatenate(bs), cones


def main():
    P, q, A, b, cones = multiscenario_qp()
    devices = np.array(jax.devices())
    mesh = Mesh(devices, axis_names=("tp",))
    print(f"devices: {len(devices)} ({devices[0].platform})")

    solver = ct.Solver(P, q, A, b, cones, mesh=mesh)
    plan = solver._structure
    print(f"backend={solver._backend} blocks={plan.p} "
          f"block-size={plan.nb} tail={plan.nt}")
    sol = solver.solve()
    print(sol)

    ref = ct.Solver(P, q, A, b, cones).solve()
    print(f"matches single-device: "
          f"{np.linalg.norm(sol.x - ref.x):.2e}")


if __name__ == "__main__":
    main()
