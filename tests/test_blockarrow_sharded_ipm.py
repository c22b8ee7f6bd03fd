"""End-to-end multi-device IPM: the block-arrow KKT factorization sharded
over a `tp` mesh axis INSIDE the solver loop (VERDICT r1 item #1).

The reference's only parallel factorization is the multithreaded Pardiso
backend selected through settings (reference: ext/directldl_pardiso.jl,
src/settings.jl:108-110).  Here `Solver(..., mesh=...)` factors one conic
program's KKT across devices: per-device block LDLs + a psum-reduced dense
Schur complement, with per-iteration Hs writes and iterative refinement
all in-graph.  Runs on the 8-device virtual CPU mesh from conftest.
"""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from clarabel_tpu import (
    Solver, Settings, SolverStatus,
    ZeroConeT, NonnegativeConeT, SecondOrderConeT,
)

from test_blockarrow_backend import banded_qp


def _mesh(ndev):
    return Mesh(np.array(jax.devices()[:ndev]), axis_names=("tp",))


def test_sharded_ipm_matches_single_device_qp():
    P, q, A, b, cones = banded_qp()
    sol_1 = Solver(P, q, A, b, cones,
                   Settings(kkt_backend="blockarrow")).solve()
    mesh = _mesh(8)
    solver = Solver(P, q, A, b, cones, Settings(), mesh=mesh)
    assert solver._backend == "blockarrow"
    # plan padded to a multiple of the tp axis size
    assert solver._structure.p % 8 == 0
    sol_8 = solver.solve()
    assert sol_8.status == SolverStatus.SOLVED == sol_1.status
    assert sol_8.iterations == sol_1.iterations
    assert np.linalg.norm(sol_8.x - sol_1.x) < 1e-8 * max(
        1.0, np.linalg.norm(sol_1.x)
    )
    assert sol_8.r_prim < 1e-8 and sol_8.r_dual < 1e-8


def test_sharded_ipm_socp():
    """Multi-scenario SOCP: independent scenario blocks coupled through a
    few shared variables — the canonical block-arrow shape."""
    rng = np.random.default_rng(3)
    n_shared, n_loc, S = 3, 4, 6
    n = n_shared + S * n_loc
    P = np.zeros((n, n))
    P[:n_shared, :n_shared] = np.eye(n_shared)
    for s in range(S):
        o = n_shared + s * n_loc
        F = rng.standard_normal((n_loc, n_loc)) / 2
        P[o:o + n_loc, o:o + n_loc] = F @ F.T + np.eye(n_loc)
    q = rng.standard_normal(n) * 0.1

    rows = []
    bs = []
    cones = []
    for s in range(S):
        o = n_shared + s * n_loc
        # per-scenario SOC: ||x_loc|| <= t + const, t = shared var 0
        Asoc = np.zeros((n_loc + 1, n))
        Asoc[0, 0] = -1.0
        for i in range(n_loc):
            Asoc[1 + i, o + i] = -1.0
        rows.append(Asoc)
        bs.append(np.concatenate([[2.0], np.zeros(n_loc)]))
        cones.append(SecondOrderConeT(n_loc + 1))
    A = np.vstack(rows)
    b = np.concatenate(bs)

    sol_1 = Solver(P, q, A, b, cones,
                   Settings(kkt_backend="blockarrow")).solve()
    sol_8 = Solver(P, q, A, b, cones, Settings(), mesh=_mesh(8)).solve()
    assert sol_1.status == SolverStatus.SOLVED
    assert sol_8.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol_8.x - sol_1.x) < 1e-7
    assert sol_8.r_prim < 1e-8 and sol_8.r_dual < 1e-8


def test_sharded_ipm_sparse_mode():
    """Sparse data mode (map-based assembly) through the sharded path."""
    import scipy.sparse as sp

    P, q, A, b, cones = banded_qp(grid=40, seed=5)
    Psp, Asp = sp.csr_matrix(P), sp.csr_matrix(A)
    s1 = Solver(Psp, q, Asp, b, cones,
                Settings(sparse_data=True, kkt_backend="blockarrow"))
    assert s1._sparse_mode
    sol_1 = s1.solve()
    s8 = Solver(Psp, q, Asp, b, cones, Settings(sparse_data=True),
                mesh=_mesh(8))
    assert s8._sparse_mode and s8._backend == "blockarrow"
    assert s8._structure.p % 8 == 0
    sol_8 = s8.solve()
    assert sol_8.status == SolverStatus.SOLVED == sol_1.status
    assert np.linalg.norm(sol_8.x - sol_1.x) < 1e-7
    assert sol_8.r_prim < 1e-8 and sol_8.r_dual < 1e-8


def test_mesh_on_unstructured_problem_still_solves():
    """A dense problem yields a degenerate plan (few blocks, most devices
    padded with identity blocks) — wasteful but correct."""
    rng = np.random.default_rng(1)
    n = 8
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    A = -np.eye(n)
    b = np.ones(n) * 5
    sol_1 = Solver(P, q, A, b, [NonnegativeConeT(n)]).solve()
    sol_8 = Solver(P, q, A, b, [NonnegativeConeT(n)], mesh=_mesh(8)).solve()
    assert sol_8.status == SolverStatus.SOLVED == sol_1.status
    assert np.linalg.norm(sol_8.x - sol_1.x) < 1e-7


def test_mesh_two_devices():
    """Axis sizes that do not divide the natural block count exercise
    the pad-blocks path."""
    P, q, A, b, cones = banded_qp(grid=11, seed=7)
    sol_1 = Solver(P, q, A, b, cones,
                   Settings(kkt_backend="blockarrow")).solve()
    mesh = Mesh(np.array(jax.devices()[:3]), axis_names=("tp",))
    sol_3 = Solver(P, q, A, b, cones, mesh=mesh).solve()
    assert sol_3.status == SolverStatus.SOLVED == sol_1.status
    assert np.linalg.norm(sol_3.x - sol_1.x) < 1e-7
