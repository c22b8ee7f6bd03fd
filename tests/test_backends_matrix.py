"""Linear-solver backend matrix: the same fixtures solved per backend.

Mirrors the reference's linear-solver matrix tests
(reference: test/OptTests/linear_solvers.jl) across this solver's
backends: unblocked LDL, blocked LDL (N > 512), condensed, and the
throughput (f32) preset.
"""

import numpy as np
import pytest

from clarabel_tpu import (
    Solver, Settings, SolverStatus, NonnegativeConeT, SecondOrderConeT,
    ZeroConeT,
)

from fixtures import basic_qp_data


def medium_socp(m=420, n=120, seed=3):
    """KKT dim n+m+... > 512 so the blocked LDL path engages."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((m, n)) / np.sqrt(m)
    g = rng.standard_normal(m)
    nv = n + 1
    P = np.zeros((nv, nv))
    q = np.zeros(nv)
    q[n] = 1.0
    A1 = np.zeros((m + 1, nv))
    A1[0, n] = -1.0
    A1[1:, :n] = -F
    b1 = np.concatenate([[0.0], -g])
    A = A1
    b = b1
    cones = [SecondOrderConeT(m + 1)]
    return P, q, A, b, cones


def test_blocked_ldl_path():
    P, q, A, b, cones = medium_socp()
    solver = Solver(P, q, A, b, cones)
    assert solver.linear_solver_info()["variant"] == "blocked"
    sol = solver.solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8


@pytest.mark.parametrize("backend", ["ldl", "condensed"])
def test_backend_matrix_qp(backend):
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(P, q, A, b, cones, Settings(kkt_backend=backend)).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - 1.8800000298331538) < 1e-6


def test_throughput_preset():
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(P, q, A, b, cones, Settings.throughput()).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - 1.88) < 1e-3
