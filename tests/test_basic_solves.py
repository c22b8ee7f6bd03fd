"""Solver-level optimization tests: LP / QP / SOCP / equality-constrained.

Mirrors the reference's tier-1 OptTests with known solutions
(reference: test/OptTests/basic_{lp,qp,socp}.jl).
"""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus

from fixtures import (
    basic_lp_data,
    basic_qp_data,
    basic_qp_data_dualinf,
    basic_socp_data,
    eq_constrained_qp_data,
)

TOL = 1e-6


def test_univariate_qp():
    # reference: test/OptTests/basic_qp.jl:44-60
    P = np.eye(1)
    q = np.zeros(1)
    A = np.eye(1)
    b = np.ones(1)
    from clarabel_tpu import NonnegativeConeT

    sol = Solver(P, q, A, b, [NonnegativeConeT(1)]).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.x[0]) < TOL
    assert abs(sol.obj_val) < TOL
    assert abs(sol.obj_val_dual) < TOL


def test_basic_qp_feasible():
    # reference: test/OptTests/basic_qp.jl:63-74
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.3, 0.7])) < 1e-6
    assert abs(sol.obj_val - 1.8800000298331538) < 1e-6
    assert abs(sol.obj_val_dual - 1.8800000298331538) < 1e-6


def test_basic_qp_primal_infeasible():
    # reference: test/OptTests/basic_qp.jl:77-90
    P, q, A, b, cones = basic_qp_data()
    b = b.copy()
    b[0] = -1.0
    b[3] = -1.0
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.PRIMAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_basic_qp_dual_infeasible():
    # reference: test/OptTests/basic_qp.jl:93-103
    P, q, A, b, cones = basic_qp_data_dualinf()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.DUAL_INFEASIBLE
    assert np.isnan(sol.obj_val)


def test_basic_lp_feasible():
    # reference: test/OptTests/basic_lp.jl:26-38
    P, q, A, b, cones = basic_lp_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([-0.5, 0.5, -0.5])) < 1e-6
    assert abs(sol.obj_val - (-3.0)) < 1e-6
    assert abs(sol.obj_val_dual - (-3.0)) < 1e-6


def test_basic_lp_primal_infeasible():
    # reference: test/OptTests/basic_lp.jl:41-53
    P, q, A, b, cones = basic_lp_data()
    b = b.copy()
    b[0] = -1.0
    b[3] = -1.0
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.PRIMAL_INFEASIBLE


def test_basic_lp_dual_infeasible():
    # reference: test/OptTests/basic_lp.jl:56-68
    P, q, A, b, cones = basic_lp_data()
    A = A.copy()
    A[3, 0] = 1.0
    q = np.array([1.0, 0.0, 0.0])
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.DUAL_INFEASIBLE


def test_basic_socp_feasible():
    # reference: test/OptTests/basic_socp.jl:42-56
    P, q, A, b, cones = basic_socp_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([-0.5, 0.435603, -0.245459])) < 1e-4
    assert abs(sol.obj_val - (-8.4590e-01)) < 1e-4
    assert abs(sol.obj_val_dual - (-8.4590e-01)) < 1e-4


def test_eq_constrained_qp():
    P, q, A, b, cones = eq_constrained_qp_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # verify against the KKT conditions directly
    # [P A'; A 0][x;z] = [-q; b]
    n = 3
    K = np.block([[P, A.T], [A, np.zeros((2, 2))]])
    rhs = np.concatenate([-q, b])
    xz = np.linalg.solve(K, rhs)
    assert np.linalg.norm(sol.x - xz[:n]) < 1e-6


def test_solution_residuals_high_accuracy():
    """Default tolerances are 1e-8: verify the returned residuals meet them."""
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.r_prim < 1e-8
    assert sol.r_dual < 1e-8


def test_basic_socp_infeasible():
    # reference: test/OptTests/basic_socp.jl:71-83
    P, q, A, b, cones = basic_socp_data()
    b = b.copy()
    b[6] = -10.0
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.PRIMAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_basic_socp_large_cone():
    """Single large SOC (the reference's sparse-expansion coverage case
    maps to our ordinary dense-Hs path at larger dim)."""
    rng = np.random.default_rng(2)
    n = 12
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.3 * np.eye(n)
    q = rng.standard_normal(n)
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([[2.0], np.zeros(n)])
    from clarabel_tpu import SecondOrderConeT

    sol = Solver(P, q, A, b, [SecondOrderConeT(n + 1)]).solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
