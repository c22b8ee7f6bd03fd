"""Equality-constrained tests (reference: test/OptTests/basic_eq_constrained.jl)
plus the QP dual-infeasible non-QSD-KKT edge case
(reference: test/OptTests/basic_qp.jl:104-117)."""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus, ZeroConeT, NonnegativeConeT


def test_eq_constrained():
    # reference: basic_eq_constrained.jl:15-29
    P = np.eye(3)
    q = np.zeros(3)
    A = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b = np.array([2.0, 0.0])
    sol = Solver(P, q, A, b, [ZeroConeT(2)]).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.0, 1.0, 1.0])) < 1e-6


def test_eq_constrained_2():
    # reference: basic_eq_constrained.jl:31-46
    P = np.eye(3)
    q = np.array([1.0, 2.0, 3.0])
    A = np.array([[1.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b = np.array([2.0, 0.0])
    sol = Solver(P, q, A, b, [ZeroConeT(2)]).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([10.0, 1.0, 1.0]) / 6) < 1e-6


def test_eq_constrained_redundant_rows():
    # reference: basic_eq_constrained.jl:48-66 — duplicated equality rows
    # make the KKT rank-deficient; regularization must cope
    P = np.eye(3)
    q = np.zeros(3)
    A0 = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    b0 = np.array([2.0, 0.0])
    A = np.vstack([A0, A0])
    b = np.concatenate([b0, b0])
    sol = Solver(P, q, A, b, [ZeroConeT(2), ZeroConeT(2)]).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - np.array([0.0, 1.0, 1.0])) < 1e-6


def test_eq_constrained_primal_infeasible():
    # reference: basic_eq_constrained.jl:68-86
    P = np.eye(3)
    q = np.zeros(3)
    A = np.array([
        [0.0, 1.0, 1.0],
        [0.0, 1.0, -1.0],
        [1.0, 2.0, -1.0],
        [2.0, -1.0, 3.0],
    ])
    b = np.ones(4)
    sol = Solver(P, q, A, b, [ZeroConeT(4)]).solve()
    assert sol.status == SolverStatus.PRIMAL_INFEASIBLE


def test_qp_dual_infeasible_non_qsd():
    # reference: basic_qp.jl:104-117 — single-row A makes the KKT not
    # strictly quasidefinite without regularization
    P = np.array([[1.0, 1.0], [1.0, 1.0]])
    q = np.array([1.0, -1.0])
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])
    sol = Solver(P, q, A, b, [NonnegativeConeT(1)]).solve()
    assert sol.status == SolverStatus.DUAL_INFEASIBLE
    assert np.isnan(sol.obj_val)
