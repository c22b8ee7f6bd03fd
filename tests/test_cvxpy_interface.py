"""CVXPY adapter tests (analogue of the reference's MOI conformance tier,
reference: test/Interfaces/MOI_wrapper_tests.jl).  Skipped when cvxpy is
not installed (optional dependency)."""

import numpy as np
import pytest

cp = pytest.importorskip("cvxpy")

from clarabel_tpu.interop.cvxpy_interface import ClarabelTPU


def test_cvxpy_lp():
    x = cp.Variable(2)
    prob = cp.Problem(
        cp.Minimize(x[0] + x[1]),
        [x[0] + 2 * x[1] >= 1, x >= 0],
    )
    prob.solve(solver=ClarabelTPU())
    assert prob.status == cp.OPTIMAL
    assert abs(prob.value - 0.5) < 1e-6


def test_cvxpy_socp():
    x = cp.Variable(3)
    prob = cp.Problem(
        cp.Minimize(cp.norm(x - np.array([1.0, 2.0, 3.0]))),
        [cp.sum(x) == 1],
    )
    prob.solve(solver=ClarabelTPU())
    assert prob.status == cp.OPTIMAL


def test_cvxpy_infeasible():
    x = cp.Variable(1)
    prob = cp.Problem(cp.Minimize(x[0]), [x[0] >= 1, x[0] <= 0])
    prob.solve(solver=ClarabelTPU())
    assert prob.status in (cp.INFEASIBLE, cp.INFEASIBLE_INACCURATE)
