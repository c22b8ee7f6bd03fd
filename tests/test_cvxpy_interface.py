"""CVXPY adapter tests (analogue of the reference's MOI conformance tier,
reference: test/Interfaces/MOI_wrapper_tests.jl).

Two tiers:
* the adapter's pure DATA PATH (cone mapping, settings merge, conic
  solve, status mapping, solution recovery) runs WITHOUT cvxpy against
  hand-built fixtures — this is what executes in CI images where cvxpy
  is not installed (VERDICT r2 #7);
* live end-to-end tests through cvxpy Problems importorskip cvxpy.
"""

import numpy as np
import pytest

from clarabel_tpu import (
    Settings, SolverStatus,
    ZeroConeT, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
    ExponentialConeT, PowerConeT, GenPowerConeT,
)
from clarabel_tpu.interop import cvxpy_interface as ci


# ---------------------------------------------------------------------------
# pure data path (no cvxpy required)
# ---------------------------------------------------------------------------

def test_cones_from_dims_order_and_types():
    cones = ci.cones_from_dims({
        "z": 2, "l": 3, "q": [3, 4], "s": [2], "ep": 2,
        "p3d": [0.3], "pnd": [np.array([0.2, 0.8])],
    })
    kinds = [type(c) for c in cones]
    assert kinds == [ZeroConeT, NonnegativeConeT, SecondOrderConeT,
                     SecondOrderConeT, PSDTriangleConeT,
                     ExponentialConeT, ExponentialConeT, PowerConeT,
                     GenPowerConeT]
    assert cones[0].dim == 2 and cones[1].dim == 3
    assert cones[2].dim == 3 and cones[3].dim == 4
    assert cones[4].dim == 2
    assert cones[7].alpha == pytest.approx(0.3)
    np.testing.assert_allclose(cones[8].alpha, [0.2, 0.8])
    assert cones[8].dim2 == 1
    # missing keys default to empty
    assert ci.cones_from_dims({"l": 1})[0].dim == 1


def test_resolve_settings_merge_precedence():
    base = Settings(max_iter=77)
    st = ci.resolve_settings(base, {"max_iter": 55, "not_a_field": 1},
                             {"max_iter": 33}, verbose=False)
    assert st.max_iter == 33          # solver_opts beat ctor overrides
    assert st.verbose is False
    st2 = ci.resolve_settings(None, {}, {"verbose": True}, verbose=False)
    assert st2.verbose is True        # explicit opts beat the flag
    st3 = ci.resolve_settings(None, {}, None, verbose=True)
    assert st3.verbose is True


def test_status_map_strings():
    assert ci.map_status(SolverStatus.SOLVED) == "optimal"
    assert ci.map_status(SolverStatus.ALMOST_SOLVED) == \
        "optimal_inaccurate"
    assert ci.map_status(SolverStatus.PRIMAL_INFEASIBLE) == "infeasible"
    assert ci.map_status(SolverStatus.DUAL_INFEASIBLE) == "unbounded"
    assert ci.map_status(SolverStatus.MAX_ITERATIONS) == "user_limit"
    assert ci.map_status(SolverStatus.NUMERICAL_ERROR) == "solver_error"


def test_solve_conic_data_lp_and_recovery():
    """min x0 + x1 s.t. x0 + 2 x1 >= 1, x >= 0 in cvxpy standard form
    (Ax + s = b, s in K): rows are -x0 - 2 x1 + s = -1, -x + s = 0."""
    A = np.array([[-1.0, -2.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([-1.0, 0.0, 0.0])
    c = np.array([1.0, 1.0])
    sol = ci.solve_conic_data(A, b, c, None, {"l": 3})
    assert sol.status == SolverStatus.SOLVED
    status, opt_val, x, z, attr = ci.solution_to_parts(sol, offset=1.5)
    assert status == "optimal"
    assert opt_val == pytest.approx(0.5 + 1.5, abs=1e-7)
    assert x[1] == pytest.approx(0.5, abs=1e-7)
    # dual recovery: z1 is the multiplier of the binding row (value 0.5)
    assert z[0] == pytest.approx(0.5, abs=1e-6)
    assert attr["num_iters"] >= 1 and attr["solve_time"] > 0


def test_solve_conic_data_socp_with_zero_cone():
    """min ||x - p|| s.t. sum x = 1 — epigraph form with t variable:
    vars (x0,x1,x2,t), zero row sum x = 1, SOC rows (t, x - p)."""
    p = np.array([1.0, 2.0, 3.0])
    A = np.zeros((5, 4))
    b = np.zeros(5)
    A[0, :3] = 1.0
    b[0] = 1.0                      # sum x + 0 = 1  (zero cone)
    A[1, 3] = -1.0                  # s0 = t
    A[2:, :3] = -np.eye(3)
    b[2:] = -p                      # s_tail = x - p
    c = np.array([0.0, 0.0, 0.0, 1.0])
    sol = ci.solve_conic_data(A, b, c, None, {"z": 1, "q": [4]})
    assert sol.status == SolverStatus.SOLVED
    # analytic: distance from p to {sum x = 1} is |sum p - 1|/sqrt(3)
    d = abs(p.sum() - 1.0) / np.sqrt(3.0)
    assert sol.obj_val == pytest.approx(d, abs=1e-6)


def test_solve_conic_data_infeasible_to_parts():
    A = np.array([[-1.0], [1.0]])
    b = np.array([-1.0, 0.0])       # x >= 1 and x <= 0
    c = np.array([1.0])
    sol = ci.solve_conic_data(A, b, c, None, {"l": 2})
    status, opt_val, x, z, attr = ci.solution_to_parts(sol, offset=0.0)
    assert status in ("infeasible", "infeasible_inaccurate")
    assert opt_val is None and x is None and z is None
    assert "solver_specific_stats" in attr


def test_solve_conic_data_quad_obj_and_settings():
    """P != None exercises supports_quad_obj's claim: the quadratic
    stays native (no epigraph)."""
    P = np.array([[2.0, 0.0], [0.0, 2.0]])
    A = -np.eye(2)
    b = np.zeros(2)
    c = np.array([-2.0, -4.0])
    sol = ci.solve_conic_data(A, b, c, P, {"l": 2},
                              solver_opts={"max_iter": 60})
    assert sol.status == SolverStatus.SOLVED
    np.testing.assert_allclose(sol.x, [1.0, 2.0], atol=1e-7)


# ---------------------------------------------------------------------------
# live cvxpy tier (optional dependency)
# ---------------------------------------------------------------------------

def _cvxpy():
    return pytest.importorskip("cvxpy")


def test_cvxpy_lp():
    cp = _cvxpy()
    from clarabel_tpu.interop.cvxpy_interface import ClarabelTPU

    x = cp.Variable(2)
    prob = cp.Problem(
        cp.Minimize(x[0] + x[1]),
        [x[0] + 2 * x[1] >= 1, x >= 0],
    )
    prob.solve(solver=ClarabelTPU())
    assert prob.status == cp.OPTIMAL
    assert abs(prob.value - 0.5) < 1e-6


def test_cvxpy_socp():
    cp = _cvxpy()
    from clarabel_tpu.interop.cvxpy_interface import ClarabelTPU

    x = cp.Variable(3)
    prob = cp.Problem(
        cp.Minimize(cp.norm(x - np.array([1.0, 2.0, 3.0]))),
        [cp.sum(x) == 1],
    )
    prob.solve(solver=ClarabelTPU())
    assert prob.status == cp.OPTIMAL


def test_cvxpy_infeasible():
    cp = _cvxpy()
    from clarabel_tpu.interop.cvxpy_interface import ClarabelTPU

    x = cp.Variable(1)
    prob = cp.Problem(cp.Minimize(x[0]), [x[0] >= 1, x[0] <= 0])
    prob.solve(solver=ClarabelTPU())
    assert prob.status in (cp.INFEASIBLE, cp.INFEASIBLE_INACCURATE)
