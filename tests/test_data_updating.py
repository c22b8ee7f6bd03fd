"""Data updating tests (reference: test/OptTests/data_updating.jl)."""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus, NonnegativeConeT

from fixtures import basic_qp_data


def _updating_settings():
    # presolve must be off for updates (reference requires it inactive)
    return Settings(presolve_enable=False)


def test_update_b_resolve():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    sol1 = s.solve()
    assert sol1.status == SolverStatus.SOLVED

    # update b and check against a freshly built solver
    b2 = b * 0.9
    s.update_b(b2)
    sol2 = s.solve()
    fresh = Solver(P, q, A, b2, cones, _updating_settings()).solve()
    assert sol2.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol2.x - fresh.x) < 1e-8
    assert abs(sol2.obj_val - fresh.obj_val) < 1e-8


def test_update_q_and_P_resolve():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()

    q2 = q + np.array([0.5, -0.2])
    P2 = P * 2.0
    s.update_data(P=P2, q=q2)
    sol = s.solve()
    fresh = Solver(P2, q2, A, b, cones, _updating_settings()).solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8


def test_update_partial_indices():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()

    s.update_b(([0], [-0.9]))
    b2 = b.copy()
    b2[0] = -0.9
    fresh = Solver(P, q, A, b2, cones, _updating_settings()).solve()
    sol = s.solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8


def test_update_rejected_with_presolve():
    P, q, A, b, cones = basic_qp_data()
    b = b.copy()
    b[1] = 1e25  # triggers presolve row elimination
    s = Solver(P, q, A, b, cones, Settings(presolve_enable=True))
    assert s.presolver is not None
    assert not s.is_data_update_allowed()
    with pytest.raises(ValueError, match="presolver"):
        s.update_b(np.zeros(s.presolver.m_full))


def test_update_dimension_mismatch():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    with pytest.raises(ValueError):
        s.update_q(np.zeros(5))
    with pytest.raises(ValueError):
        s.update_A(np.zeros((2, 2)))
