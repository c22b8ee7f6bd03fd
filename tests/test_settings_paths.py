"""Settings-path coverage: each toggleable subsystem disabled/stressed."""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus

from fixtures import basic_qp_data, basic_socp_data


def test_equilibration_disabled():
    P, q, A, b, cones = basic_socp_data()
    sol = Solver(P, q, A, b, cones, Settings(equilibrate_enable=False)).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - (-0.8459)) < 1e-4


def test_iterative_refinement_disabled():
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(
        P, q, A, b, cones, Settings(iterative_refinement_enable=False)
    ).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - 1.88) < 1e-5


def test_static_regularization_disabled():
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(
        P, q, A, b, cones, Settings(static_regularization_enable=False)
    ).solve()
    assert sol.status == SolverStatus.SOLVED


def test_dynamic_regularization_disabled():
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(
        P, q, A, b, cones, Settings(dynamic_regularization_enable=False)
    ).solve()
    assert sol.status == SolverStatus.SOLVED


def test_max_iter_cap_gives_almost_or_limit():
    P, q, A, b, cones = basic_qp_data()
    sol = Solver(P, q, A, b, cones, Settings(max_iter=2)).solve()
    # terminated by the cap; "almost" post-check may upgrade the status
    assert sol.status in (
        SolverStatus.MAX_ITERATIONS,
        SolverStatus.ALMOST_SOLVED,
    )
    assert sol.iterations <= 2


def test_presolve_disabled_keeps_rows():
    """With presolve off, no reduction happens even for loose bounds.
    (A truly near-infinite bound without presolve is numerically hostile
    by design — that is exactly the case presolve exists for.)"""
    P, q, A, b, cones = basic_qp_data()
    b = b.copy()
    b[1] = 1e7  # loose but solvable without reduction
    s = Solver(P, q, A, b, cones, Settings(presolve_enable=False))
    assert s.presolver is None
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    assert len(sol.s) == len(b)

    # the same bound at presolve's threshold gets reduced when enabled
    b2 = b.copy()
    b2[1] = 1e25
    s2 = Solver(P, q, A, b2, cones, Settings(presolve_enable=True))
    assert s2.presolver is not None
    sol2 = s2.solve()
    assert sol2.status == SolverStatus.SOLVED
