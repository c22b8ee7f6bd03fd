"""Stall detection at the accuracy floor (docs/DEVIATIONS.md #11).

A problem whose feasibility tolerance is unreachable converges in gap and
κ/τ but stalls in feasibility at the floating-point floor.  The relaxed
stall check (stall_detection_ratio < 1) must terminate it promptly as
ALMOST_SOLVED; the strict reference semantics (ratio = 1.0) must never
terminate sooner than the relaxed check.
"""

import numpy as np

from clarabel_tpu import Settings, Solver, SolverStatus
from tests.fixtures import basic_qp_data


def _solve_unreachable_feas(**kw):
    P, q, A, b, cones = basic_qp_data()
    settings = Settings(tol_feas=1e-300, max_iter=120, **kw)
    s = Solver(P, q, A, b, cones, settings)
    sol = s.solve()
    return sol


def test_stalled_lane_terminates_almost():
    sol = _solve_unreachable_feas()
    # reduced tolerances (feas 1e-4) are easily met -> ALMOST_SOLVED
    assert sol.status == SolverStatus.ALMOST_SOLVED
    # the solution itself is solved-quality
    assert np.allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-6)
    # and the stall fired long before the iteration cap
    assert sol.iterations < 60


def test_strict_ratio_is_reference_semantics():
    relaxed = _solve_unreachable_feas()
    strict = _solve_unreachable_feas(stall_detection_ratio=1.0)
    # strict (reference) detection can only fire later or equal
    assert strict.iterations >= relaxed.iterations
    assert strict.status in (
        SolverStatus.ALMOST_SOLVED,
        SolverStatus.MAX_ITERATIONS,
        SolverStatus.INSUFFICIENT_PROGRESS,
    )


def test_converging_solve_unaffected():
    # a normal solve must not trip the relaxed check: same status and
    # iteration count as strict detection
    P, q, A, b, cones = basic_qp_data()
    a = Solver(P, q, A, b, cones, Settings()).solve()
    b_ = Solver(P, q, A, b, cones,
                Settings(stall_detection_ratio=1.0)).solve()
    assert a.status == SolverStatus.SOLVED
    assert b_.status == SolverStatus.SOLVED
    assert a.iterations == b_.iterations
