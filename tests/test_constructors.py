"""Constructor and input-validation tests.

Mirrors the reference's constructor suite
(reference: test/UnitTests/test_constructors.jl:1-60) plus the setup-time
dimension checks (reference: src/solver.jl:157-169).
"""

import numpy as np
import pytest

from clarabel_tpu import (
    NonnegativeConeT,
    Settings,
    Solver,
    SolverStatus,
    ZeroConeT,
)
from tests.fixtures import basic_qp_data


def test_solver_no_args_then_setup():
    # reference: Clarabel.Solver() with deferred setup!
    s = Solver()
    with pytest.raises(RuntimeError):
        s.solve()
    P, q, A, b, cones = basic_qp_data()
    s.setup(P, q, A, b, cones)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED


def test_settings_construction_forms():
    # struct / kwargs / dict forms (reference: test_constructors.jl:12-27)
    assert Settings().verbose is False
    assert Settings(verbose=True).verbose is True
    assert Settings.from_dict({"verbose": True}).verbose is True
    s = Solver(settings=Settings(verbose=False))
    assert s.settings.verbose is False
    # kwargs override a provided struct at construction
    s = Solver(settings=Settings(), max_iter=7)
    assert s.settings.max_iter == 7


def test_settings_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown settings"):
        Settings.from_dict({"not_a_real_setting": 1})


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_float_type_parametrization(dtype):
    # reference parametrizes over Float32/Float64/BigFloat
    # (test_constructors.jl:6); here dtype is a Settings field
    P, q, A, b, cones = basic_qp_data()
    tol = 1e-4 if dtype == "float32" else 1e-8
    settings = Settings(dtype=dtype, tol_gap_abs=tol, tol_gap_rel=tol,
                        tol_feas=tol)
    sol = Solver(P, q, A, b, cones, settings).solve()
    assert sol.status in (SolverStatus.SOLVED, SolverStatus.ALMOST_SOLVED)
    assert np.allclose(np.asarray(sol.x), [0.3, 0.7], atol=100 * tol)


def test_dimension_mismatch_A_b():
    P, q, A, b, cones = basic_qp_data()
    with pytest.raises(ValueError):
        Solver(P, q, A, b[:-1], cones)  # b too short
    with pytest.raises(ValueError):
        Solver(P, q, A[:, :-1], b, cones)  # A cols != len(q)


def test_dimension_mismatch_P():
    P, q, A, b, cones = basic_qp_data()
    with pytest.raises(ValueError):
        Solver(P[:, :-1], q, A, b, cones)  # P not square
    with pytest.raises(ValueError):
        Solver(np.zeros((3, 3)), q, A, b, cones)  # P wrong size


def test_cone_dimension_mismatch():
    P, q, A, b, _ = basic_qp_data()
    with pytest.raises(ValueError):
        Solver(P, q, A, b, [NonnegativeConeT(3), ZeroConeT(2)])  # 5 != 6
    with pytest.raises(ValueError):
        Solver(P, q, A, b, [NonnegativeConeT(7)])
