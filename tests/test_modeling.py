"""ProblemBuilder (modeling layer) tests."""

import numpy as np

from clarabel_tpu import SolverStatus, Settings
from clarabel_tpu.modeling import ProblemBuilder


def test_builder_qp_box():
    # min ½||x||² + q'x  s.t. sum x = 1, 0 <= x <= 0.6
    n = 4
    q = np.array([-1.0, -2.0, 0.5, 0.0])
    pb = (
        ProblemBuilder(n)
        .minimize(P=np.eye(n), q=q)
        .add_equality(np.ones((1, n)), [1.0])
        .add_bound_box(lb=0.0, ub=0.6)
    )
    sol = pb.solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.x.sum() - 1.0) < 1e-8
    assert sol.x.min() > -1e-9 and sol.x.max() < 0.6 + 1e-9


def test_builder_soc_norm_constraint():
    # min c'x s.t. ||x|| <= 1  (via (1, x) in SOC)
    n = 3
    c = np.array([1.0, -2.0, 2.0])
    C = np.vstack([np.zeros((1, n)), np.eye(n)])
    d = np.zeros(n + 1)
    d[0] = 1.0
    sol = ProblemBuilder(n).minimize(q=c).add_soc(C, d).solve()
    assert sol.status == SolverStatus.SOLVED
    expect = -c / np.linalg.norm(c)
    assert np.linalg.norm(sol.x - expect) < 1e-6


def test_builder_psd_block():
    # min tr(X) s.t. X - I ⪰ 0 for 2x2 X parametrized by svec entries
    t = 3  # svec dim of 2x2
    C = np.eye(t)
    d = -np.array([1.0, 0.0, 1.0])  # svec(-I)
    q = np.array([1.0, 0.0, 1.0])   # trace in svec coords
    sol = ProblemBuilder(t).minimize(q=q).add_psd(C, d).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - 2.0) < 1e-6  # X = I is optimal


def test_builder_validation():
    import pytest

    pb = ProblemBuilder(3)
    with pytest.raises(ValueError):
        pb.add_equality(np.ones((2, 2)), [1.0, 2.0])
    with pytest.raises(ValueError):
        pb.minimize(P=np.eye(2))
    with pytest.raises(ValueError):
        pb.add_psd(np.zeros((4, 3)), np.zeros(4))  # 4 not triangular
