"""QPS reader: parse Maros–Mészáros-format QP files into conic form.

Cross-checked by entering the same problem directly through the API and
comparing solutions (reference analogue: the external MPS harness used
for the paper's Maros–Mészáros results, README.md:62-72).
"""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus
from clarabel_tpu.io.qps import load_qps

QPS_TEXT = """\
* toy QP:  min 1/2 (x1^2 + 2 x2^2 + x1 x2) + x1 - x2
NAME          TOYQP
ROWS
 N  obj
 E  c1
 L  c2
 G  c3
COLUMNS
    x1        obj       1.0    c1   1.0
    x1        c2        1.0    c3   1.0
    x2        obj      -1.0    c1   1.0
    x2        c2        2.0
RHS
    rhs       c1        1.0    c2   1.5
    rhs       c3        0.2
BOUNDS
 UP bnd       x1        0.9
QUADOBJ
    x1        x1        1.0
    x1        x2        0.5
    x2        x2        2.0
ENDATA
"""


def _direct_problem():
    """The same toy QP entered directly."""
    from clarabel_tpu import ZeroConeT, NonnegativeConeT

    P = np.array([[1.0, 0.5], [0.5, 2.0]])
    q = np.array([1.0, -1.0])
    # eq: x1 + x2 = 1; ineqs: x1+2x2 <= 1.5, -(x1) <= -0.2, x1 <= 0.9,
    # default bounds x >= 0
    A = np.array([
        [1.0, 1.0],     # E
        [1.0, 2.0],     # L
        [-1.0, 0.0],    # G -> -a'x <= -lo
        [1.0, 0.0],     # x1 <= 0.9
        [-1.0, 0.0],    # x1 >= 0
        [0.0, -1.0],    # x2 >= 0
    ])
    b = np.array([1.0, 1.5, -0.2, 0.9, 0.0, 0.0])
    return P, q, A, b, [ZeroConeT(1), NonnegativeConeT(5)]


def test_qps_parse_and_solve():
    prob = load_qps(QPS_TEXT)
    assert prob.name == "TOYQP"
    assert prob.n == 2
    P, q, A, b, cones = _direct_problem()
    np.testing.assert_allclose(prob.P.toarray(), P)
    np.testing.assert_allclose(prob.q, q)

    sol_qps = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                     prob.cones).solve()
    sol_dir = Solver(P, q, A, b, cones).solve()
    assert sol_qps.status == SolverStatus.SOLVED == sol_dir.status
    assert abs(sol_qps.obj_val - sol_dir.obj_val) < 1e-8
    assert np.linalg.norm(np.sort(sol_qps.x) - np.sort(sol_dir.x)) < 1e-7


def test_qps_ranges_and_free_vars():
    text = """\
NAME RNG
ROWS
 N obj
 L r1
COLUMNS
    x  obj  1.0  r1  1.0
    y  obj  1.0  r1  1.0
RHS
    rhs r1 4.0
RANGES
    rng r1 1.0
BOUNDS
 FR bnd x
 LO bnd y -2.0
ENDATA
"""
    prob = load_qps(text)
    # r1 becomes the interval 3 <= x+y <= 4 (two nonneg rows); free x adds
    # no bound rows; y >= -2 adds one
    assert prob.m == 3
    sol = Solver(prob.P.toarray() + 1e-9 * np.eye(2), prob.q,
                 prob.A.toarray(), prob.b, prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # min x + y on that box: x + y = 3 active, y can sit at -2
    assert abs((sol.x[0] + sol.x[1]) - 3.0) < 1e-6


def test_qps_qmatrix_and_maximize():
    text = """\
NAME QM
OBJSENSE
    MAX
ROWS
 N obj
 L r1
COLUMNS
    x  obj  1.0  r1  1.0
RHS
    rhs r1 2.0
QMATRIX
    x  x  -2.0
ENDATA
"""
    prob = load_qps(text)
    # max -x^2 + x  ==  min x^2 - x; optimum x = 0.5
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.x[0] - 0.5) < 1e-6


def test_vendored_benchmark_instances():
    """The named Maros–Mészáros-style instances (benchmarks/data) load
    through the reader and solve to 1e-8 with pinned objectives."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks import qps_instances

    qps_instances.write_all()
    expected_obj = {
        "CVXQP1-style": 3.773826e+01,
        "CVXQP2-style": 2.110229e+01,
        "CVXQP3-style": 4.615342e+01,
        "AUG2DC-style": -2.685549e-01,
    }
    for fname in sorted(qps_instances.INSTANCES):
        prob = load_qps(os.path.join(qps_instances.DATA_DIR, fname))
        sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                     prob.cones).solve()
        assert sol.status == SolverStatus.SOLVED, (fname, sol.status)
        assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
        assert abs(sol.obj_val - expected_obj[prob.name]) < 1e-4, (
            prob.name, sol.obj_val
        )


def test_cli_entry_point(capsys):
    """python -m clarabel_tpu file.qps solves and reports."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks import qps_instances
    from clarabel_tpu.__main__ import main

    qps_instances.write_all()
    path = os.path.join(qps_instances.DATA_DIR, "CVXQP1_style.qps")
    rc = main([path, "--quiet"])
    out = capsys.readouterr().out
    assert rc == 0 and "status=SOLVED" in out
