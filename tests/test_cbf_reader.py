"""CBF reader: parse CBLIB-format conic problems and solve them."""

import numpy as np
import pytest

from clarabel_tpu import Solver, SolverStatus
from clarabel_tpu.io.cbf import load_cbf

CBF_SOCP = """\
# min x0 + x1 s.t. (2, x0, x1) in Q, x free
VER
3
OBJSENSE
MIN
VAR
2 1
F 2
CON
3 1
Q 3
OBJACOORD
2
0 1.0
1 1.0
ACOORD
2
1 0 1.0
2 1 1.0
BCOORD
1
0 2.0
"""


def test_cbf_socp():
    prob = load_cbf(CBF_SOCP)
    assert prob.n == 2 and prob.m == 3
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # min x0+x1 with ||(x0,x1)|| <= 2: optimum at (-sqrt2, -sqrt2)
    assert abs(sol.obj_val - (-2 * np.sqrt(2))) < 1e-6


CBF_EXP = """\
# max x2 s.t. (x0,x1,x2) in CBF-EXP (x0 >= x1 e^{x2/x1}), x0 <= e, x1 = 1
VER
2
OBJSENSE
MAX
VAR
3 1
EXP 3
CON
2 1
L= 2
OBJACOORD
1
2 1.0
ACOORD
2
0 0 1.0
1 1 1.0
BCOORD
2
0 -2.718281828459045
1 -1.0
"""


def test_cbf_exp_reversed_triple():
    prob = load_cbf(CBF_EXP)
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # max x2 = ln(x0) with x0 = e -> 1   (obj folded for MAX: q = -c)
    x2 = sol.x[2]
    assert abs(x2 - 1.0) < 1e-6


CBF_QR = """\
# min u + v s.t. (u, v, 1) in rotated SOC (2uv >= 1), u,v >= 0
VER
1
VAR
2 1
F 2
CON
5 2
QR 3
L+ 2
OBJACOORD
2
0 1.0
1 1.0
ACOORD
4
0 0 1.0
1 1 1.0
3 0 1.0
4 1 1.0
BCOORD
1
2 1.0
"""


def test_cbf_rotated_soc():
    prob = load_cbf(CBF_QR)
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # min u+v s.t. 2uv >= 1: u = v = 1/sqrt(2), obj = sqrt(2)
    assert abs(sol.obj_val - np.sqrt(2)) < 1e-6


CBF_POW = """\
VER
3
POWCONES
1 2
2
0.6
0.4
VAR
3 1
@0:POW 3
CON
2 1
L= 2
OBJACOORD
1
2 -1.0
ACOORD
2
0 0 1.0
1 1 1.0
BCOORD
2
0 -2.0
1 -1.0
"""


def test_cbf_power_cone():
    prob = load_cbf(CBF_POW)
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # max x3 s.t. x1=2, x2=1, x1^0.6 x2^0.4 >= |x3|: x3 = 2^0.6
    assert abs(sol.x[2] - 2 ** 0.6) < 1e-6


def test_cbf_psd_raises():
    with pytest.raises(NotImplementedError):
        load_cbf("VER\n1\nPSDVAR\n1\n3\n")
