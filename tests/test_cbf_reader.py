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


CBF_PSDVAR = """\
# min <C, X> s.t. diag(X) = 1, X psd (3x3)
VER
2
PSDVAR
1
3
CON
3 1
L= 3
OBJFCOORD
4
0 0 0 1.0
0 1 0 -0.5
0 2 1 0.25
0 2 2 2.0
FCOORD
3
0 0 0 0 1.0
1 0 1 1 1.0
2 0 2 2 1.0
BCOORD
3
0 -1.0
1 -1.0
2 -1.0
"""


def test_cbf_psdvar():
    from clarabel_tpu import ZeroConeT, PSDTriangleConeT

    prob = load_cbf(CBF_PSDVAR)
    assert prob.n == 6  # svec of a 3x3 block
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    # cross-check against the same SDP entered directly
    C = np.array([[1.0, -0.5, 0.0], [-0.5, 0.0, 0.25], [0.0, 0.25, 2.0]])
    sv = np.sqrt(2.0)

    def svec(M):
        return np.asarray([M[i, j] * (1.0 if i == j else sv)
                           for j in range(3) for i in range(j + 1)])

    q = svec(C)
    Aeq = np.zeros((3, 6))
    for r, k in enumerate([0, 2, 5]):
        Aeq[r, k] = 1.0
    A = np.vstack([Aeq, -np.eye(6)])
    b = np.concatenate([np.ones(3), np.zeros(6)])
    ref = Solver(np.zeros((6, 6)), q, A, b,
                 [ZeroConeT(3), PSDTriangleConeT(3)]).solve()
    assert ref.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - ref.obj_val) < 1e-7


CBF_PSDCON = """\
# min x s.t. [[x, 1], [1, x]] psd  ->  x* = 1
VER
2
VAR
1 1
F 1
PSDCON
1
2
OBJACOORD
1
0 1.0
HCOORD
2
0 0 0 0 1.0
0 0 1 1 1.0
DCOORD
1
0 1 0 1.0
"""


def test_cbf_psdcon():
    prob = load_cbf(CBF_PSDCON)
    sol = Solver(prob.P.toarray(), prob.q, prob.A.toarray(), prob.b,
                 prob.cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.x[0] - 1.0) < 1e-6
