"""Conformance battery: every cone pair × objective type, plus
infeasibility certificates, verified against an independent NumPy KKT
oracle (conic_check.py).

Role analogue of the reference's full MOI.Test conformance run
(reference: test/Interfaces/MOI_wrapper_tests.jl:17-88, atol/rtol 1e-4);
here the oracle is the mathematical optimality conditions themselves at
1e-6, which is stronger than solver-vs-solver comparison and needs no
external solver.
"""

import itertools

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus
from clarabel_tpu.cones.api import (
    ZeroConeT, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
    ExponentialConeT, PowerConeT, GenPowerConeT, nvars,
)

from conic_check import (
    check_kkt, interior_point, interior_dual_point,
)

# one representative of every cone family, kept tiny so each layout's
# compile stays cheap
CONE_MENU = {
    "zero": lambda: ZeroConeT(2),
    "nn": lambda: NonnegativeConeT(3),
    "soc": lambda: SecondOrderConeT(3),
    "psd": lambda: PSDTriangleConeT(2),
    "exp": lambda: ExponentialConeT(),
    "pow": lambda: PowerConeT(0.6),
    "genpow": lambda: GenPowerConeT([0.3, 0.7], 2),
}

PAIRS = list(itertools.combinations_with_replacement(sorted(CONE_MENU), 2))


def make_feasible_problem(cones, rng, quad: bool):
    """Construct a problem guaranteed solvable: b = A x0 + s0 with s0
    interior-primal, q = -(P x0 + Aᵀ z0) with z0 interior-dual, so both
    the primal and dual are strictly feasible (strong duality holds and
    the IPM must find the optimum)."""
    m = sum(nvars(c) for c in cones)
    n = max(3, m // 2)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    if quad:
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        P = F @ F.T + 0.1 * np.eye(n)
    else:
        P = np.zeros((n, n))
    x0 = rng.standard_normal(n) * 0.3
    s0 = np.concatenate([interior_point(c, rng) for c in cones])
    z0 = np.concatenate([interior_dual_point(c, rng) for c in cones])
    b = A @ x0 + s0
    q = -(P @ x0 + A.T @ z0)
    return P, q, A, b


@pytest.mark.parametrize("quad", [False, True], ids=["lp-obj", "qp-obj"])
@pytest.mark.parametrize("pair", PAIRS, ids=["+".join(p) for p in PAIRS])
def test_cone_pair(pair, quad):
    rng = np.random.default_rng(hash(pair) % 2 ** 31 + quad)
    cones = [CONE_MENU[pair[0]](), CONE_MENU[pair[1]]()]
    P, q, A, b = make_feasible_problem(cones, rng, quad)
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status in (SolverStatus.SOLVED, SolverStatus.ALMOST_SOLVED), \
        f"{pair}: {sol.status}"
    tol = 1e-6 if sol.status == SolverStatus.SOLVED else 1e-3
    check_kkt(P, q, A, b, cones, sol, tol=tol)


@pytest.mark.parametrize("fam", sorted(set(CONE_MENU) - {"zero"}))
def test_primal_infeasible_certificate(fam):
    """Append contradictory halfspaces; expect PRIMAL_INFEASIBLE with a
    Farkas certificate: Aᵀz ≈ 0, z ∈ K*, bᵀz < 0."""
    rng = np.random.default_rng(42)
    cones = [CONE_MENU[fam]()]
    P, q, A, b = make_feasible_problem(cones, rng, quad=False)
    n = A.shape[1]
    a = rng.standard_normal(n)
    A2 = np.vstack([A, a, -a])
    b2 = np.concatenate([b, [0.0], [-1.0]])   # a'x <= 0 and a'x >= 1
    cones2 = cones + [NonnegativeConeT(2)]
    sol = Solver(P, q, A2, b2, cones2).solve()
    assert sol.status in (SolverStatus.PRIMAL_INFEASIBLE,
                          SolverStatus.ALMOST_PRIMAL_INFEASIBLE), sol.status
    z = sol.z
    # certificate scaling is arbitrary; normalize
    zn = z / max(np.linalg.norm(z), 1e-300)
    assert np.linalg.norm(A2.T @ zn) < 1e-5
    assert float(b2 @ zn) < 0
    from conic_check import dual_margin
    ofs = 0
    for cone in cones2:
        d = nvars(cone)
        assert dual_margin(cone, zn[ofs:ofs + d]) > -1e-6
        ofs += d


def test_dual_infeasible_certificate():
    """Unbounded LP: certificate x with Px=0, Ax+s=0 (s∈K), q'x < 0."""
    n = 3
    P = np.zeros((n, n))
    q = np.array([-1.0, 0.0, 0.0])
    A = -np.eye(n)
    b = np.zeros(n)
    cones = [NonnegativeConeT(n)]
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status in (SolverStatus.DUAL_INFEASIBLE,
                          SolverStatus.ALMOST_DUAL_INFEASIBLE)
    xn = sol.x / max(np.linalg.norm(sol.x), 1e-300)
    assert float(q @ xn) < 0
    assert np.min(-(A @ xn)) > -1e-8  # direction keeps s in the cone


def test_three_cone_mix():
    """One problem spanning four cone families at once."""
    rng = np.random.default_rng(0)
    cones = [ZeroConeT(2), NonnegativeConeT(3), SecondOrderConeT(3),
             ExponentialConeT()]
    P, q, A, b = make_feasible_problem(cones, rng, quad=True)
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    check_kkt(P, q, A, b, cones, sol, tol=1e-6)
