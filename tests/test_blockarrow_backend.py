"""In-loop block-arrow KKT backend: structure detection + solution parity."""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus, ZeroConeT, NonnegativeConeT


def banded_qp(grid=14, seed=0):
    """Banded (1-d chain) QP: block-arrow friendly structure."""
    rng = np.random.default_rng(seed)
    n = 2 * grid
    P = np.zeros((n, n))
    for i in range(n):
        P[i, i] = rng.uniform(1.0, 3.0)
        if i + 1 < n:
            v = rng.uniform(-0.4, 0.4)
            P[i, i + 1] = v
            P[i + 1, i] = v
    q = rng.standard_normal(n)
    # chain equalities coupling neighbors
    m_eq = grid
    Aeq = np.zeros((m_eq, n))
    for i in range(m_eq):
        Aeq[i, 2 * i] = 1.0
        Aeq[i, 2 * i + 1] = -1.0
    beq = rng.standard_normal(m_eq) * 0.1
    # local box constraints
    A = np.vstack([Aeq, np.eye(n), -np.eye(n)])
    b = np.concatenate([beq, 5 * np.ones(n), 5 * np.ones(n)])
    cones = [ZeroConeT(m_eq), NonnegativeConeT(2 * n)]
    return P, q, A, b, cones


def test_structure_detection():
    from clarabel_tpu.structure import analyze_block_arrow
    from clarabel_tpu.cones.layout import ConeLayout

    P, q, A, b, cones = banded_qp()
    plan = analyze_block_arrow(P != 0, A != 0, ConeLayout(cones))
    assert plan is not None
    N = P.shape[0] + A.shape[0]
    assert plan.nt <= N // 3
    # every KKT row appears exactly once across blocks + tail
    all_rows = np.concatenate(
        [plan.block_idx[plan.block_idx < N].ravel(), plan.tail_idx]
    )
    assert sorted(all_rows.tolist()) == list(range(N))


def test_blockarrow_matches_ldl():
    P, q, A, b, cones = banded_qp()
    sol_ldl = Solver(P, q, A, b, cones).solve()
    solver_ba = Solver(P, q, A, b, cones, Settings(kkt_backend="blockarrow"))
    assert solver_ba._structure is not None, "expected structure detection"
    sol_ba = solver_ba.solve()
    assert sol_ba.status == SolverStatus.SOLVED == sol_ldl.status
    assert np.linalg.norm(sol_ba.x - sol_ldl.x) < 1e-7
    assert sol_ba.r_prim < 1e-8 and sol_ba.r_dual < 1e-8


def test_blockarrow_falls_back_when_dense():
    """Dense problems have no useful separator: plan is None, ldl used."""
    rng = np.random.default_rng(1)
    n = 10
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    A = np.vstack([rng.standard_normal((4, n)), -np.eye(n)])
    b = np.concatenate([rng.standard_normal(4) * 0.1 + 2.0, np.ones(n) * 5])
    cones = [NonnegativeConeT(4 + n)]
    solver = Solver(P, q, A, b, cones, Settings(kkt_backend="blockarrow"))
    sol = solver.solve()  # works regardless of whether a plan was found
    assert sol.status == SolverStatus.SOLVED
