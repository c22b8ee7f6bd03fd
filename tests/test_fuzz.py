"""Randomized stress tests: random feasible instances of each problem
family must solve to tolerance with KKT conditions verified directly
(complementary slackness, stationarity, cone membership)."""

import numpy as np
import pytest

from clarabel_tpu import (
    Solver, Settings, SolverStatus,
    ZeroConeT, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
)


def check_kkt(P, q, A, b, sol, tol=1e-6):
    """Stationarity + primal feasibility + complementary slackness."""
    x, z, s = sol.x, sol.z, sol.s
    P_sym = np.triu(P) + np.triu(P, 1).T
    assert np.linalg.norm(P_sym @ x + q + A.T @ z) < tol * (
        1 + np.linalg.norm(q)
    ), "stationarity"
    assert np.linalg.norm(A @ x + s - b) < tol * (1 + np.linalg.norm(b)), (
        "primal feasibility"
    )
    assert abs(s @ z) < tol * (1 + abs(sol.obj_val)), "complementarity"


def random_qp(rng, n=8, m_eq=2, m_in=10):
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    Aeq = rng.standard_normal((m_eq, n))
    x0 = rng.standard_normal(n)
    beq = Aeq @ x0
    G = rng.standard_normal((m_in, n))
    h = G @ x0 + rng.uniform(0.1, 1.0, m_in)  # strictly feasible at x0
    A = np.vstack([Aeq, G])
    b = np.concatenate([beq, h])
    return P, q, A, b, [ZeroConeT(m_eq), NonnegativeConeT(m_in)]


def random_socp(rng, n=6):
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.2 * np.eye(n)
    q = rng.standard_normal(n)
    # ||x - x0|| <= r, strictly feasible at x0
    x0 = rng.standard_normal(n)
    r = rng.uniform(1.0, 3.0)
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([[r], -x0])
    return P, q, A, b, [SecondOrderConeT(n + 1)]


def random_sdp(rng, nd=3):
    t = nd * (nd + 1) // 2

    def tri(i, j):
        i, j = min(i, j), max(i, j)
        return (j * (j + 1)) // 2 + i

    def svec(M):
        out = np.zeros(t)
        for c in range(nd):
            for r in range(c + 1):
                out[tri(r, c)] = M[r, c] * (1.0 if r == c else np.sqrt(2))
        return out

    # min q'x s.t. B - sum x_i A_i psd, |x| <= 1
    nx = 3
    Amats = []
    for _ in range(nx):
        M = rng.standard_normal((nd, nd))
        Amats.append(M + M.T)
    Bm = rng.standard_normal((nd, nd))
    Bm = Bm + Bm.T
    Bm += (abs(np.linalg.eigvalsh(Bm).min()) + 1.0) * np.eye(nd)
    q = rng.standard_normal(nx)
    P = np.zeros((nx, nx))
    A = np.vstack([
        np.eye(nx), -np.eye(nx),
        np.stack([svec(Ai) for Ai in Amats], axis=1),
    ])
    b = np.concatenate([np.ones(2 * nx), svec(Bm)])
    return P, q, A, b, [NonnegativeConeT(2 * nx), PSDTriangleConeT(nd)]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("family", ["qp", "socp", "sdp"])
def test_fuzz(family, seed):
    rng = np.random.default_rng(1000 * seed + hash(family) % 1000)
    gen = {"qp": random_qp, "socp": random_socp, "sdp": random_sdp}[family]
    P, q, A, b, cones = gen(rng)
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED, f"{family} seed {seed}"
    check_kkt(P, q, A, b, sol)
