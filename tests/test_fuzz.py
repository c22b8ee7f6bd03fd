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


# ---------------------------------------------------------------------------
# condensed backend + zero cones at extreme conditioning (VERDICT r4 #7):
# the condensed normal-equations backend enters zero-cone rows through a
# 1/eps diagonal (cones/ops.mul_Hs_inv convention, shared with the fused
# kernel) and relies on iterative refinement against the exact augmented
# operator to recover full accuracy.  Drive it with P eigenvalue spread
# 1e6 and badly scaled equality rows and require reference-grade KKT
# quality (reference regularization behavior:
# src/kktsolvers/kktsolver_directldl.jl:247-310).
# ---------------------------------------------------------------------------


def _illconditioned_eq_qp(rng, n=8, m_eq=3, m_in=10, p_spread=1e6):
    eigs = np.logspace(0, -np.log10(p_spread), n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    P = (Q * eigs) @ Q.T
    q = rng.standard_normal(n)
    Aeq = rng.standard_normal((m_eq, n)) * 10.0 ** rng.uniform(
        -3, 3, (m_eq, 1))
    x0 = rng.standard_normal(n)
    beq = Aeq @ x0
    G = rng.standard_normal((m_in, n))
    h = G @ x0 + rng.uniform(0.1, 1.0, m_in)
    A = np.vstack([Aeq, G])
    b = np.concatenate([beq, h])
    return P, q, A, b, [ZeroConeT(m_eq), NonnegativeConeT(m_in)]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_condensed_zero_cone_conditioning(seed):
    rng = np.random.default_rng(8100 + seed)
    P, q, A, b, cones = _illconditioned_eq_qp(rng)
    sol = Solver(P, q, A, b, cones,
                 Settings(kkt_backend="condensed")).solve()
    assert sol.status in (SolverStatus.SOLVED,
                          SolverStatus.ALMOST_SOLVED), f"seed {seed}"
    # the equality rows must hold to refinement-grade accuracy despite
    # the 1/eps convention (this is exactly what the refinement loop
    # must rescue)
    m_eq = cones[0].dim
    assert np.linalg.norm(A[:m_eq] @ sol.x - b[:m_eq]) < 1e-7 * (
        1 + np.linalg.norm(b[:m_eq])), "equality rows drifted"
    if sol.status == SolverStatus.SOLVED:
        check_kkt(P, q, A, b, sol)


# ---------------------------------------------------------------------------
# megakernel robustness beyond the bench distribution (VERDICT r2 #4):
# random data with wide conditioning spread through the fused-kernel
# backend must never produce false INSUFFICIENT_PROGRESS /
# NUMERICAL_ERROR / MAX_ITERATIONS on strictly-feasible instances, and
# solved lanes must agree with the XLA loop solver.
# ---------------------------------------------------------------------------

_MEGA_LAYOUTS = [
    # (n, cones): two nn/soc mixes inside megakernel.eligible's regime
    (3, [NonnegativeConeT(3), SecondOrderConeT(3)]),
    (4, [SecondOrderConeT(3), NonnegativeConeT(2), SecondOrderConeT(4)]),
]


def _mega_feasible_batch(rng, B, n, cones):
    """Strictly-feasible random instances for a fixed nn/soc layout,
    with deliberately wide conditioning: P eigenvalue spread up to 1e4
    and row scalings of A spread over 1e-2..1e2 (the equilibrator's
    job to undo)."""
    m = sum(c.dim for c in cones)
    Ps = np.empty((B, n, n))
    qs = np.empty((B, n))
    As = np.empty((B, m, n))
    bs = np.empty((B, m))
    for k in range(B):
        spread = 10.0 ** rng.uniform(0, 4)
        eigs = np.logspace(0, -np.log10(spread), n)
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        Ps[k] = (Q * eigs) @ Q.T
        qs[k] = rng.standard_normal(n)
        x0 = rng.standard_normal(n)
        rows_A, rows_b = [], []
        for c in cones:
            d = c.dim
            if isinstance(c, NonnegativeConeT):
                G = rng.standard_normal((d, n))
                h = G @ x0 + rng.uniform(0.1, 1.0, d)
            else:
                a1 = rng.standard_normal(n)
                A2 = rng.standard_normal((d - 1, n))
                v = rng.standard_normal(d - 1) * 0.3
                h_tail = A2 @ x0 + v
                h_head = a1 @ x0 + np.linalg.norm(v) + rng.uniform(
                    0.2, 1.0)
                G = np.vstack([a1, A2])
                h = np.concatenate([[h_head], h_tail])
            rows_A.append(G)
            rows_b.append(h)
        Ak = np.vstack(rows_A)
        bk = np.concatenate(rows_b)
        # wide row scalings — per-row on nn segments, but SCALAR per soc
        # segment: the SOC is only invariant under uniform scaling of
        # the whole block (the reason equilibration rectifies soc
        # scalings to segment means)
        rowscale = np.empty(m)
        lo = 0
        for c in cones:
            d = c.dim
            if isinstance(c, NonnegativeConeT):
                rowscale[lo:lo + d] = 10.0 ** rng.uniform(-2, 2, d)
            else:
                rowscale[lo:lo + d] = 10.0 ** rng.uniform(-2, 2)
            lo += d
        As[k] = Ak * rowscale[:, None]
        bs[k] = bk * rowscale
    return Ps, qs, As, bs


@pytest.mark.parametrize("li", range(len(_MEGA_LAYOUTS)))
def test_fuzz_megakernel(li):
    from clarabel_tpu import BatchSolver

    n, cones = _MEGA_LAYOUTS[li]
    rng = np.random.default_rng(7000 + li)
    B = 128
    P, q, A, b = _mega_feasible_batch(rng, B, n, cones)
    mega = BatchSolver(cones, n, Settings(kkt_backend="megakernel"))
    out = mega.solve(P, q, A, b)
    ref = BatchSolver(cones, n,
                      Settings(kkt_backend="condensed")).solve(P, q, A, b)

    bad = ~np.isin(out.status, (int(SolverStatus.SOLVED),
                                int(SolverStatus.ALMOST_SOLVED)))
    assert not bad.any(), (
        f"layout {li}: false failures at lanes {np.nonzero(bad)[0]}: "
        f"{out.status[bad]}"
    )
    # strictly-feasible construction: the vast majority must fully
    # solve; the ALMOST_SOLVED tail is the known marginal-lane class
    # (double-float accuracy floor — the rescue pass exists for it) and
    # its exact membership wobbles with XLA compile options, so the
    # bound leaves it ~5% headroom
    solved = out.status == int(SolverStatus.SOLVED)
    assert solved.sum() >= B - 6
    for i in np.nonzero(solved & (ref.status == int(SolverStatus.SOLVED)))[0]:
        assert abs(out.obj_val[i] - ref.obj_val[i]) < 1e-5 * (
            1 + abs(ref.obj_val[i]))
