"""Auto KKT-backend selection: the heuristic must pick the cheapest
factorization by flop estimate and never adopt a detected "structure"
that loses to a dense factorization or to the condensed backend
(regression: a useless block-arrow plan on the tall robust-LS SOCP cost
8x over condensed)."""

import sys

import numpy as np

sys.path.insert(0, ".")

from clarabel_tpu import (
    NonnegativeConeT, SecondOrderConeT, Settings, Solver, SolverStatus,
    ZeroConeT,
)


def _robust_ls(m, n, seed=0):
    from benchmarks.configs import robust_least_squares_socp

    return robust_least_squares_socp(m=m, n=n, seed=seed)


def test_tall_soc_problem_picks_condensed():
    """Tall zero-cone-free SOCP: the block-arrow 'structure' the bisection
    finds has a flop estimate above dense; auto must go condensed."""
    P, q, A, b, cones = _robust_ls(m=800, n=100)
    s = Solver(P, q, A, b, cones, Settings())
    assert s._backend == "condensed"
    assert s._structure is None
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8


def test_small_problem_picks_ldl():
    rng = np.random.default_rng(0)
    n = 8
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.ones(2 * n)
    s = Solver(P, rng.standard_normal(n), A, b,
               [NonnegativeConeT(2 * n)], Settings())
    assert s._backend == "ldl"


def test_zero_cones_allowed_on_condensed():
    """Round 3: equality rows enter the condensed normal equations via
    the 1/eps convention (kkt/condensed.py + cones/ops.mul_Hs_inv), so
    tall zero-cone problems pick condensed AND solve to full accuracy
    (previously gated off; measured exact agreement with dense LDL)."""
    rng = np.random.default_rng(1)
    n, m_eq = 100, 30
    P = np.eye(n)
    q = rng.standard_normal(n)
    Aeq = rng.standard_normal((m_eq, n))
    beq = Aeq @ rng.uniform(-1, 1, n)
    A = np.vstack([Aeq, np.eye(n), -np.eye(n), np.eye(n), -np.eye(n),
                   np.eye(n), -np.eye(n)])
    b = np.concatenate([beq] + [10.0 * np.ones(n)] * 6)
    cones = [ZeroConeT(m_eq), NonnegativeConeT(6 * n)]
    s = Solver(P, q, A, b, cones, Settings())
    assert s._backend == "condensed"
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(Aeq @ sol.x - beq) < 1e-8


def test_structured_problem_keeps_structure():
    """A genuinely block-arrow problem (banded QP) must still select a
    structured backend with a flop estimate beating dense by 2x."""
    from benchmarks.configs import large_banded_qp_sparse

    P, q, A, b, cones = large_banded_qp_sparse(grid=400)
    s = Solver(P, q, A, b, cones, Settings())
    assert s._backend in ("blockarrow", "multifrontal")
    assert s._structure is not None
    N = s.n + s.m
    assert s._structure.flop_estimate() <= 0.5 * N ** 3 / 3.0


# ---------------------------------------------------------------------------
# Shape-sweep grid: auto's backend choice across problem shapes (VERDICT r1
# weak #6 / next #9).  Expectations were established by measuring each
# backend on these shapes once (round 1-2 STATUS.md); the sweep pins the
# heuristic so regressions change a test, not a benchmark.
# ---------------------------------------------------------------------------

import pytest as _pytest


def _mk_problem(kind, n, m_ratio, seed=0):
    rng = np.random.default_rng(seed)
    m = int(n * m_ratio)
    if kind == "dense-qp":
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        P = F @ F.T + np.eye(n)
        A = np.vstack([rng.standard_normal((m - 2 * n, n)) / np.sqrt(n),
                       np.eye(n), -np.eye(n)])
        b = np.concatenate([np.ones(m - 2 * n) * 3,
                            np.ones(n) * 3, np.ones(n) * 3])
        cones = [NonnegativeConeT(m)]
        q = rng.standard_normal(n)
    elif kind == "tall-ls":
        P = np.zeros((n, n))
        A = np.vstack([rng.standard_normal((m - n, n)) / np.sqrt(n),
                       -np.eye(n)])
        b = np.concatenate([np.ones(m - n), np.ones(n) * 5])
        cones = [NonnegativeConeT(m)]
        q = rng.standard_normal(n)
    else:
        raise ValueError(kind)
    return P, q, A, b, cones


@_pytest.mark.parametrize("kind,n,m_ratio,expect", [
    # small dense problems: plain ldl (structure machinery not worth it)
    ("dense-qp", 24, 3.0, {"ldl"}),
    ("dense-qp", 64, 2.5, {"ldl"}),
    # tall zero-cone-free: condensed normal equations once m >= 3n, m>=500
    ("tall-ls", 180, 3.0, {"condensed"}),
    # moderately tall but short of the threshold: ldl
    ("tall-ls", 60, 2.5, {"ldl"}),
])
def test_auto_choice_sweep(kind, n, m_ratio, expect):
    P, q, A, b, cones = _mk_problem(kind, n, m_ratio)
    s = Solver(P, q, A, b, cones, Settings(kkt_backend="auto"))
    assert s._backend in expect, (kind, n, m_ratio, s._backend)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
