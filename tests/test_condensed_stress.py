"""Condensed-backend stress tests: batched random instances across
ill-conditioned / near-degenerate data, cross-checked against the dense
LDL backend (the hardening work item before "auto" can prefer condensed
more broadly).

One compile per structure: stress variation lives in the data, not the
shapes, so each block runs two compiled programs over a 32-instance
batch."""

import numpy as np
import pytest

from clarabel_tpu import Settings, NonnegativeConeT, SecondOrderConeT
from clarabel_tpu.parallel.batch_impl import BatchSolver
from clarabel_tpu.statuscodes import SolverStatus

B = 32


def _solve_both(cones, n, Ps, qs, As, bs):
    sol_c = BatchSolver(
        cones, n, settings=Settings(kkt_backend="condensed")
    ).solve(Ps, qs, As, bs)
    sol_l = BatchSolver(
        cones, n, settings=Settings(kkt_backend="ldl")
    ).solve(Ps, qs, As, bs)
    return sol_c, sol_l


def _agree(sol_c, sol_l, atol=2e-6):
    SOLVED = int(SolverStatus.SOLVED)
    ALMOST = int(SolverStatus.ALMOST_SOLVED)
    both = (np.isin(sol_c.status, (SOLVED, ALMOST))
            & (sol_l.status == SOLVED))
    # condensed must solve (at least almost) nearly everything LDL solves
    n_ldl = int((sol_l.status == SOLVED).sum())
    assert both.sum() >= n_ldl - 1, (
        f"condensed solved {both.sum()} of {n_ldl} LDL-solved instances; "
        f"condensed statuses: {np.unique(sol_c.status, return_counts=True)}"
    )
    dx = np.abs(sol_c.x[both] - sol_l.x[both]).max()
    assert dx < atol, f"solution mismatch {dx}"


def test_condensed_illconditioned_qp():
    """P with condition number ~1e8."""
    rng = np.random.default_rng(0)
    n = 8
    cones = [NonnegativeConeT(2 * n)]
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.logspace(0, -8, n)
        Ps.append(Q @ np.diag(d) @ Q.T)
        qs.append(rng.standard_normal(n))
        As.append(np.vstack([np.eye(n), -np.eye(n)]))
        bs.append(np.concatenate([rng.uniform(0.5, 2.0, n),
                                  rng.uniform(0.5, 2.0, n)]))
    sol_c, sol_l = _solve_both(cones, n, np.stack(Ps), np.stack(qs),
                               np.stack(As), np.stack(bs))
    _agree(sol_c, sol_l)


def test_condensed_nearly_degenerate_constraints():
    """Rows of A nearly parallel (angle ~1e-5)."""
    rng = np.random.default_rng(1)
    n = 6
    m = 2 * n
    cones = [NonnegativeConeT(m)]
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        Ps.append(F @ F.T + 0.1 * np.eye(n))
        qs.append(rng.standard_normal(n))
        base = rng.standard_normal((n, n))
        wiggle = base + 1e-5 * rng.standard_normal((n, n))
        As.append(np.vstack([base, wiggle]))
        bs.append(np.concatenate([rng.uniform(1.0, 2.0, n),
                                  rng.uniform(1.0, 2.0, n) + 1e-4]))
    sol_c, sol_l = _solve_both(cones, n, np.stack(Ps), np.stack(qs),
                               np.stack(As), np.stack(bs))
    _agree(sol_c, sol_l)


def test_condensed_wide_scale_socp():
    """SOCP with data magnitudes spanning 1e-3..1e3 (stress on the
    equilibration + normal-equation conditioning)."""
    rng = np.random.default_rng(2)
    n = 6
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        scale = 10.0 ** rng.uniform(-3, 3)
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        Ps.append(scale * (F @ F.T + 0.5 * np.eye(n)))
        qs.append(scale * rng.standard_normal(n))
        As.append(np.vstack([-np.eye(n), np.zeros((1, n)),
                             np.eye(n) * rng.uniform(0.1, 10.0)]))
        bs.append(np.concatenate([rng.uniform(0.5, 1.5, n),
                                  [rng.uniform(1.0, 2.0) * scale],
                                  np.zeros(n)]))
    sol_c, sol_l = _solve_both(cones, n, np.stack(Ps), np.stack(qs),
                               np.stack(As), np.stack(bs))
    _agree(sol_c, sol_l, atol=5e-5)
