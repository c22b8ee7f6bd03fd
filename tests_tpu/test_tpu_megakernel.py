"""On-TPU megakernel regression (VERDICT r2 #3): the Mosaic-compiled
fused-kernel IPM vs the vmapped XLA loop on one fixed batch — statuses,
x, objective, iteration ballpark — plus an infeasible lane.  Role
analogue of the reference's per-backend test matrix
(reference: test/OptTests/linear_solvers.jl:11-71).

The CPU tests (tests/test_megakernel.py) compile the same block function
through AOT XLA with fusion disabled; THIS tier is what certifies the
Mosaic compiler's lowering on real hardware.
"""

import numpy as np

from clarabel_tpu import (
    BatchSolver, NonnegativeConeT, SecondOrderConeT, Settings,
    SolverStatus,
)

N = 6
CONES = [NonnegativeConeT(N), SecondOrderConeT(N + 1)]


def _batch(B, seed=0, infeasible_lanes=()):
    rng = np.random.default_rng(seed)
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        F = rng.standard_normal((N, N)) / np.sqrt(N)
        Ps.append(F @ F.T + 0.5 * np.eye(N))
        qs.append(rng.standard_normal(N))
        As.append(np.vstack([np.eye(N), np.zeros((1, N)), -np.eye(N)]))
        bs.append(np.concatenate([rng.uniform(0.5, 1.5, N),
                                  [rng.uniform(1.0, 2.0)], np.zeros(N)]))
    P, q, A, b = (np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs))
    for i in infeasible_lanes:
        # x0 <= -1 and x0 >= 1 through two nn rows
        A[i, 0, :] = 0.0
        A[i, 0, 0] = 1.0
        A[i, 1, :] = 0.0
        A[i, 1, 0] = -1.0
        b[i, 0] = -1.0
        b[i, 1] = -1.0
    return P, q, A, b


def test_megakernel_matches_loop_on_tpu():
    B = 64
    P, q, A, b = _batch(B, seed=3, infeasible_lanes=(5,))
    mega = BatchSolver(CONES, N, Settings(kkt_backend="megakernel"))
    ref = BatchSolver(CONES, N, Settings(kkt_backend="condensed"))
    out = mega.solve(P, q, A, b)
    rout = ref.solve(P, q, A, b)

    assert out.status[5] in (int(SolverStatus.PRIMAL_INFEASIBLE),
                             int(SolverStatus.ALMOST_PRIMAL_INFEASIBLE))
    ok = np.isin(out.status, (int(SolverStatus.SOLVED),
                              int(SolverStatus.ALMOST_SOLVED)))
    ok[5] = True
    assert ok.all(), out.status

    both = (out.status == int(SolverStatus.SOLVED)) & (
        rout.status == int(SolverStatus.SOLVED))
    assert both.sum() >= B - 4
    for i in np.nonzero(both)[0]:
        assert abs(out.obj_val[i] - rout.obj_val[i]) < 1e-6 * (
            1 + abs(rout.obj_val[i]))
        # x proximity is a sanity bound only: on near-degenerate optima
        # two valid 1e-8-KKT solutions can differ by ~1e-5 along flat
        # directions (observed on hardware at lane granularity); the
        # KKT residual check below is the accuracy assertion
        np.testing.assert_allclose(out.x[i], rout.x[i], atol=1e-3)
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 and rd < 1e-7
        assert abs(int(out.iterations[i]) - int(rout.iterations[i])) <= 4


def test_megakernel_rescue_closes_batch_on_tpu():
    B = 1024
    P, q, A, b = _batch(B, seed=4)
    bs = BatchSolver(CONES, N, Settings(kkt_backend="megakernel"),
                     rescue="cpu")
    out = bs.solve(P, q, A, b)
    assert out.all_solved
