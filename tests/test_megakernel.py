"""The Pallas IPM megakernel (ipm/megakernel.py), CPU-executable path.

On CPU the same block function runs as plain XLA (AOT-compiled with the
fusion pass disabled — XLA:CPU's fusion emitter reassociates floats and
destroys the df64 error-free transforms).  The kernel must reproduce the
vmapped ipm/loop.py solver: statuses, solutions, iteration counts, and
true-KKT residuals of the returned solutions.

Uses a deliberately tiny layout (n=2, one nn + one soc cone): program
size scales with n*m and the AOT compile runs once per module.
"""

import numpy as np
import pytest

from clarabel_tpu import (
    BatchSolver, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
    Settings, SolverStatus,
)
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.ipm import megakernel

N = 2
CONES = [NonnegativeConeT(2), SecondOrderConeT(2)]
M = 4


def _batch(B, seed=0, infeasible_lanes=()):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((B, N, N))
    P = np.einsum("bij,bkj->bik", F, F) + np.eye(N)
    q = rng.standard_normal((B, N))
    A = np.tile(np.vstack([np.eye(N), [[1.0, 0.3], [0.2, 1.0]]]),
                (B, 1, 1))
    b = np.abs(rng.standard_normal((B, M))) + 1.0
    for i in infeasible_lanes:
        # x0 >= 1 (from row 0: s = b - x, wait rows are x <= b style);
        # force primal infeasibility: x0 <= -1 and x0 >= 1 via nn rows
        A[i, 0] = [1.0, 0.0]
        A[i, 1] = [-1.0, 0.0]
        b[i, 0] = -1.0   # x0 <= -1
        b[i, 1] = -1.0   # -x0 <= -1  =>  x0 >= 1
    return P, q, A, b


@pytest.fixture(scope="module")
def mega_solver():
    return BatchSolver(CONES, N, Settings(kkt_backend="megakernel"))


def test_eligibility():
    st = Settings()
    assert megakernel.eligible(ConeLayout(CONES), st, N)
    # round 5: PSD sides <= 3 ARE eligible (in-kernel NT scaling via
    # one-sided Jacobi SVD); larger sides stay out
    assert megakernel.eligible(
        ConeLayout([PSDTriangleConeT(2)]), st, 2)
    assert not megakernel.eligible(
        ConeLayout([PSDTriangleConeT(4)]), st, 4)
    assert not megakernel.eligible(
        ConeLayout(CONES), Settings(dtype="float32"), N)
    assert not megakernel.eligible(
        ConeLayout([NonnegativeConeT(500)]), st, 40)  # too wide


def test_matches_reference(mega_solver):
    B = 8
    P, q, A, b = _batch(B)
    out = mega_solver.solve(P, q, A, b)
    ref = BatchSolver(CONES, N, Settings(kkt_backend="condensed")).solve(
        P, q, A, b)

    solved = out.status == int(SolverStatus.SOLVED)
    # the marginal-lane class that TPU-style f32-pair arithmetic cannot
    # close to 1e-8 ends ALMOST_SOLVED (same behavior as the XLA f64
    # emulation path; the rescue pass exists for exactly this)
    assert np.all((out.status == int(SolverStatus.SOLVED))
                  | (out.status == int(SolverStatus.ALMOST_SOLVED)))
    assert solved.sum() >= B - 2

    # solved lanes match the reference solver closely
    for i in np.nonzero(solved)[0]:
        assert ref.status[i] == int(SolverStatus.SOLVED)
        assert abs(out.obj_val[i] - ref.obj_val[i]) < 1e-6
        np.testing.assert_allclose(out.x[i], ref.x[i], atol=1e-6)
        # true KKT conditions of the returned (unscaled) solution
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 and rd < 1e-7
        assert abs(out.s[i] @ out.z[i]) < 1e-6
        # iteration counts in the same ballpark as the reference loop.
        # The kernel's f32 phase takes slightly different (cheaper)
        # steps while mu is large, so counts drift a little more than
        # the pure-df64 kernel did (docs/DEVIATIONS.md).
        assert abs(int(out.iterations[i]) - int(ref.iterations[i])) <= 4


def test_rescue_closes_marginal_lanes():
    B = 8
    P, q, A, b = _batch(B, seed=1)
    bs = BatchSolver(CONES, N, Settings(kkt_backend="megakernel"),
                     rescue="same",
                     rescue_settings=Settings(kkt_backend="condensed"))
    out = bs.solve(P, q, A, b)
    assert out.all_solved


def test_primal_infeasible_detection(mega_solver):
    B = 8
    P, q, A, b = _batch(B, seed=2, infeasible_lanes=(3,))
    out = mega_solver.solve(P, q, A, b)
    assert out.status[3] in (int(SolverStatus.PRIMAL_INFEASIBLE),
                             int(SolverStatus.ALMOST_PRIMAL_INFEASIBLE))
    ok = np.isin(out.status, (int(SolverStatus.SOLVED),
                              int(SolverStatus.ALMOST_SOLVED)))
    ok[3] = True
    assert ok.all()


def test_lp_batch():
    """p_nonzero=False initialization path (LP: P = 0)."""
    B = 8
    rng = np.random.default_rng(3)
    q = np.abs(rng.standard_normal((B, N))) + 0.2   # bounded LP
    A = np.tile(np.vstack([-np.eye(N), [[1.0, 0.3], [0.2, 1.0]]]),
                (B, 1, 1))
    b = np.concatenate([np.zeros((B, N)),             # x >= 0
                        np.abs(rng.standard_normal((B, 2))) + 1.0],
                       axis=1)
    bs = BatchSolver(CONES, N, Settings(kkt_backend="megakernel"),
                     p_nonzero=False)
    out = bs.solve(None, q, A, b)
    ref = BatchSolver(CONES, N, Settings(kkt_backend="condensed"),
                      p_nonzero=False).solve(None, q, A, b)
    solved = out.status == int(SolverStatus.SOLVED)
    assert solved.sum() >= B - 2
    for i in np.nonzero(solved)[0]:
        assert abs(out.obj_val[i] - ref.obj_val[i]) < 1e-6


def test_zero_cone_batch_matches_loop():
    """VERDICT r2 #2: batched equality-constrained QPs (zero cones) run
    through the fused kernel and match the XLA loop.  Zero-cone rows
    enter the condensed system via the 1/eps convention of
    cones/ops.mul_Hs_inv; the true-KKT refinement operator keeps their
    block exact (ipm/megakernel.py hinv_apply/hs_apply)."""
    from clarabel_tpu import ZeroConeT

    B = 8
    n = 3
    cones = [ZeroConeT(1), NonnegativeConeT(2), SecondOrderConeT(3)]
    rng = np.random.default_rng(11)
    F = rng.standard_normal((B, n, n))
    P = np.einsum("bij,bkj->bik", F, F) + np.eye(n)
    q = rng.standard_normal((B, n))
    A = np.zeros((B, 6, n))
    b = np.zeros((B, 6))
    A[:, 0, :] = 1.0                      # sum x = 1   (zero cone)
    b[:, 0] = 1.0
    A[:, 1:3, :2] = np.eye(2)             # x0, x1 <= ub (nn)
    b[:, 1:3] = rng.uniform(0.5, 1.5, (B, 2))
    A[:, 4:6, 1:3] = -np.eye(2)           # soc tail: x - c
    b[:, 3] = rng.uniform(1.0, 2.0, B)    # soc head: radius
    b[:, 4:6] = -rng.standard_normal((B, 2)) * 0.2

    mega = BatchSolver(cones, n, Settings(kkt_backend="megakernel"))
    out = mega.solve(P, q, A, b)
    ref = BatchSolver(cones, n, Settings(kkt_backend="condensed")).solve(
        P, q, A, b)

    solved = out.status == int(SolverStatus.SOLVED)
    assert solved.sum() >= B - 2, out.status
    for i in np.nonzero(solved & (ref.status == 1))[0]:
        assert abs(out.obj_val[i] - ref.obj_val[i]) < 1e-6
        np.testing.assert_allclose(out.x[i], ref.x[i], atol=1e-6)
        # the equality row holds exactly-ish and its slack is 0
        assert abs(A[i, 0] @ out.x[i] - b[i, 0]) < 1e-8
        assert abs(out.s[i][0]) < 1e-10
