"""On-TPU regression for nonsymmetric (exp/pow) cones in the megakernel:
the Mosaic-compiled fused kernel vs the vmapped XLA loop on one fixed
batch (round-4 extension; reference: coneops_expcone.jl,
coneops_powcone.jl, coneops_nonsymmetric_common.jl).

The CPU tier (tests/test_megakernel_nonsym.py) runs the same block
function through AOT XLA; this tier certifies the Mosaic lowering of the
log/exp double-float chains, the in-kernel NR/backtracking while_loops,
and the strategy-machine carry on real hardware.
"""

import numpy as np

from clarabel_tpu import (
    BatchSolver, ExponentialConeT, GenPowerConeT, NonnegativeConeT,
    PowerConeT, Settings, SolverStatus,
)

SOLVED = int(SolverStatus.SOLVED)
ALMOST = int(SolverStatus.ALMOST_SOLVED)


def _exp_batch(B, seed=0):
    n = 3
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", F, F) + 0.5 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = np.zeros((B, 5, n))
    A[:, 0, 0] = 1.0
    A[:, 1, 1] = 1.0
    A[:, 2, 0] = 1.0
    A[:, 3, 1] = 1.0
    A[:, 4, 2] = 1.0
    b = np.zeros((B, 5))
    b[:, 0] = 2.0
    b[:, 1] = 2.0
    b[:, 2] = rng.uniform(-0.5, 0.5, B)
    b[:, 3] = rng.uniform(1.5, 2.5, B)
    b[:, 4] = rng.uniform(2.0, 3.0, B)
    return P, q, A, b, [NonnegativeConeT(2), ExponentialConeT()], n


def _check(out, ref, P, q, A, b, slack=2):
    """Parity bar (round 5): the fused kernel must certify at least as
    many lanes SOLVED as the native-f64 XLA loop on the same batch
    (minus a small rounding-wobble slack).  The residual ALMOST tail is
    ALGORITHMIC, not a kernel-precision deficit — measured round 5: the
    f64 loop reproduces it (exp 1024-lane config: kernel 998 solved vs
    loop 987; genpow lane-for-lane identical) — so a fixed 25%-style
    allowance is no longer needed."""
    B = len(q)
    assert np.all((out.status == SOLVED) | (out.status == ALMOST)), \
        out.status
    solved = out.status == SOLVED
    ref_solved = int(np.sum(ref.status == SOLVED))
    assert solved.sum() >= ref_solved - slack, (
        f"kernel solved {solved.sum()} < loop {ref_solved} - {slack}")
    for i in np.nonzero(solved)[0]:
        if ref.status[i] == SOLVED:
            assert abs(out.obj_val[i] - ref.obj_val[i]) < 1e-6
            # flat optima: x wanders ~1e-4 between valid solutions
            # whose objectives/KKT residuals agree (see CPU tier)
            np.testing.assert_allclose(out.x[i], ref.x[i], atol=5e-4)
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 and rd < 1e-7, (i, rp, rd)


def test_exp_megakernel_on_tpu():
    B = 64
    P, q, A, b, cones, n = _exp_batch(B, seed=3)
    out = BatchSolver(cones, n,
                      Settings(kkt_backend="megakernel")).solve(
                          P, q, A, b)
    ref = BatchSolver(cones, n, Settings()).solve(P, q, A, b)
    _check(out, ref, P, q, A, b)


def test_mixed_exp_pow_megakernel_on_tpu():
    """Mixed exp+pow layout (CPU-tier-excluded: XLA:CPU compiles the
    two-nonsym-segment fused body pathologically slowly; Mosaic is
    fine)."""
    n = 4
    B = 64
    rng = np.random.default_rng(3)
    F = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", F, F) + 0.5 * np.eye(n)
    q = rng.standard_normal((B, n))
    m = 8
    A = np.zeros((B, m, n))
    for r, c in ((0, 0), (1, 1), (2, 0), (3, 1), (4, 2), (5, 1),
                 (6, 2), (7, 3)):
        A[:, r, c] = 1.0
    b = np.zeros((B, m))
    b[:, 0] = 2.0
    b[:, 1] = 2.0
    b[:, 2] = rng.uniform(-0.4, 0.4, B)
    b[:, 3] = rng.uniform(1.5, 2.5, B)
    b[:, 4] = rng.uniform(2.0, 3.0, B)
    b[:, 5] = rng.uniform(2.0, 3.0, B)
    b[:, 6] = rng.uniform(2.0, 3.0, B)
    b[:, 7] = rng.uniform(-0.3, 0.3, B)
    cones = [NonnegativeConeT(2), ExponentialConeT(), PowerConeT(0.4)]
    out = BatchSolver(cones, n,
                      Settings(kkt_backend="megakernel")).solve(
                          P, q, A, b)
    ref = BatchSolver(cones, n, Settings()).solve(P, q, A, b)
    _check(out, ref, P, q, A, b)


def test_genpow_megakernel_on_tpu():
    """Dual-only scaling path through Mosaic (rank-3 Hs with the
    Sherman-Morrison inverse chain in double-float)."""
    n = 4
    B = 64
    rng = np.random.default_rng(4)
    F = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", F, F) + 0.5 * np.eye(n)
    q = rng.standard_normal((B, n))
    m = 6
    A = np.zeros((B, m, n))
    for r, c in ((0, 0), (1, 1), (2, 0), (3, 1), (4, 2), (5, 3)):
        A[:, r, c] = 1.0
    b = np.zeros((B, m))
    b[:, 0] = 3.0
    b[:, 1] = 3.0
    b[:, 2] = rng.uniform(2.0, 3.0, B)
    b[:, 3] = rng.uniform(2.0, 3.0, B)
    b[:, 4] = rng.uniform(-0.3, 0.3, B)
    b[:, 5] = rng.uniform(-0.3, 0.3, B)
    cones = [NonnegativeConeT(2), GenPowerConeT((0.3, 0.7), 2)]
    out = BatchSolver(cones, n,
                      Settings(kkt_backend="megakernel")).solve(
                          P, q, A, b)
    ref = BatchSolver(cones, n, Settings()).solve(P, q, A, b)
    # genpow's dual-only path is the most numerically fragile regime:
    # the Mosaic df64 rounding occasionally trips a factorization
    # checkpoint on a lane the CPU rounding sails through, ending it
    # NUMERICAL_ERROR — a legitimate terminal status the reference
    # also produces on such lanes.  Accept a rare hard lane from the
    # kernel, require most lanes to fully solve, and require the
    # rescue pass to close the batch completely.
    solved = out.status == SOLVED
    hard = ~np.isin(out.status, (SOLVED, ALMOST))
    assert solved.sum() >= (3 * B) // 4, out.status
    assert hard.sum() <= 2, out.status
    for i in np.nonzero(solved)[0]:
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 and rd < 1e-7, (i, rp, rd)
    bs = BatchSolver(cones, n, Settings(kkt_backend="megakernel"),
                     rescue="cpu")
    assert bs.solve(P, q, A, b).all_solved


def test_pow_megakernel_on_tpu():
    n = 3
    B = 64
    rng = np.random.default_rng(5)
    F = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", F, F) + 0.5 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = np.zeros((B, 5, n))
    A[:, 0, 0] = 1.0
    A[:, 1, 1] = 1.0
    A[:, 2, 0] = 1.0
    A[:, 3, 1] = 1.0
    A[:, 4, 2] = 1.0
    b = np.zeros((B, 5))
    b[:, 0] = 3.0
    b[:, 1] = 3.0
    b[:, 2] = rng.uniform(2.0, 3.0, B)
    b[:, 3] = rng.uniform(2.0, 3.0, B)
    b[:, 4] = rng.uniform(-0.3, 0.3, B)
    cones = [NonnegativeConeT(2), PowerConeT(0.6)]
    out = BatchSolver(cones, n,
                      Settings(kkt_backend="megakernel")).solve(
                          P, q, A, b)
    ref = BatchSolver(cones, n, Settings()).solve(P, q, A, b)
    _check(out, ref, P, q, A, b)


def test_psd_megakernel_on_tpu():
    """PSD-triangle cones (side 3) through Mosaic (round-5 extension):
    in-kernel closed-form chol + lane-batched Jacobi NT eig, skron Hs,
    eig step lengths (reference coneops_psdtrianglecone.jl:78-143)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from test_megakernel_psd import _sdp_batch
    from clarabel_tpu import PSDTriangleConeT  # noqa: F401

    B = 64
    P, q, A, b, cones, nx = _sdp_batch(B, 3, seed=21)
    out = BatchSolver(cones, nx,
                      Settings(kkt_backend="megakernel")).solve(
                          P, q, A, b)
    ref = BatchSolver(cones, nx, Settings()).solve(P, q, A, b)
    # same policy as the genpow tier: a rare genuinely-marginal lane
    # may end on a hard terminal status (observed: one MAX_ITERATIONS
    # lane in 64 — with clamped-factor continuation a hopeless lane
    # iterates to the cap instead of erroring early; both are honest
    # endings the reference also produces); most lanes must fully
    # solve, solved lanes must satisfy KKT, and the rescue closes the
    # batch.
    solved = out.status == SOLVED
    hard = ~np.isin(out.status, (SOLVED, ALMOST))
    ref_solved = int(np.sum(ref.status == SOLVED))
    assert solved.sum() >= ref_solved - 2, (solved.sum(), ref_solved)
    assert hard.sum() <= 2, out.status
    for i in np.nonzero(solved)[0]:
        # residuals RELATIVE to the data scale (the SDP instances carry
        # ||b|| ~ 10; the solver's 1e-8 feasibility tolerance is
        # relative — src/settings.jl:78-83)
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 * (1 + np.linalg.norm(b[i])), (i, rp)
        assert rd < 1e-7 * (1 + np.linalg.norm(q[i])), (i, rd)
    bs = BatchSolver(cones, nx, Settings(kkt_backend="megakernel"),
                     rescue="cpu")
    assert bs.solve(P, q, A, b).all_solved
