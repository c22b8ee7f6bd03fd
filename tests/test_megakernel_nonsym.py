"""Nonsymmetric (exp/pow) cones in the IPM megakernel, CPU path.

The fused kernel must reproduce the vmapped ipm/loop.py solver on
batches with exponential and power cones: statuses, solutions,
objectives, and iteration counts (both implement the same
predictor-corrector with dual/primal-dual scalings, 3rd-order
corrections, and the PrimalDual->Dual strategy machine; reference:
src/cones/coneops_expcone.jl, coneops_powcone.jl, src/solver.jl).
"""

import numpy as np
import pytest

from clarabel_tpu import (
    BatchSolver, ExponentialConeT, GenPowerConeT, NonnegativeConeT,
    PowerConeT, Settings, SolverStatus,
)
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.ipm import megakernel

SOLVED = int(SolverStatus.SOLVED)


def _exp_batch(B, seed=0):
    """Bounded QPs with one exp-cone constraint."""
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
    cones = [NonnegativeConeT(2), ExponentialConeT()]
    return P, q, A, b, cones, 3


def _pow_batch(B, seed=1, alpha=0.6):
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
    b[:, 0] = 3.0
    b[:, 1] = 3.0
    b[:, 2] = rng.uniform(2.0, 3.0, B)
    b[:, 3] = rng.uniform(2.0, 3.0, B)
    b[:, 4] = rng.uniform(-0.3, 0.3, B)
    cones = [NonnegativeConeT(2), PowerConeT(alpha)]
    return P, q, A, b, cones, n


@pytest.fixture(scope="module")
def exp_pair():
    """Shared (megakernel, loop) solver pair for the exp layout: the
    AOT compile of the fused nonsym body is minutes on XLA:CPU, so
    parity and fuzz tests reuse one compiled program each."""
    cones = [NonnegativeConeT(2), ExponentialConeT()]
    return (BatchSolver(cones, 3, Settings(kkt_backend="megakernel")),
            BatchSolver(cones, 3, Settings()))


@pytest.fixture(scope="module")
def pow_pair():
    cones = [NonnegativeConeT(2), PowerConeT(0.6)]
    return (BatchSolver(cones, 3, Settings(kkt_backend="megakernel")),
            BatchSolver(cones, 3, Settings()))


def _compare(data, solvers, atol=1e-6, max_almost=2):
    """Same acceptance policy as test_megakernel.test_matches_reference:
    the f32-pair arithmetic class leaves marginal lanes ALMOST_SOLVED
    (the rescue pass exists for exactly this); solved lanes must match
    the loop solver and satisfy the true KKT conditions."""
    P, q, A, b, cones, n = data
    B = len(q)
    mega_bs, ref_bs = solvers
    ref = ref_bs.solve(P, q, A, b)
    out = mega_bs.solve(P, q, A, b)
    almost = int(SolverStatus.ALMOST_SOLVED)
    assert np.all((out.status == SOLVED) | (out.status == almost)), \
        out.status
    solved = out.status == SOLVED
    assert solved.sum() >= B - max_almost
    for i in np.nonzero(solved)[0]:
        assert ref.status[i] in (SOLVED, almost)
        if ref.status[i] == SOLVED:
            assert abs(out.obj_val[i] - ref.obj_val[i]) < atol
            # x compared loosely: these exp/pow instances have flat
            # optima (observed: dx ~ 7e-5 between two solutions whose
            # objectives agree to 7e-9 and whose KKT residuals are both
            # ~1e-9); the KKT checks below are the strict acceptance
            np.testing.assert_allclose(out.x[i], ref.x[i], atol=5e-4)
        # true KKT conditions of the returned (unscaled) solution
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 and rd < 1e-7, (rp, rd)
        assert abs(out.s[i] @ out.z[i]) < 1e-6
        # trajectory proximity: catches gross divergence only.  Bound
        # widened 4 -> 8 in round 5: with scaling-chol breakdown made
        # non-fatal (docs/DEVIATIONS.md #16) a marginal lane may spend
        # a few extra clamped-factor iterations converging where the
        # loop solver (or the old kernel) stopped early — the lane now
        # reaches SOLVED, which the KKT checks above verify strictly.
        assert abs(int(out.iterations[i]) - int(ref.iterations[i])) <= 8
    return ref, out


def test_eligibility_nonsym():
    st = Settings()
    assert megakernel.eligible(
        ConeLayout([NonnegativeConeT(2), ExponentialConeT()]), st, 3)
    assert megakernel.eligible(
        ConeLayout([PowerConeT(0.3), NonnegativeConeT(1)]), st, 3)
    assert megakernel.eligible(
        ConeLayout([NonnegativeConeT(2),
                    GenPowerConeT((0.3, 0.7), 2)]), st, 4)
    # bounded nonsym count / genpow width
    assert not megakernel.eligible(
        ConeLayout([ExponentialConeT()] * 17), st, 8)
    assert not megakernel.eligible(
        ConeLayout([GenPowerConeT((0.25,) * 4, 14)]), st, 8)


def test_genpow_matches_loop():
    """Dual-only scaling path end to end (genpow pins the whole
    composite to the Dual strategy; reference:
    coneops_genpowcone.jl:21)."""
    n = 4
    B = 8
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
    solvers = (BatchSolver(cones, n,
                           Settings(kkt_backend="megakernel")),
               BatchSolver(cones, n, Settings()))
    _compare((P, q, A, b, cones, n), solvers)


def test_exp_matches_loop(exp_pair):
    _compare(_exp_batch(8), exp_pair)


def test_pow_matches_loop(pow_pair):
    _compare(_pow_batch(8), pow_pair)


def _fuzz_policy(out, ref, P, q, A, b, min_solved_frac=0.5):
    """No hard failures on oracle-solvable batches (VERDICT r2 #4
    extended to the nonsymmetric kernel): every lane certifies SOLVED
    or ALMOST_SOLVED, a majority fully solves, and solved lanes satisfy
    the true KKT conditions."""
    almost = int(SolverStatus.ALMOST_SOLVED)
    assert np.all((out.status == SOLVED) | (out.status == almost)), \
        out.status
    solved = out.status == SOLVED
    assert solved.sum() >= min_solved_frac * len(q)
    for i in np.nonzero(solved)[0][:16]:
        rp = np.linalg.norm(A[i] @ out.x[i] + out.s[i] - b[i])
        rd = np.linalg.norm(P[i] @ out.x[i] + q[i] + A[i].T @ out.z[i])
        assert rp < 1e-7 and rd < 1e-7, (i, rp, rd)


def test_exp_fuzz(exp_pair):
    """Random data through the SAME compiled program (data-only fuzz:
    wider P conditioning, scaled rows, shifted exp bounds)."""
    mega_bs, ref_bs = exp_pair
    rng = np.random.default_rng(11)
    for trial in range(2):
        P, q, A, b, cones, n = _exp_batch(64, seed=100 + trial)
        # widen conditioning and scales (data-only; layout unchanged)
        scale = 10.0 ** rng.uniform(-1.0, 1.0, (64, 1, 1))
        P = P * scale
        q = q * scale[:, :, 0] * rng.uniform(0.5, 2.0, (64, 1))
        out = mega_bs.solve(P, q, A, b)
        ref = ref_bs.solve(P, q, A, b)
        _fuzz_policy(out, ref, P, q, A, b)


def test_pow_fuzz(pow_pair):
    mega_bs, ref_bs = pow_pair
    rng = np.random.default_rng(13)
    for trial in range(2):
        P, q, A, b, cones, n = _pow_batch(64, seed=200 + trial)
        scale = 10.0 ** rng.uniform(-1.0, 1.0, (64, 1, 1))
        P = P * scale
        q = q * scale[:, :, 0] * rng.uniform(0.5, 2.0, (64, 1))
        out = mega_bs.solve(P, q, A, b)
        ref = ref_bs.solve(P, q, A, b)
        _fuzz_policy(out, ref, P, q, A, b)


# NOTE: the mixed exp+pow layout lives in the TPU tier
# (tests_tpu/test_tpu_nonsym.py): XLA:CPU with fusion disabled compiles
# the fused two-nonsym-segment body pathologically slowly (>25 min on
# this image), while Mosaic compiles it in minutes.


def test_exp_rescue_closes_marginal_lanes():
    P, q, A, b, cones, n = _exp_batch(8, seed=7)
    bs = BatchSolver(cones, n, Settings(kkt_backend="megakernel"),
                     rescue="same", rescue_settings=Settings())
    out = bs.solve(P, q, A, b)
    assert out.all_solved
