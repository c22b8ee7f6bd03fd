"""Batched solving: vmapped IPM over instance batches with masking.

No reference analogue (the reference loops over solves); correctness is
checked by comparing each batched solution against the single-instance
solver on the same data.
"""

import numpy as np
import pytest

from clarabel_tpu import (
    BatchSolver,
    NonnegativeConeT,
    SecondOrderConeT,
    Settings,
    Solver,
    SolverStatus,
)


def make_random_socp(rng, n=6):
    """Small random SOCP: min q'x + ½x'Px s.t. ||x|| <= r, x <= u."""
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    # x <= u (nonneg cone on u - x), ||x|| <= r (SOC)
    u = rng.uniform(0.5, 1.5, n)
    r = rng.uniform(1.0, 2.0)
    A = np.vstack([np.eye(n), np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([u, [r], np.zeros(n)])
    return P, q, A, b


def test_batch_matches_single():
    rng = np.random.default_rng(7)
    B, n = 8, 6
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]

    probs = [make_random_socp(rng, n) for _ in range(B)]
    P = np.stack([p[0] for p in probs])
    q = np.stack([p[1] for p in probs])
    A = np.stack([p[2] for p in probs])
    b = np.stack([p[3] for p in probs])

    bs = BatchSolver(cones, n)
    out = bs.solve(P, q, A, b)
    assert out.all_solved

    for i in range(B):
        Pi, qi, Ai, bi = probs[i]
        sol = Solver(Pi, qi, Ai, bi, cones).solve()
        assert sol.status == SolverStatus.SOLVED
        # each batch lane must itself be a 1e-8 KKT point of its data
        x, z, s = out.x[i], out.z[i], out.s[i]
        assert np.linalg.norm(Pi @ x + qi + Ai.T @ z, np.inf) < 1e-8
        assert np.linalg.norm(Ai @ x + s - bi, np.inf) < 1e-8
        # gap tolerance is relative in the solver; allow the absolute
        # complementarity a little slack
        assert abs(s @ z) < 5e-8
        # solutions agree up to what two independent 1e-8-KKT points can
        # differ by on these instances (weakly-determined components)
        assert np.linalg.norm(x - sol.x) < 2e-5, f"instance {i}"
        assert abs(out.obj_val[i] - sol.obj_val) < 1e-6


def test_batch_mixed_feasibility():
    """Instances that are infeasible must report certificates without
    disturbing the solved lanes (per-instance status masking)."""
    rng = np.random.default_rng(3)
    n = 4
    cones = [NonnegativeConeT(2 * n)]
    # feasible box problem: 0 <= x <= 1
    A1 = np.vstack([np.eye(n), -np.eye(n)])
    b1 = np.concatenate([np.ones(n), np.zeros(n)])
    # infeasible: x <= -1, x >= 0
    b2 = np.concatenate([-np.ones(n), np.zeros(n)])
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)

    Pb = np.stack([P, P])
    qb = np.stack([q, q])
    Ab = np.stack([A1, A1])
    bb = np.stack([b1, b2])

    bs = BatchSolver(cones, n)
    out = bs.solve(Pb, qb, Ab, bb)
    assert out.status[0] == int(SolverStatus.SOLVED)
    assert out.status[1] == int(SolverStatus.PRIMAL_INFEASIBLE)
    assert out.r_prim[0] < 1e-8


def test_batch_exponential_cones():
    """Batched solve with nonsymmetric cones: backtracking line searches
    and the scaling-strategy state machine under vmap."""
    from clarabel_tpu import ZeroConeT, ExponentialConeT

    rng = np.random.default_rng(5)
    B = 4
    # entropy-style problem: min -t s.t. (t, 1, x) in Kexp, x = c_i
    # => t <= log(x)
    nv = 2  # (x, t)
    cones = [ZeroConeT(1), ExponentialConeT()]
    Ps, qs, As, bs = [], [], [], []
    cs = rng.uniform(0.5, 3.0, B)
    for i in range(B):
        Ps.append(np.zeros((nv, nv)))
        qs.append(np.array([0.0, -1.0]))
        A = np.zeros((4, nv))
        A[0, 0] = 1.0          # x = c
        A[1, 1] = -1.0         # s1 = t
        # s2 = 1, s3 = x
        A[3, 0] = -1.0
        b = np.array([cs[i], 0.0, 1.0, 0.0])
        As.append(A)
        bs.append(b)

    bs_solver = BatchSolver(cones, nv)
    out = bs_solver.solve(np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs))
    assert out.all_solved
    assert np.allclose(out.x[:, 1], np.log(cs), atol=1e-6)


def test_batch_rescue_pass():
    """Two-phase batch: lanes that fail the fast pass are re-solved with
    the accurate configuration (VERDICT r1 #3 — all lanes must reach
    SOLVED at full 1e-8 tolerances)."""
    rng = np.random.default_rng(11)
    B, n = 8, 6
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    probs = [make_random_socp(rng, n) for _ in range(B)]
    P = np.stack([p[0] for p in probs])
    q = np.stack([p[1] for p in probs])
    A = np.stack([p[2] for p in probs])
    b = np.stack([p[3] for p in probs])

    # cripple the fast pass so some lanes end MAX_ITERATIONS/ALMOST, then
    # let the rescue pass (full settings) pick them up
    bs = BatchSolver(cones, n, Settings(max_iter=2), rescue="cpu",
                     rescue_settings=Settings())
    out = bs.solve(P, q, A, b)
    assert out.all_solved
    assert np.all(out.r_prim < 1e-8) and np.all(out.r_dual < 1e-8)
    # rescued lanes agree with the single-instance solver
    sol0 = Solver(*probs[0], cones).solve()
    assert np.linalg.norm(out.x[0] - sol0.x) < 1e-6

    # rescue with nothing to do is a no-op
    bs2 = BatchSolver(cones, n, rescue="cpu")
    out2 = bs2.solve(P, q, A, b)
    assert out2.all_solved


def test_auto_backend_routing_cpu():
    """BatchSolver auto resolves to the fused megakernel only on TPU
    sessions; CPU sessions (this suite) keep the condensed XLA path —
    the kernel's CPU execution is the AOT correctness path, not a
    speed path (parallel/batch_impl.py round 3)."""
    from clarabel_tpu.parallel.batch_impl import BatchSolver as BS
    from clarabel_tpu import NonnegativeConeT, SecondOrderConeT, Settings

    bs = BS([NonnegativeConeT(2), SecondOrderConeT(2)], 2, Settings())
    assert bs._mega_fn is None  # cpu: auto != megakernel
    bs2 = BS([NonnegativeConeT(2), SecondOrderConeT(2)], 2,
             Settings(kkt_backend="megakernel"))
    assert bs2._mega_fn is not None  # explicit request always honored
