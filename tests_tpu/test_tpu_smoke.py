"""On-TPU smoke suite: one solve per cone family + the round-1 hazards."""

import numpy as np
import pytest

from clarabel_tpu import (
    Solver, Settings, SolverStatus, BatchSolver,
    ZeroConeT, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
    ExponentialConeT, PowerConeT,
)


def _check(sol, tol=1e-7):
    assert sol.status == SolverStatus.SOLVED, sol.status
    assert sol.r_prim < tol and sol.r_dual < tol


def test_qp_on_tpu():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.ones(2)
    A = np.vstack([np.eye(2), -np.eye(2)])
    b = np.array([1.0, 1.0, 0.0, 0.0])
    _check(Solver(P, q, A, b, [NonnegativeConeT(4)]).solve())


def test_socp_on_tpu():
    rng = np.random.default_rng(0)
    n = 6
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([[2.0], np.zeros(n)])
    _check(Solver(P, q, A, b, [SecondOrderConeT(n + 1)]).solve())


def test_equality_qp_on_tpu():
    """Zero cone: the f32-front overflow hazard class."""
    rng = np.random.default_rng(1)
    n = 8
    P = np.diag(rng.uniform(1, 2, n))
    q = rng.standard_normal(n)
    A = rng.standard_normal((3, n))
    b = rng.standard_normal(3)
    _check(Solver(P, q, A, b, [ZeroConeT(3)]).solve())


def test_exp_cone_on_tpu():
    """exp/pow need the closed-form 3x3 solves (no f64 TPU lowering for
    jnp.linalg.solve — STATUS.md).

    min z s.t. (1, 1, z) ∈ K_exp  ⇒  z* = e (y·e^{x/y} ≤ z at x=y=1);
    max z is unbounded (dual infeasible)."""
    A_ = np.array([[0.0], [0.0], [-1.0]])
    b_ = np.array([1.0, 1.0, 0.0])
    sol_max = Solver(np.zeros((1, 1)), np.array([-1.0]), A_, b_,
                     [ExponentialConeT()], Settings(max_iter=100)).solve()
    assert sol_max.status in (SolverStatus.DUAL_INFEASIBLE,
                              SolverStatus.ALMOST_DUAL_INFEASIBLE)
    sol = Solver(np.zeros((1, 1)), np.array([1.0]), A_, b_,
                 [ExponentialConeT()]).solve()
    _check(sol, tol=1e-6)
    assert abs(sol.x[0] - np.e) < 1e-5


def test_pow_cone_on_tpu():
    # max x3 s.t. x1=2, x2=1 in PowerCone(0.6): x3* = 2^0.6
    A_ = np.array([[0.0], [0.0], [-1.0]])
    b_ = np.array([2.0, 1.0, 0.0])
    q_ = np.array([1.0])
    sol = Solver(np.zeros((1, 1)), q_, A_, b_, [PowerConeT(0.6)]).solve()
    _check(sol, tol=1e-6)
    assert abs(sol.x[0] + 2 ** 0.6) < 1e-5


def test_small_sdp_on_tpu():
    """PSD cone incl. the batched-eigvalsh NaN guard (closed-form n<=3
    eigenvalues — STATUS.md round-1 hazard)."""
    # min tr(CX) s.t. diag(X) = 1, X psd (n=3) — tiny max-cut relaxation
    rng = np.random.default_rng(2)
    C = rng.standard_normal((3, 3))
    C = (C + C.T) / 2
    t = 6  # svec dim
    sv = np.sqrt(2.0)

    def svec(M):
        out = []
        for j in range(3):
            for i in range(j + 1):
                out.append(M[i, j] * (1.0 if i == j else sv))
        return np.asarray(out)

    n = t
    P = np.zeros((n, n))
    q = svec(C)
    # diag(X)=1 rows: pick svec entries 0, 2, 5
    diag_idx = [0, 2, 5]
    Aeq = np.zeros((3, n))
    for r, k in enumerate(diag_idx):
        Aeq[r, k] = 1.0
    beq = np.ones(3)
    A = np.vstack([Aeq, -np.eye(n)])
    b = np.concatenate([beq, np.zeros(n)])
    cones = [ZeroConeT(3), PSDTriangleConeT(3)]
    sol = Solver(P, q, A, b, cones).solve()
    _check(sol, tol=1e-6)


def test_batched_socp_with_rescue_on_tpu():
    """Batched path at 1e-8 with the CPU rescue: every lane must solve."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_batch

    n = 6
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    bs = BatchSolver(cones, n, Settings(kkt_backend="condensed"),
                     rescue="cpu")
    out = bs.solve(*make_batch(256, n, seed=5))
    assert out.all_solved
    assert np.all(out.r_prim < 1e-8)


def test_pallas_kernel_matches_loop_factor():
    """Lane-batched Pallas factor+inverse vs the loop LDL (f32) — guards
    the Mosaic legalization + batching-rule hazards from round 1."""
    import jax
    import jax.numpy as jnp
    from clarabel_tpu.linalg import pallas_ldl
    from clarabel_tpu.linalg.ldl import ldl_factor, ldl_solve

    rng = np.random.default_rng(3)
    B, nk = pallas_ldl.LANE_BATCH * 2, 19
    signs = np.concatenate([np.ones(10), -np.ones(9)]).astype(np.float32)
    Ks = []
    for _ in range(B):
        M = rng.standard_normal((nk, nk)).astype(np.float32)
        K = (M + M.T) / 2 + np.diag(signs * (nk + 5.0))
        Ks.append(K)
    Ks = np.stack(Ks)

    interpret = jax.default_backend() == "cpu"  # TPU_TIER_ON_CPU check
    Linv, d, ok = jax.jit(
        lambda K, s: pallas_ldl.batched_ldl_inverse(K, s,
                                                    interpret=interpret)
    )(jnp.asarray(Ks), jnp.asarray(signs))
    assert bool(jnp.all(ok))

    L_ref, d_ref, okr = jax.vmap(
        lambda K: ldl_factor(K, jnp.asarray(signs, jnp.float32))
    )(jnp.asarray(Ks))
    x = jnp.asarray(rng.standard_normal((B, nk)).astype(np.float32))
    y_ref = jax.vmap(ldl_solve)(L_ref, d_ref, x)
    # kernel solve: y = Linv' (d^-1 (Linv x))
    u = jnp.einsum("bij,bj->bi", Linv, x) / d
    y_ker = jnp.einsum("bji,bj->bi", Linv, u)
    err = np.max(np.abs(np.asarray(y_ker) - np.asarray(y_ref)))
    assert err < 1e-2, err


def test_mixed_precision_path_on_tpu():
    rng = np.random.default_rng(4)
    n = 6
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = np.vstack([np.zeros((1, n)), -np.eye(n)])
    b = np.concatenate([[2.0], np.zeros(n)])
    sol = Solver(P, q, A, b, [SecondOrderConeT(n + 1)],
                 Settings(mixed_precision=True)).solve()
    _check(sol, tol=1e-7)
