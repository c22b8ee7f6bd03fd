"""Remaining tier-1/tier-2 test classes: unconstrained problems, SOCP
lasso, equilibration bounds, cone collapsing, JSON round-trip.

Mirrors reference: test/OptTests/basic_unconstrained.jl, socp-lasso.jl,
test/UnitTests/test_equilibration_bounds.jl, test_cones_new_collapsed.jl,
test_json.jl.
"""

import os
import tempfile

import numpy as np
import pytest

from clarabel_tpu import (
    Solver, Settings, SolverStatus,
    ZeroConeT, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
    ExponentialConeT, save_to_file, load_from_file,
)
from clarabel_tpu.cones.api import cones_collapse


def test_unconstrained_feasible():
    # reference: basic_unconstrained.jl:15-28
    P = np.eye(3)
    q = np.array([1.0, 2.0, -3.0])
    A = np.zeros((0, 3))
    b = np.zeros(0)
    sol = Solver(P, q, A, b, []).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - (-q)) < 1e-6


def test_unconstrained_dual_infeasible():
    # reference: basic_unconstrained.jl:30-43
    P = np.eye(3)
    P[0, 0] = 0.0
    q = np.array([1.0, 0.0, 0.0])
    sol = Solver(P, q, np.zeros((0, 3)), np.zeros(0), []).solve()
    assert sol.status == SolverStatus.DUAL_INFEASIBLE


def socp_lasso_data(n=8, factor=10):
    """reference: socp-lasso.jl:6-55 (same structure, numpy-generated data)"""
    rng = np.random.default_rng(12345)
    m = factor * n
    F = rng.random((m, n))
    vtrue = np.zeros(n)
    nzidx = rng.random(n) < 0.2
    vtrue[nzidx] = rng.random(nzidx.sum())
    noise = 0.1 * rng.random(m)
    bb = F @ vtrue + noise
    mu = 0.1 * np.abs(F.T @ bb).max()

    nv = 1 + 2 * n + 2 + m  # (t, x, u, v, w, residual block)
    A1 = -np.block([
        [np.ones((1, 1)), np.zeros((1, 2 * n + 1)), np.ones((1, 1)), np.zeros((1, m))],
        [-np.ones((1, 1)), np.zeros((1, 2 * n)), np.ones((1, 1)), np.zeros((1, m + 1))],
        [np.zeros((m, 1)), -2 * F, np.zeros((m, n + 2)), np.eye(m)],
    ])
    A2 = -np.block([
        [np.zeros((n, 1)), np.eye(n), -np.eye(n), np.zeros((n, m + 2))],
        [np.zeros((n, 1)), -np.eye(n), -np.eye(n), np.zeros((n, m + 2))],
    ])
    A3 = -np.block([
        [np.zeros((1, 2 * n + 1)), -np.ones((1, 1)), np.zeros((1, m + 1))],
        [np.zeros((1, 2 * n + 2)), -np.ones((1, 1)), np.zeros((1, m))],
        [np.zeros((m, 2 * n + 3)), -np.eye(m)],
    ])
    b1 = np.concatenate([[1.0, 1.0], -2 * bb])
    b2 = np.zeros(2 * n)
    b3 = np.zeros(m + 2)
    q = np.concatenate([[1.0], np.zeros(n), mu * np.ones(n), np.zeros(m + 2)])
    P = np.eye(nv)
    A = np.vstack([A1, A2, A3])
    b = np.concatenate([b1, b2, b3])
    cones = [
        NonnegativeConeT(len(b1)),
        NonnegativeConeT(len(b2)),
        SecondOrderConeT(len(b3)),
    ]
    return P, q, A, b, cones


def test_socp_lasso():
    P, q, A, b, cones = socp_lasso_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
    assert abs(sol.obj_val - sol.obj_val_dual) < 1e-6


def test_equilibration_bounds():
    """Scalings stay within [min_scaling, max_scaling] under pathological P.
    reference: test_equilibration_bounds.jl:28-44"""
    import jax.numpy as jnp
    from clarabel_tpu.cones.layout import ConeLayout
    from clarabel_tpu.ipm.equilibration import ruiz_equilibrate

    P = np.array([[1e-15, 1.0], [1.0, 2.0]])
    P = np.triu(P) + np.triu(P, 1).T
    q = np.array([1.0, 1.0])
    A0 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A0, A0])
    b = np.concatenate([-np.array([1.0, 0, 0]), np.array([1.0, 0.7, 0.7])])
    cones = [NonnegativeConeT(3), NonnegativeConeT(3)]
    layout = ConeLayout(cones)
    settings = Settings()

    _, _, _, _, equil = ruiz_equilibrate(
        layout, settings, jnp.asarray(P), jnp.asarray(A),
        jnp.asarray(q), jnp.asarray(b),
    )
    d, e = np.asarray(equil.d), np.asarray(equil.e)
    assert d.min() >= settings.equilibrate_min_scaling
    assert e.min() >= settings.equilibrate_min_scaling
    assert d.max() <= settings.equilibrate_max_scaling
    assert e.max() <= settings.equilibrate_max_scaling


def test_cone_collapse():
    """reference: test/UnitTests/test_cones_new_collapsed.jl"""
    cones = [
        NonnegativeConeT(2),
        SecondOrderConeT(1),
        PSDTriangleConeT(1),
        NonnegativeConeT(3),
        SecondOrderConeT(3),
        ZeroConeT(0),
        NonnegativeConeT(1),
    ]
    out = cones_collapse(cones)
    assert out == [
        NonnegativeConeT(7),
        SecondOrderConeT(3),
        NonnegativeConeT(1),
    ]
    # empty cones dropped entirely
    assert cones_collapse([ZeroConeT(0), NonnegativeConeT(0)]) == [
        NonnegativeConeT(0)
    ] or cones_collapse([ZeroConeT(0)]) == []


def test_json_roundtrip():
    """reference: test/UnitTests/test_json.jl"""
    from fixtures import basic_socp_data

    P, q, A, b, cones = basic_socp_data()
    s1 = Solver(P, q, A, b, cones)
    sol1 = s1.solve()

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        path = f.name
    try:
        save_to_file(s1, path)
        s2 = load_from_file(path)
        sol2 = s2.solve()
        assert sol2.status == sol1.status
        assert np.linalg.norm(sol1.x - sol2.x) < 1e-10
    finally:
        os.unlink(path)


def test_chol_blocked_unrolled():
    """Trace-time-unrolled blocked Cholesky matches numpy for sizes
    spanning multiple panels, f32 and f64, and under vmap."""
    import jax
    import jax.numpy as jnp
    from clarabel_tpu.linalg.smallops import chol_blocked_unrolled

    rng = np.random.default_rng(3)
    for n in (5, 96, 130, 300):
        F = rng.standard_normal((n, n))
        S = F @ F.T + n * np.eye(n)
        L = np.asarray(jax.jit(chol_blocked_unrolled)(jnp.asarray(S)))
        Lref = np.linalg.cholesky(S)
        assert np.max(np.abs(L - Lref)) < 1e-9 * n

    # f32
    n = 70
    F = rng.standard_normal((n, n)).astype(np.float32)
    S = F @ F.T + n * np.eye(n, dtype=np.float32)
    L = np.asarray(chol_blocked_unrolled(jnp.asarray(S)))
    assert np.max(np.abs(L @ L.T - S)) < 1e-3

    # vmap
    B, n = 4, 40
    Fs = rng.standard_normal((B, n, n))
    Ss = np.einsum("bij,bkj->bik", Fs, Fs) + n * np.eye(n)
    Ls = np.asarray(jax.vmap(chol_blocked_unrolled)(jnp.asarray(Ss)))
    for i in range(B):
        assert np.max(np.abs(Ls[i] - np.linalg.cholesky(Ss[i]))) < 1e-8

    # indefinite input propagates NaN (callers check finiteness)
    bad = np.eye(8); bad[5, 5] = -1.0
    Lb = np.asarray(chol_blocked_unrolled(jnp.asarray(bad)))
    assert not np.all(np.isfinite(Lb))


def test_ldl_factor_unrolled_matches_loop():
    """Unrolled-panel LDL must match the fori-loop factor bit-for-bit in
    structure: same L, d (incl. dynamic regularization), same ok flag."""
    import jax
    import jax.numpy as jnp
    from clarabel_tpu.linalg.ldl import ldl_factor, ldl_factor_unrolled

    rng = np.random.default_rng(11)
    for n in (8, 130, 260):
        nn = n // 2
        signs = np.concatenate([np.ones(n - nn), -np.ones(nn)])
        F = rng.standard_normal((n, n))
        K = F + F.T + np.diag(signs * 2.0 * n)
        L1, d1, ok1 = ldl_factor(jnp.asarray(K), jnp.asarray(signs))
        L2, d2, ok2 = ldl_factor_unrolled(jnp.asarray(K), jnp.asarray(signs))
        assert bool(ok1) and bool(ok2)
        assert np.max(np.abs(np.asarray(L1) - np.asarray(L2))) < 1e-10
        assert np.max(np.abs(np.asarray(d1) - np.asarray(d2))) < 1e-9 * n

    # dynamic regularization clamps a wrong-sign pivot identically
    n = 12
    signs = np.ones(n)
    K = np.eye(n)
    K[5, 5] = -1e-20
    _, d1, _ = ldl_factor(jnp.asarray(K), jnp.asarray(signs))
    _, d2, _ = ldl_factor_unrolled(jnp.asarray(K), jnp.asarray(signs))
    assert np.allclose(np.asarray(d1), np.asarray(d2))
    assert np.asarray(d2)[5] == 2e-7


def test_layout_key_distinguishes_cone_order():
    """Same cone multiset in different order must NOT share a compiled
    program: the row maps baked into the executable differ.  Regression
    for a shape-only ConeLayout.key (caught via test_cbf_reader: the
    second solve returned the first problem's row mapping)."""
    import numpy as np
    from clarabel_tpu import Solver, ZeroConeT, NonnegativeConeT
    from clarabel_tpu.cones.layout import ConeLayout

    k1 = ConeLayout([ZeroConeT(2), NonnegativeConeT(3)]).key
    k2 = ConeLayout([NonnegativeConeT(3), ZeroConeT(2)]).key
    assert k1 != k2

    # end-to-end: solve both orders back-to-back, check both optima
    rng = np.random.default_rng(0)
    n = 4
    P = np.eye(n)
    q = rng.standard_normal(n)
    Aeq = rng.standard_normal((2, n))
    beq = rng.standard_normal(2)
    Aub = np.vstack([np.eye(n)[:3]])
    bub = np.ones(3) * 2

    A1 = np.vstack([Aeq, Aub])
    b1 = np.concatenate([beq, bub])
    s1 = Solver(P, q, A1, b1, [ZeroConeT(2), NonnegativeConeT(3)]).solve()

    A2 = np.vstack([Aub, Aeq])
    b2 = np.concatenate([bub, beq])
    s2 = Solver(P, q, A2, b2, [NonnegativeConeT(3), ZeroConeT(2)]).solve()

    assert s1.status.name == "SOLVED" and s2.status.name == "SOLVED"
    assert np.linalg.norm(s1.x - s2.x) < 1e-8  # same problem, same optimum
    assert np.max(np.abs(A1 @ s1.x + s1.s - b1)) < 1e-8
    assert np.max(np.abs(A2 @ s2.x + s2.s - b2)) < 1e-8


def test_protocols_realized():
    """The structural protocols are actually satisfied by the concrete
    components (reference: abstract_types.jl contract role)."""
    import numpy as np
    from clarabel_tpu import Solver, BatchSolver, NonnegativeConeT
    from clarabel_tpu.protocols import SolverLike, SolutionLike, InfoLike

    P = np.eye(2)
    q = np.ones(2)
    A = -np.eye(2)
    b = np.ones(2)
    s = Solver(P, q, A, b, [NonnegativeConeT(2)])
    assert isinstance(s, SolverLike)
    sol = s.solve()
    assert isinstance(sol, SolutionLike)
    assert isinstance(s.get_info(), InfoLike)
    assert isinstance(BatchSolver([NonnegativeConeT(2)], 2), SolverLike)
