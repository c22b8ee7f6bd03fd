"""Multilevel nested-dissection (multifrontal) KKT backend tests.

Covers the symbolic plan (structure_nd.py), the level-synchronous
numeric factorization (kkt/multifrontal.py), the map-based sparse
assembly (kkt/assembly_maps_nd.py), and end-to-end solves on
grid-structured QPs — the problem class whose single-level separator is
too large for the block-arrow backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clarabel_tpu import Solver, Settings, NonnegativeConeT
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.settings import Settings as _Settings
from clarabel_tpu.structure_nd import analyze_nested_dissection
from clarabel_tpu.kkt import multifrontal as mf


def grid_qp(g, seed=0):
    """2D grid-Laplacian QP: min ½xᵀPx + qᵀx s.t. x ≥ 0."""
    rng = np.random.default_rng(seed)
    n = g * g
    P = np.zeros((n, n))

    def idx(i, j):
        return i * g + j

    for i in range(g):
        for j in range(g):
            P[idx(i, j), idx(i, j)] = 4.0 + rng.uniform(0.5, 1.5)
            for di, dj in ((0, 1), (1, 0)):
                if i + di < g and j + dj < g:
                    P[idx(i, j), idx(i + di, j + dj)] = -1.0
                    P[idx(i + di, j + dj), idx(i, j)] = -1.0
    q = rng.standard_normal(n)
    A = -np.eye(n)
    b = np.zeros(n)
    return P, q, A, b, [NonnegativeConeT(n)]


def test_plan_invariants():
    P, q, A, b, cones = grid_qp(12)
    n = len(q)
    layout = ConeLayout(cones)
    plan = analyze_nested_dissection(P != 0, A != 0, layout, depth=3,
                                     min_block=4)
    assert plan is not None
    N = 2 * n
    # every KKT row owned exactly once
    seen = np.zeros(N, dtype=int)
    for lv in plan.levels:
        for i in range(lv.cnt):
            rr = lv.rows_idx[i]
            seen[rr[rr < N]] += 1
    assert np.all(seen == 1)
    # up_pos maps each boundary row onto the same row in the parent front
    for li in range(1, len(plan.levels)):
        lv = plan.levels[li]
        par = plan.levels[li - 1]
        for i in range(lv.cnt):
            pfront = np.concatenate(
                [par.rows_idx[i // 2], par.bnd_idx[i // 2]]
            )
            for j in range(lv.nbd):
                r = lv.bnd_idx[i, j]
                if r >= N:
                    continue
                u = lv.up_pos[i, j]
                assert u < par.f
                assert pfront[u] == r


def test_factor_solve_matches_dense():
    P, q, A, b, cones = grid_qp(12, seed=1)
    n = len(q)
    m = n
    layout = ConeLayout(cones)
    rng = np.random.default_rng(2)
    settings = _Settings()
    signs = jnp.asarray(np.concatenate([np.ones(n), -np.ones(m)]))
    Hs = np.diag(rng.uniform(0.5, 2.0, m))
    K = np.block([[P, A.T], [A, -Hs]])
    eps = (settings.static_regularization_constant
           + settings.static_regularization_proportional
           * np.max(np.abs(np.diag(K))))
    Kreg = K + np.diag(np.asarray(signs)) * eps
    rhs = rng.standard_normal(n + m)
    xref = np.linalg.solve(Kreg, rhs)

    for depth in (2, 3):
        plan = analyze_nested_dissection(P != 0, A != 0, layout,
                                         depth=depth, min_block=4)
        assert plan is not None
        fac = mf.assemble_and_factor_multifrontal(
            jnp.asarray(P), jnp.asarray(A), jnp.asarray(Hs), plan, signs,
            settings, jnp.float64,
        )
        assert bool(fac.ok)
        x = np.asarray(mf._mf_apply(fac, plan, jnp.asarray(rhs)))
        err = np.abs(x - xref).max() / np.abs(xref).max()
        assert err < 1e-10
        # multi-RHS
        R = rng.standard_normal((n + m, 2))
        X = np.asarray(mf._mf_apply(fac, plan, jnp.asarray(R)))
        assert np.abs(X - np.linalg.solve(Kreg, R)).max() < 1e-8


def test_sparse_map_assembly_matches_dense_fronts():
    import scipy.sparse as sp

    from clarabel_tpu.kkt.assembly_maps_nd import (
        build_nested_assembly_maps, factor_from_nested_maps,
    )

    P, q, A, b, cones = grid_qp(10, seed=3)
    n = len(q)
    m = n
    layout = ConeLayout(cones)
    rng = np.random.default_rng(4)
    settings = _Settings()
    plan = analyze_nested_dissection(P != 0, A != 0, layout, depth=2,
                                     min_block=4)
    assert plan is not None

    Pc = sp.coo_matrix(P)
    Ac = sp.coo_matrix(A)
    maps = build_nested_assembly_maps(
        (Pc.row, Pc.col), (Ac.row, Ac.col), layout, plan
    )
    hs = rng.uniform(0.5, 2.0, m)
    fac = factor_from_nested_maps(
        maps, jnp.asarray(Pc.data), jnp.asarray(Ac.data), jnp.asarray(hs),
        settings, jnp.float64,
    )
    assert bool(fac.ok)

    signs = jnp.asarray(np.concatenate([np.ones(n), -np.ones(m)]))
    Hs = np.diag(hs)
    K = np.block([[P, A.T], [A, -Hs]])
    eps = (settings.static_regularization_constant
           + settings.static_regularization_proportional
           * np.max(np.abs(np.diag(K))))
    Kreg = K + np.diag(np.asarray(signs)) * eps
    rhs = rng.standard_normal(n + m)
    x = np.asarray(mf._mf_apply(fac, plan, jnp.asarray(rhs)))
    xref = np.linalg.solve(Kreg, rhs)
    assert np.abs(x - xref).max() / np.abs(xref).max() < 1e-10


def test_end_to_end_grid_qp_dense_path():
    P, q, A, b, cones = grid_qp(17, seed=5)  # n+m = 578: force backend
    s_mf = Solver(P, q, A, b, cones,
                  settings=Settings(kkt_backend="multifrontal",
                                    verbose=False))
    from clarabel_tpu.structure_nd import NestedPlan

    assert isinstance(s_mf._structure, NestedPlan)
    sol_mf = s_mf.solve()
    s_ldl = Solver(P, q, A, b, cones,
                   settings=Settings(kkt_backend="ldl", verbose=False))
    sol_ldl = s_ldl.solve()
    assert sol_mf.status == 1
    assert sol_ldl.status == 1
    assert np.abs(np.asarray(sol_mf.x) - np.asarray(sol_ldl.x)).max() < 1e-6


def test_end_to_end_grid_qp_sparse_mode():
    import scipy.sparse as sp

    P, q, A, b, cones = grid_qp(16, seed=6)
    s = Solver(sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones,
               settings=Settings(sparse_data=True,
                                 kkt_backend="multifrontal",
                                 verbose=False))
    assert s._sparse_mode
    from clarabel_tpu.structure_nd import NestedPlan

    assert isinstance(s._structure, NestedPlan)
    sol = s.solve()
    assert sol.status == 1

    s_ref = Solver(P, q, A, b, cones,
                   settings=Settings(kkt_backend="ldl", verbose=False))
    sol_ref = s_ref.solve()
    assert np.abs(np.asarray(sol.x) - np.asarray(sol_ref.x)).max() < 1e-6


def test_auto_selects_multifrontal_for_grid():
    # n+m = 2*24*24 = 1152 > 1024: auto probes structure; the grid's
    # single-level separator is large so nested dissection should win
    P, q, A, b, cones = grid_qp(24, seed=7)
    s = Solver(P, q, A, b, cones, settings=Settings(verbose=False))
    from clarabel_tpu.structure_nd import NestedPlan

    assert s._backend in ("multifrontal", "blockarrow")
    if s._backend == "multifrontal":
        assert isinstance(s._structure, NestedPlan)
