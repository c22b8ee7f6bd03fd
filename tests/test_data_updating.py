"""Data updating tests (reference: test/OptTests/data_updating.jl)."""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus, NonnegativeConeT

from fixtures import basic_qp_data


def _updating_settings():
    # presolve must be off for updates (reference requires it inactive)
    return Settings(presolve_enable=False)


def test_update_b_resolve():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    sol1 = s.solve()
    assert sol1.status == SolverStatus.SOLVED

    # update b and check against a freshly built solver
    b2 = b * 0.9
    s.update_b(b2)
    sol2 = s.solve()
    fresh = Solver(P, q, A, b2, cones, _updating_settings()).solve()
    assert sol2.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol2.x - fresh.x) < 1e-8
    assert abs(sol2.obj_val - fresh.obj_val) < 1e-8


def test_update_q_and_P_resolve():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()

    q2 = q + np.array([0.5, -0.2])
    P2 = P * 2.0
    s.update_data(P=P2, q=q2)
    sol = s.solve()
    fresh = Solver(P2, q2, A, b, cones, _updating_settings()).solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8


def test_update_partial_indices():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()

    s.update_b(([0], [-0.9]))
    b2 = b.copy()
    b2[0] = -0.9
    fresh = Solver(P, q, A, b2, cones, _updating_settings()).solve()
    sol = s.solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8


def test_update_rejected_with_presolve():
    P, q, A, b, cones = basic_qp_data()
    b = b.copy()
    b[1] = 1e25  # triggers presolve row elimination
    s = Solver(P, q, A, b, cones, Settings(presolve_enable=True))
    assert s.presolver is not None
    assert not s.is_data_update_allowed()
    with pytest.raises(ValueError, match="presolver"):
        s.update_b(np.zeros(s.presolver.m_full))


def test_update_dimension_mismatch():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    with pytest.raises(ValueError):
        s.update_q(np.zeros(5))
    with pytest.raises(ValueError):
        s.update_A(np.zeros((2, 2)))


# ---------------------------------------------------------------------------
# Expanded form-matrix coverage (reference: test/OptTests/data_updating.jl
# exercises full-matrix, nzval-vector, and (index,value) zip forms for every
# updatable term, plus consistency of equilibrated re-solves).
# ---------------------------------------------------------------------------


def test_update_A_full_matrix_and_triplets():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()

    A2 = A.copy()
    A2[0, 0] *= 1.5
    s.update_A(A2)
    sol = s.solve()
    fresh = Solver(P, q, A2, b, cones, _updating_settings()).solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8

    # triplet form on top of the full-matrix update
    A3 = A2.copy()
    A3[1, 1] = -0.5
    s.update_A(([1], [1], [-0.5]))
    sol3 = s.solve()
    fresh3 = Solver(P, q, A3, b, cones, _updating_settings()).solve()
    assert np.linalg.norm(sol3.x - fresh3.x) < 1e-8


def test_update_q_zip_form():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()
    s.update_q(([1], [3.0]))
    q2 = q.copy()
    q2[1] = 3.0
    fresh = Solver(P, q2, A, b, cones, _updating_settings()).solve()
    sol = s.solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8


def test_update_equilibration_consistency():
    """Updates must give bit-comparable answers to a fresh solver even
    when the update changes the natural equilibration scalings by orders
    of magnitude (we recompute equilibration in-graph per solve; the
    reference re-applies frozen scalings — both must produce the same
    optimum)."""
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    s.solve()
    P2 = P * 1e4
    q2 = q * 1e4   # same optimum as original x
    s.update_data(P=P2, q=q2)
    sol = s.solve()
    fresh = Solver(P2, q2, A, b, cones, _updating_settings()).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - fresh.x) < 1e-8
    base = Solver(P, q, A, b, cones, _updating_settings()).solve()
    assert np.linalg.norm(sol.x - base.x) < 1e-6  # same argmin


def test_update_roundtrip_idempotent():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, _updating_settings())
    sol0 = s.solve()
    s.update_data(P=P * 3.0, q=q + 1.0, b=b * 0.5)
    s.solve()
    s.update_data(P=P, q=q, b=b)
    sol1 = s.solve()
    assert np.linalg.norm(sol0.x - sol1.x) < 1e-9
    assert abs(sol0.obj_val - sol1.obj_val) < 1e-9


def test_update_sparse_mode_forms():
    """Sparse mode: same-pattern matrix, CSC nzval vector (the
    reference's native form), and triplet updates; out-of-pattern
    entries rejected."""
    import scipy.sparse as sp
    from test_blockarrow_backend import banded_qp

    P, q, A, b, cones = banded_qp(grid=30, seed=9)
    Psp, Asp = sp.csr_matrix(P), sp.csr_matrix(A)
    s = Solver(Psp, q, Asp, b, cones,
               Settings(sparse_data=True, presolve_enable=False))
    assert s._sparse_mode
    s.solve()

    # (a) same-pattern matrix update
    P2 = (Psp * 2.0).tocsr()
    s.update_P(P2)
    sol = s.solve()
    fresh = Solver(P2, q, Asp, b, cones,
                   Settings(sparse_data=True, presolve_enable=False)).solve()
    assert np.linalg.norm(sol.x - fresh.x) < 1e-7

    # (b) CSC triu nzval vector form
    triu2 = sp.triu(P2 * 1.5).tocsc()
    s.update_P(np.asarray(triu2.data))
    sol_b = s.solve()
    fresh_b = Solver((P2 * 1.5), q, Asp, b, cones,
                     Settings(sparse_data=True,
                              presolve_enable=False)).solve()
    assert np.linalg.norm(sol_b.x - fresh_b.x) < 1e-7

    # (c) triplet form into the A pattern
    r0, c0 = Asp.nonzero()[0][0], Asp.nonzero()[1][0]
    Anew = Asp.copy().tolil()
    Anew[r0, c0] = 7.5
    s.update_A(([r0], [c0], [7.5]))
    sol_c = s.solve()
    fresh_c = Solver((P2 * 1.5), q, Anew.tocsr(), b, cones,
                     Settings(sparse_data=True,
                              presolve_enable=False)).solve()
    assert np.linalg.norm(sol_c.x - fresh_c.x) < 1e-7

    # (d) out-of-pattern entries rejected
    zr, zc = np.nonzero(P == 0)
    with pytest.raises(ValueError, match="pattern"):
        s.update_P(([int(zr[0])], [int(zc[-1])], [1.0]))


def test_update_rejected_with_chordal():
    """Chordal-decomposed problems refuse data updates (reference:
    src/data_updating.jl:149-158)."""
    from clarabel_tpu import PSDTriangleConeT, ZeroConeT

    # arrow-sparsity SDP large enough for chordal decomposition
    nside = 8
    t = nside * (nside + 1) // 2
    rng = np.random.default_rng(0)
    C = np.zeros((nside, nside))
    C[0, :] = rng.standard_normal(nside)
    C = (C + C.T) / 2
    np.fill_diagonal(C, np.arange(1, nside + 1.0))

    def svec(M):
        out = []
        for j in range(nside):
            for i in range(j + 1):
                out.append(M[i, j] * (1.0 if i == j else np.sqrt(2.0)))
        return np.asarray(out)

    q = svec(C)
    diag_pos = [j * (j + 1) // 2 + j for j in range(nside)]
    Aeq = np.zeros((nside, t))
    for r, k in enumerate(diag_pos):
        Aeq[r, k] = 1.0
    A = np.vstack([Aeq, -np.eye(t)])
    b = np.concatenate([np.ones(nside), np.zeros(t)])
    cones = [ZeroConeT(nside), PSDTriangleConeT(nside)]
    s = Solver(np.zeros((t, t)), q, A, b, cones,
               Settings(presolve_enable=False))
    if s.chordal_info is None:
        pytest.skip("pattern not chordally decomposed")
    assert not s.is_data_update_allowed()
    with pytest.raises(ValueError, match="chordal"):
        s.update_b(b)
