"""Sparse data mode: COO end-to-end with map-based block-arrow assembly.

Solutions must match the dense path exactly (same algorithm, different
data representation)."""

import numpy as np
import pytest
import scipy.sparse as sp

from clarabel_tpu import Solver, Settings, SolverStatus

from test_blockarrow_backend import banded_qp


def test_sparse_mode_matches_dense():
    P, q, A, b, cones = banded_qp(grid=20)
    sol_dense = Solver(P, q, A, b, cones).solve()

    s_sparse = Solver(
        sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones,
        Settings(sparse_data=True),
    )
    assert getattr(s_sparse, "_sparse_mode", False), "sparse mode not engaged"
    sol_sparse = s_sparse.solve()
    assert sol_sparse.status == SolverStatus.SOLVED == sol_dense.status
    assert np.linalg.norm(sol_sparse.x - sol_dense.x) < 1e-7
    assert sol_sparse.r_prim < 1e-8 and sol_sparse.r_dual < 1e-8


def test_sparse_mode_auto_threshold():
    """Auto mode engages for large scipy-sparse inputs with structure."""
    P, q, A, b, cones = banded_qp(grid=400)  # N = 2800 > 2000
    s = Solver(sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones)
    assert getattr(s, "_sparse_mode", False)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8


def test_sparse_mode_dense_fallback():
    """Unstructured sparse input falls back to the dense path."""
    rng = np.random.default_rng(0)
    n = 30
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    A = np.vstack([rng.standard_normal((5, n)), -np.eye(n)])
    b = np.concatenate([A[:5] @ np.ones(n) + 1.0, np.ones(n) * 5])
    from clarabel_tpu import NonnegativeConeT

    s = Solver(
        sp.csr_matrix(P), q=rng.standard_normal(n), A=sp.csr_matrix(A), b=b,
        cones=[NonnegativeConeT(5 + n)], settings=Settings(sparse_data=True),
    )
    assert not getattr(s, "_sparse_mode", False)
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED


def test_sparse_mode_update_b_and_q():
    """Warm b/q updates in sparse mode match a fresh solve (reference:
    src/data_updating.jl vector updates)."""
    P, q, A, b, cones = banded_qp(grid=20)
    s = Solver(sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones,
               Settings(sparse_data=True, presolve_enable=False))
    assert s._sparse_mode
    s.solve()

    b2 = b * 0.9
    q2 = q + 0.25
    s.update_data(q=q2, b=b2)
    sol = s.solve()
    fresh = Solver(P, q2, A, b2, cones,
                   Settings(presolve_enable=False)).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - fresh.x) < 1e-7


def test_sparse_mode_update_P_and_A():
    """Matrix updates in sparse mode: nzval vector (CSC order, the
    reference's native form), triplets, and full same-pattern matrix."""
    P, q, A, b, cones = banded_qp(grid=20)
    settings = Settings(sparse_data=True, presolve_enable=False)
    s = Solver(sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones, settings)
    assert s._sparse_mode
    s.solve()

    # (a) full-matrix P update (same pattern, scaled values)
    P2 = 2.0 * P
    s.update_P(sp.csr_matrix(P2))
    # (b) nzval-vector A update: CSC nzvals of a scaled A
    A2 = 1.5 * A
    s.update_A(sp.csc_matrix(A2).data.astype(np.float64))
    sol = s.solve()
    fresh = Solver(P2, q, A2, b, cones,
                   Settings(presolve_enable=False)).solve()
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - fresh.x) < 1e-7

    # (c) triplet P update on existing diagonal entries
    s2 = Solver(sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones, settings)
    s2.solve()
    s2.update_P(([0, 1], [0, 1], [P[0, 0] * 3.0, P[1, 1] * 3.0]))
    P3 = P.copy()
    P3[0, 0] *= 3.0
    P3[1, 1] *= 3.0
    sol2 = s2.solve()
    fresh2 = Solver(P3, q, A, b, cones,
                    Settings(presolve_enable=False)).solve()
    assert np.linalg.norm(sol2.x - fresh2.x) < 1e-7

    # (d) entries outside the original pattern are rejected
    with pytest.raises(ValueError, match="pattern"):
        s2.update_A(([0], [s2.n - 1], [1.0]))
    # (e) lower-triangle P indices are rejected
    with pytest.raises(ValueError, match="upper triangle"):
        s2.update_P(([1], [0], [1.0]))


def test_sparse_mode_with_socs():
    """Sparse mode with mixed cones: the Hs assembly maps must place SOC
    dense blocks correctly."""
    rng = np.random.default_rng(4)
    grid = 30
    n = 2 * grid
    # banded QP base
    P, q, A, b, cones = banded_qp(grid=grid)
    # append a few small SOC constraints on local variable pairs
    soc_rows = []
    soc_bs = []
    from clarabel_tpu import SecondOrderConeT

    for k in range(4):
        j = 2 * (k * grid // 4)
        C = np.zeros((3, n))
        C[1, j] = 1.0
        C[2, j + 1] = 1.0
        soc_rows.append(-C)
        bvec = np.zeros(3)
        bvec[0] = 3.0
        soc_bs.append(bvec)
        cones = cones + [SecondOrderConeT(3)]
    A = np.vstack([A] + soc_rows)
    b = np.concatenate([b] + soc_bs)

    sol_dense = Solver(P, q, A, b, cones).solve()
    s_sp = Solver(sp.csr_matrix(P), q, sp.csr_matrix(A), b, cones,
                  Settings(sparse_data=True))
    assert s_sp._sparse_mode
    sol_sp = s_sp.solve()
    assert sol_sp.status == SolverStatus.SOLVED == sol_dense.status
    assert np.linalg.norm(sol_sp.x - sol_dense.x) < 1e-7


def test_empty_psd_cone_dropped():
    """reference: basic_sdp.jl 'empty SDP cone' case."""
    from clarabel_tpu import PSDTriangleConeT

    P = np.eye(6)
    q = np.zeros(6)
    A = np.eye(6)
    b = np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0])
    cones = [PSDTriangleConeT(3), PSDTriangleConeT(0)]
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - 4.840076866013861) < 1e-4


def test_chordal_then_sparse_pipeline():
    """Large decomposed SDP: chordal decomposition output re-enters the
    sparse pipeline (many clique cones + overlap columns are sparse)."""
    from test_chordal import block_arrow_sdp

    P, q, A, b, cones = block_arrow_sdp(k=120, w=3)
    s = Solver(P, q, A, b, cones)
    assert s.chordal_info is not None
    assert getattr(s, "_sparse_mode", False)
    sol = s.solve()
    assert sol.status in (SolverStatus.SOLVED, SolverStatus.ALMOST_SOLVED)
    assert sol.r_prim < 1e-6


def test_sparse_mode_with_exp_cones():
    """Nonsymmetric cones through the sparse assembly maps."""
    from clarabel_tpu import ExponentialConeT, ZeroConeT

    P, q, A, b, cones = banded_qp(grid=25)
    n = 50
    # entropy-like terms on two variable pairs: (t_i, 1, x_j) in Kexp
    # with t_i new variables appended
    nt = 2
    P2 = np.zeros((n + nt, n + nt))
    P2[:n, :n] = P
    q2 = np.concatenate([q, -np.ones(nt)])
    A2 = np.zeros((A.shape[0], n + nt))
    A2[:, :n] = A
    rows = []
    bs2 = []
    for i in range(nt):
        C = np.zeros((3, n + nt))
        C[0, n + i] = -1.0    # s1 = t_i
        C[2, 4 * i] = -1.0    # s3 = x_{4i}
        rows.append(C)
        bs2.append(np.array([0.0, 1.0, 1.0]))  # s2 = 1, s3 = 1 + x
        cones = cones + [ExponentialConeT()]
    Afull = np.vstack([A2] + rows)
    bfull = np.concatenate([b] + bs2)

    sol_dense = Solver(P2, q2, Afull, bfull, cones).solve()
    s_sp = Solver(sp.csr_matrix(P2), q2, sp.csr_matrix(Afull), bfull, cones,
                  Settings(sparse_data=True))
    if not s_sp._sparse_mode:
        pytest.skip("no structure found for this instance")
    sol_sp = s_sp.solve()
    assert sol_sp.status == sol_dense.status
    if sol_dense.status == SolverStatus.SOLVED:
        assert np.linalg.norm(sol_sp.x - sol_dense.x) < 1e-6
