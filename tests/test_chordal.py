"""Chordal decomposition tests.

Mirrors the reference chordal SDP test (reference:
test/OptTests/sdp_chordal.jl) over all merge methods x compact x
complete_dual combinations, and adds a decomposition-on/off solution
parity check on a block-arrow SDP.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from clarabel_tpu import (
    Solver,
    Settings,
    SolverStatus,
    NonnegativeConeT,
    PSDTriangleConeT,
    PowerConeT,
    ZeroConeT,
)


def sdp_chordal_data():
    """reference: test/OptTests/sdp_chordal.jl:7-76"""
    P = np.zeros((8, 8))
    q = np.array([-1.0, 0, 0, 0, 0, 0, 0, 0])
    m, n = 28, 8
    colptr = np.array([0, 1, 4, 5, 8, 9, 10, 13, 16])
    rowval = np.array([24, 7, 10, 22, 8, 12, 15, 25, 9, 13, 18, 21, 26, 0, 23, 27])
    r2 = np.sqrt(2.0)
    nzval = -np.array([1.0, r2, 1.0, 1.0, r2, r2, 1.0, 1.0, r2, r2, r2,
                       1.0, 1.0, 1.0, 1.0, 1.0])
    A = sp.csc_matrix((nzval, rowval, colptr), shape=(m, n)).toarray()
    b = np.zeros(m)
    b[1] = 3.0
    b[2] = 2.0 * r2
    b[3] = 2.0
    b[4] = r2
    b[5] = r2
    b[6] = 3.0
    cones = [
        NonnegativeConeT(1),
        PSDTriangleConeT(6),
        PowerConeT(1.0 / 3.0),
        PowerConeT(0.5),
    ]
    return P, q, A, b, cones


@pytest.mark.parametrize("merge_method", ["clique_graph", "parent_child", "none"])
@pytest.mark.parametrize("compact", [False, True])
@pytest.mark.parametrize("complete_dual", [False, True])
def test_sdp_chordal(merge_method, compact, complete_dual):
    P, q, A, b, cones = sdp_chordal_data()
    settings = Settings(
        chordal_decomposition_enable=True,
        chordal_decomposition_compact=compact,
        chordal_decomposition_complete_dual=complete_dual,
        chordal_decomposition_merge_method=merge_method,
    )
    solver = Solver(P, q, A, b, cones, settings)
    if merge_method != "parent_child":
        # parent_child's t_size=8 threshold re-merges this small pattern
        # into one clique, which correctly disables decomposition
        assert solver.chordal_info is not None, "expected decomposition to engage"
    sol = solver.solve()
    assert sol.status == SolverStatus.SOLVED


def block_arrow_sdp(k=3, w=2, nx=3):
    """Dual-form SDP with block-arrow aggregate sparsity:
        min c'x  s.t.  B − Σ x_i A_i ⪰ 0,  |x| ≤ 1
    with the A_i and B sharing a block-arrow pattern, so the PSD rows of
    [A b] are chordally decomposable."""
    rng = np.random.default_rng(0)
    nd = k * w + w
    t = nd * (nd + 1) // 2

    def tri(i, j):
        i, j = min(i, j), max(i, j)
        return (j * (j + 1)) // 2 + i

    def rand_arrow():
        C = np.zeros((nd, nd))
        for blk in range(k):
            s0 = blk * w
            Bb = rng.standard_normal((w, w))
            C[s0:s0 + w, s0:s0 + w] += Bb + Bb.T
            D = rng.standard_normal((w, w))
            C[s0:s0 + w, k * w:] += D
            C[k * w:, s0:s0 + w] += D.T
        H = rng.standard_normal((w, w))
        C[k * w:, k * w:] += H + H.T
        return C

    def svec(M):
        out = np.zeros(t)
        for col in range(nd):
            for row in range(col + 1):
                out[tri(row, col)] = M[row, col] * (1.0 if row == col else np.sqrt(2.0))
        return out

    Amats = [rand_arrow() for _ in range(nx)]
    Bmat = rand_arrow()
    Bmat = Bmat + (abs(np.linalg.eigvalsh(Bmat).min()) + 1.0) * np.eye(nd)

    c = rng.standard_normal(nx)
    P = np.zeros((nx, nx))
    # PSD rows: s = svec(B) - Σ x_i svec(A_i)
    A_psd = np.stack([svec(Ai) for Ai in Amats], axis=1)
    b_psd = svec(Bmat)
    # box: -1 <= x <= 1
    A_box = np.vstack([np.eye(nx), -np.eye(nx)])
    b_box = np.ones(2 * nx)
    A = np.vstack([A_box, A_psd])
    b = np.concatenate([b_box, b_psd])
    cones = [NonnegativeConeT(2 * nx), PSDTriangleConeT(nd)]
    return P, c, A, b, cones


@pytest.mark.parametrize("merge_method", ["clique_graph", "parent_child", "none"])
def test_block_arrow_parity(merge_method):
    """Decomposed solve must match the undecomposed solution."""
    # parent_child's t_size=8 threshold needs cliques larger than 8 to
    # keep any decomposition; use wider blocks there
    w = 5 if merge_method == "parent_child" else 2
    P, q, A, b, cones = block_arrow_sdp(w=w)

    sol_off = Solver(
        P, q, A, b, cones, Settings(chordal_decomposition_enable=False)
    ).solve()
    assert sol_off.status == SolverStatus.SOLVED

    settings = Settings(
        chordal_decomposition_enable=True,
        chordal_decomposition_merge_method=merge_method,
        chordal_decomposition_complete_dual=True,
    )
    solver = Solver(P, q, A, b, cones, settings)
    assert solver.chordal_info is not None
    sol_on = solver.solve()
    assert sol_on.status == SolverStatus.SOLVED
    assert abs(sol_on.obj_val - sol_off.obj_val) < 1e-6
    assert np.linalg.norm(sol_on.x - sol_off.x) < 1e-5
    # completed dual must be PSD (Vandenberghe completion)
    from clarabel_tpu.chordal.decomp import _svec_to_mat_np

    nd = 3 * w + w
    lo = 6  # PSD cone rows start after the 6-row nonnegative cone
    Z = _svec_to_mat_np(sol_on.z[lo:], nd)
    eigs = np.linalg.eigvalsh(Z)
    assert eigs.min() > -1e-7, f"completed dual not PSD: min eig {eigs.min()}"
