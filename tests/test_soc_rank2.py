"""Rank-2 SOC Hs in sparse mode (VERDICT r1 item #4).

Large SOCs must not materialize O(d²) Hs entries: sparse assembly keeps
only the η²I diagonal and the ±rank-1 terms apply as an SMW correction
(kkt/socrank.py) — the role of the reference's sparse SOC expansion
(reference: cone_types.jl:65-117, directldl_datamaps.jl:8-79).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from clarabel_tpu import (
    Solver, Settings, SolverStatus, NonnegativeConeT, SecondOrderConeT,
)
from clarabel_tpu.cones.ops import SOC_RANK2_MIN_DIM


def robust_ls_banded(m=240, n=80, band=3, seed=0):
    """min t  s.t. ||Fx − g|| ≤ t, |x_i| ≤ 2 — banded F keeps the KKT
    block-arrow-structured even with the big SOC."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(m):
        j0 = int(i * n / m)
        for dj in range(band):
            j = min(n - 1, j0 + dj)
            rows.append(i)
            cols.append(j)
            vals.append(rng.standard_normal())
    F = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    g = rng.standard_normal(m)

    nv = n + 1  # x plus epigraph t
    # SOC rows: s0 = t (row [0..0,-1], b 0); s_i = (Fx − g)_i
    A_soc = sp.vstack([
        sp.coo_matrix(([-1.0], ([0], [n])), shape=(1, nv)),
        sp.hstack([-F, sp.csr_matrix((m, 1))]),
    ])
    b_soc = np.concatenate([[0.0], -g])
    # bounds |x_i| <= 2
    I = sp.eye(n, format="csr")
    Z1 = sp.csr_matrix((n, 1))
    A_bnd = sp.vstack([sp.hstack([I, Z1]), sp.hstack([-I, Z1])])
    b_bnd = 2.0 * np.ones(2 * n)

    A = sp.vstack([A_soc, A_bnd]).tocsr()
    b = np.concatenate([b_soc, b_bnd])
    P = sp.csr_matrix((nv, nv))
    q = np.zeros(nv)
    q[n] = 1.0
    cones = [SecondOrderConeT(m + 1), NonnegativeConeT(2 * n)]
    return P, q, A, b, cones, F, g


def test_rank2_engages_and_matches_dense():
    P, q, A, b, cones, F, g = robust_ls_banded()
    assert cones[0].dim >= SOC_RANK2_MIN_DIM

    s_sparse = Solver(P, q, A, b, cones, Settings(sparse_data=True))
    assert s_sparse._sparse_mode, "expected sparse setup to succeed"
    maps = getattr(s_sparse, "_structure", None)
    # Hs entry count must be O(d), not O(d²): the SOC contributes d diag
    # entries (+ the nn group's 2n)
    d = cones[0].dim
    from clarabel_tpu.cones.ops import hs_coords
    from clarabel_tpu.cones.layout import ConeLayout

    hr, _ = hs_coords(ConeLayout(cones), P.shape[0],
                      soc_rank2_min_dim=SOC_RANK2_MIN_DIM)
    assert len(hr) < 4 * (d + 2 * 80), len(hr)

    sol_sp = s_sparse.solve()
    assert sol_sp.status == SolverStatus.SOLVED
    assert sol_sp.r_prim < 1e-8 and sol_sp.r_dual < 1e-8

    # condensed as the dense-path reference (dense LDL currently errors
    # on a dim-241 SOC's dense Hs block — tracked separately)
    sol_dn = Solver(P.toarray(), q, A.toarray(), b, cones,
                    Settings(sparse_data=False,
                             kkt_backend="condensed")).solve()
    assert sol_dn.status == SolverStatus.SOLVED
    assert abs(sol_sp.obj_val - sol_dn.obj_val) < 1e-6
    # optimal t equals the residual norm
    x = sol_sp.x[:80]
    t = sol_sp.x[80]
    assert abs(np.linalg.norm(F @ x - g) - t) < 1e-6


def test_rank2_objective_matches_unconstrained_ls():
    """With loose bounds the optimum is the (banded) LS residual."""
    P, q, A, b, cones, F, g = robust_ls_banded(m=120, n=40, seed=3)
    sol = Solver(P, q, A, b, cones, Settings(sparse_data=True)).solve()
    assert sol.status == SolverStatus.SOLVED
    import numpy.linalg as la

    x_ls, *_ = la.lstsq(F.toarray(), g, rcond=None)
    if np.all(np.abs(x_ls) <= 2.0 - 1e-9):
        assert abs(sol.obj_val - la.norm(F @ x_ls - g)) < 1e-6


def test_small_socs_keep_dense_blocks():
    """SOCs below the threshold still use dense per-cone Hs blocks."""
    from clarabel_tpu.cones.ops import hs_coords
    from clarabel_tpu.cones.layout import ConeLayout

    cones = [SecondOrderConeT(5)]
    lay = ConeLayout(cones)
    hr, _ = hs_coords(lay, 3, soc_rank2_min_dim=SOC_RANK2_MIN_DIM)
    assert len(hr) == 25  # full 5x5 block


def test_big_soc_dense_input_routes_to_lowrank():
    """Dense inputs with a big SOC auto-route through the sparse
    low-rank pipeline: the augmented system with exact rank-2 Hs solves
    this instance in ~8 iterations to 1e-11, where dense condensed
    stalls ALMOST at 9e-7 and dense LDL errors outright (pivot growth
    with P = 0 diagonal)."""
    P, q, A, b, cones, F, g = robust_ls_banded(m=120, n=40, seed=1)
    s = Solver(P.toarray(), q, A.toarray(), b, cones)
    assert s._sparse_mode and s._backend == "blockarrow"
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
    import numpy.linalg as la

    x_ls, *_ = la.lstsq(F.toarray(), g, rcond=None)
    assert abs(sol.obj_val - la.norm(F @ x_ls - g)) < 1e-6

    # explicitly forcing dense still routes to condensed (not dense LDL)
    s2 = Solver(P.toarray(), q, A.toarray(), b, cones,
                Settings(sparse_data=False))
    assert s2._backend == "condensed"


def test_lowrank_genpow_sparse_mode():
    """Large generalized power cones also use the diag+SMW path in sparse
    mode (reference: the always-sparse-expandable genpow,
    directldl_datamaps.jl:81-167).

    max w1  s.t.  u = (1.5, 2), (u, w) in GenPow(0.4, 0.6, dim2=60):
    w1* = 1.5^0.4 * 2^0.6.
    """
    from clarabel_tpu import GenPowerConeT

    d2 = 60
    width = 2 + d2
    cone = [GenPowerConeT([0.4, 0.6], d2)]
    nv = width
    A = sp.vstack([
        -sp.eye(nv),                      # membership rows: s = y in K
        sp.coo_matrix(([1.0, 1.0], ([0, 1], [0, 1])), shape=(2, nv)),
    ]).tocsr()
    b = np.concatenate([np.zeros(nv), [1.5, 2.0]])
    cones = cone + [__import__("clarabel_tpu").ZeroConeT(2)]
    q = np.zeros(nv)
    q[2] = -1.0  # max w1
    P = sp.csr_matrix((nv, nv))

    s = Solver(P, q, A, b, cones, Settings(sparse_data=True))
    assert s._sparse_mode
    assert s._structure is not None
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    expect = 1.5 ** 0.4 * 2.0 ** 0.6
    assert abs(sol.x[2] - expect) < 1e-6
    # Hs assembly is O(width), not O(width^2)
    from clarabel_tpu.cones.ops import hs_coords
    from clarabel_tpu.cones.layout import ConeLayout

    hr, _ = hs_coords(ConeLayout(cones), nv,
                      soc_rank2_min_dim=SOC_RANK2_MIN_DIM)
    assert len(hr) <= width + 2


def test_big_soc_dense_ldl_backend_solves():
    """VERDICT r2 #6: explicitly selecting the dense LDL backend on the
    P=0 big-SOC class must SOLVE, not NUMERICAL_ERROR at iteration 1.
    The cure is the descending-|diag| elimination order
    (kkt/dense.py assemble_and_factor; settings.dense_ldl_diag_order) —
    the natural order eliminates the ±ε-regularized P=0 pivots first
    and multipliers grow like ||A||/ε (the reference avoids this via
    AMD ordering + in-factor dynamic regularization,
    directldl_qdldl.jl:17-25,60-88)."""
    P, q, A, b, cones, F, g = robust_ls_banded(m=120, n=40, seed=1)
    s = Solver(P.toarray(), q, A.toarray(), b, cones,
               Settings(kkt_backend="ldl", sparse_data=False))
    assert s._backend == "ldl"
    sol = s.solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8
    import numpy.linalg as la

    x_ls, *_ = la.lstsq(F.toarray(), g, rcond=None)
    assert abs(sol.obj_val - la.norm(F @ x_ls - g)) < 1e-6

    # the natural order is preserved under the opt-out and still fails
    # or at best limps — pin only that the toggle is honored
    s2 = Solver(P.toarray(), q, A.toarray(), b, cones,
                Settings(kkt_backend="ldl", sparse_data=False,
                         dense_ldl_diag_order=False))
    sol2 = s2.solve()
    assert sol2.status in (SolverStatus.SOLVED,
                           SolverStatus.ALMOST_SOLVED,
                           SolverStatus.NUMERICAL_ERROR,
                           SolverStatus.INSUFFICIENT_PROGRESS)
