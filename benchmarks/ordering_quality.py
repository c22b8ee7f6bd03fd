"""Multifrontal ordering quality vs standard fill-reducing orderings
(VERDICT r2 #8).

The reference gets its elimination ordering from AMD inside QDLDL
(reference: src/kktsolvers/direct-ldl/directldl_qdldl.jl:17-25); our
multifrontal backend orders by recursive nested dissection
(clarabel_tpu/structure_nd.py, native multilevel bisector in
native/symbolic.cpp).  This harness quantifies the fill penalty:

* symbolic Cholesky fill — nnz(L) and factorization flops — of the KKT
  pattern under (a) the natural order, (b) the ND plan's elimination
  order (leaves up to root), (c) SuperLU's MMD_AT_PLUS_A (the classic
  minimum-degree family AMD belongs to), and (d) RCM;
* the ND plan's PADDED DENSE-FRONT numbers — what the device actually
  stores/computes (level-synchronous vmapped fronts pad to the heaviest
  block per level), from NestedPlan itself.

The comparison of interest is (b) vs (c): how much sparse fill the ND
*ordering* gives up against minimum degree.  The dense-front numbers
measure the additional cost of the batched-front execution model, which
buys back its overhead by running as a handful of vmapped MXU calls
instead of scalar pointer-chasing (docs/ORDERING.md for measured
conclusions).

Usage: python benchmarks/ordering_quality.py [--quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def symbolic_cholesky_counts(K: sp.spmatrix, perm: np.ndarray):
    """nnz(L) and flop count of a sparse Cholesky of K[perm][:, perm]
    via the elimination-tree row-subtree algorithm (Liu): for column j,
    walk each structural row index up the current etree until reaching
    j, counting visits — exactly the pattern of row j of L.
    O(nnz(L)) total."""
    A = sp.csc_matrix(K)[perm][:, perm]
    A = sp.csc_matrix(sp.triu(A.T + A))  # upper triangle, full pattern
    nnz_ = A.indptr
    idx = A.indices
    N = A.shape[0]
    parent = np.full(N, -1, np.int64)
    mark = np.full(N, -1, np.int64)
    colcount = np.ones(N, np.int64)  # diagonal of each column of L
    for j in range(N):
        mark[j] = j
        for t in range(nnz_[j], nnz_[j + 1]):
            i = idx[t]
            while i < j and mark[i] != j:
                mark[i] = j
                colcount[i] += 1
                if parent[i] == -1:
                    parent[i] = j
                i = parent[i]
    nnzL = int(colcount.sum())
    flops = float((colcount.astype(np.float64) ** 2).sum())
    return nnzL, flops


def nd_order_and_fronts(P, A_con, cones):
    """Build the NestedPlan for the KKT of (P, A) and return
    (elimination order leaves->root, padded-front nnz, padded-front
    flops), or None when no plan exists."""
    from clarabel_tpu.cones.layout import ConeLayout
    from clarabel_tpu.structure_nd import analyze_nested_dissection

    layout = ConeLayout(list(cones))

    def pat(M):
        M = sp.coo_matrix(M)
        return (M.row, M.col), M.shape

    plan = analyze_nested_dissection(pat(P), pat(A_con), layout)
    if plan is None:
        return None
    N = plan.n + plan.m
    order = []
    for lv in reversed(plan.levels):      # leaves first
        rows = lv.rows_idx.ravel()
        order.extend(int(r) for r in rows if r < N)
    order = np.array(order)
    assert len(order) == N, (len(order), N)
    nnz_f = 0
    flops_f = 0.0
    for lv in plan.levels:
        nr, nbd, cnt = lv.nr, lv.nbd, lv.cnt
        nnz_f += cnt * (nr * (nr + 1) // 2 + nr * nbd)
        flops_f += cnt * (nr ** 3 / 3 + nr ** 2 * nbd + nr * nbd ** 2)
    return order, nnz_f, flops_f


def mmd_order(K: sp.spmatrix):
    """Minimum-degree-family ordering via SuperLU's MMD_AT_PLUS_A on
    the (symmetric) KKT pattern — the closest standard stand-in for
    AMD available in this image."""
    from scipy.sparse.linalg import splu

    Kc = sp.csc_matrix(K, dtype=np.float64)
    # make numerically factorizable for splu's pivoting machinery
    Kc = Kc + 10.0 * abs(Kc).sum() * sp.eye(Kc.shape[0], format="csc")
    lu = splu(Kc, permc_spec="MMD_AT_PLUS_A",
              options={"SymmetricMode": True},
              diag_pivot_thresh=0.0)
    return lu.perm_c


def rcm_order(K: sp.spmatrix):
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return reverse_cuthill_mckee(sp.csr_matrix(K), symmetric_mode=True)


def kkt_pattern(P, A_con):
    n = P.shape[0]
    m = A_con.shape[0]
    H = sp.eye(m)
    return sp.bmat([[sp.csr_matrix(P) + sp.eye(n), A_con.T],
                    [A_con, H]], format="csc")


def run_config(name, P, A_con, cones):
    K = kkt_pattern(P, sp.csr_matrix(A_con))
    N = K.shape[0]
    nd = nd_order_and_fronts(P, A_con, cones)
    rows = {}
    t0 = time.time()
    rows["natural"] = symbolic_cholesky_counts(K, np.arange(N))
    rows["mmd(AMD-class)"] = symbolic_cholesky_counts(K, mmd_order(K))
    rows["rcm"] = symbolic_cholesky_counts(K, rcm_order(K))
    if nd is not None:
        order, nnz_f, flops_f = nd
        rows["nd-order(sparse)"] = symbolic_cholesky_counts(K, order)
        rows["nd-fronts(padded)"] = (nnz_f, flops_f)
    dt = time.time() - t0
    print(f"\n== {name}  (N={N}, nnz(K)={K.nnz})  [{dt:.1f}s]")
    base = rows["mmd(AMD-class)"]
    for k, (nnzL, fl) in rows.items():
        print(f"  {k:18s} nnz(L) {nnzL:>10,}  ({nnzL/base[0]:5.2f}x mmd)"
              f"   flops {fl:.3e} ({fl/base[1]:5.2f}x mmd)")
    return rows


def main(quick=False):
    from benchmarks.grid_qp import grid_qp_sparse
    from benchmarks.configs import large_banded_qp_sparse
    from clarabel_tpu import NonnegativeConeT

    out = {}
    for g in ((30, 60) if not quick else (30,)):
        P, q, A, b = grid_qp_sparse(g)
        out[f"grid{g}"] = run_config(
            f"grid Laplacian QP {g}x{g}", P, -sp.eye(g * g).tocsr(),
            [NonnegativeConeT(g * g)])
    P, q, A, b, cones = large_banded_qp_sparse(2500 if not quick else 800)
    out["banded"] = run_config("banded QP", P, sp.csr_matrix(A), cones)
    return out


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
