"""Benchmark problem generators for the BASELINE.md configurations.

* Markowitz portfolio QP (200 assets, long-only, dense P)
* sparse QP subset in the style of Maros-Meszaros CVXQP1-3 / AUG2DC
  (the original collection's data files are not redistributed in this
  image; these generators reproduce the documented structure and sizes)
* robust least-squares SOCP (m=2000, n=500)
* batched small SOCPs (MPC/trajectory scenarios)
* max-cut SDP relaxation with chordal structure
"""

import numpy as np

from clarabel_tpu import (
    NonnegativeConeT, SecondOrderConeT, ZeroConeT, PSDTriangleConeT,
)


def markowitz_qp(n_assets=200, seed=0):
    """min (1/2) x'Σx - γ μ'x  s.t.  1'x = 1, x >= 0."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n_assets, max(10, n_assets // 10)))
    Sigma = F @ F.T / n_assets + 0.01 * np.eye(n_assets)
    mu = rng.uniform(0.0, 0.1, n_assets)
    gamma = 1.0

    P = Sigma
    q = -gamma * mu
    A = np.vstack([np.ones((1, n_assets)), -np.eye(n_assets)])
    b = np.concatenate([[1.0], np.zeros(n_assets)])
    cones = [ZeroConeT(1), NonnegativeConeT(n_assets)]
    return P, q, A, b, cones


def cvxqp_style(n=100, seed=0):
    """Convex QP in the CVXQP family structure: sparse P (tridiag-ish),
    m = n/2 sparse equality constraints, box constraints."""
    rng = np.random.default_rng(seed)
    m_eq = n // 2
    # sparse SPD P: tridiagonal + a few random couplings
    P = np.diag(rng.uniform(1.0, 5.0, n))
    off = rng.uniform(-0.5, 0.5, n - 1)
    P += np.diag(off, 1) + np.diag(off, -1)
    P = P + n * 1e-3 * np.eye(n)
    q = rng.standard_normal(n)
    # each equality touches ~3 variables
    Aeq = np.zeros((m_eq, n))
    for i in range(m_eq):
        cols = rng.choice(n, 3, replace=False)
        Aeq[i, cols] = rng.standard_normal(3)
    beq = Aeq @ rng.uniform(-1, 1, n)
    # box: -10 <= x <= 10
    A = np.vstack([Aeq, np.eye(n), -np.eye(n)])
    b = np.concatenate([beq, 10 * np.ones(n), 10 * np.ones(n)])
    cones = [ZeroConeT(m_eq), NonnegativeConeT(2 * n)]
    return P, q, A, b, cones


def aug2d_style(grid=10, seed=0):
    """AUG2DC-style expanded quadratic network problem on a 2-d grid."""
    rng = np.random.default_rng(seed)
    n = 2 * grid * grid
    m_eq = grid * grid
    P = np.eye(n)
    q = rng.standard_normal(n) * 0.1
    Aeq = np.zeros((m_eq, n))
    for i in range(m_eq):
        Aeq[i, 2 * i] = 1.0
        Aeq[i, 2 * i + 1] = -1.0
        if i + 1 < m_eq:
            Aeq[i, (2 * i + 2) % n] = 0.5
    beq = rng.standard_normal(m_eq) * 0.1
    cones = [ZeroConeT(m_eq)]
    return P, q, Aeq, beq, cones


def robust_least_squares_socp(m=2000, n=500, seed=0):
    """Robust LS: min t + rho*u  s.t. ||Fx - g|| <= t, ||x|| <= u.

    Variables: (x, t, u) in R^{n+2}.
    """
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((m, n)) / np.sqrt(m)
    g = rng.standard_normal(m)
    rho = 0.1

    nv = n + 2
    P = np.zeros((nv, nv))
    q = np.zeros(nv)
    q[n] = 1.0      # t
    q[n + 1] = rho  # u

    # SOC 1: s = (t, Fx - g) in K_{m+1}
    A1 = np.zeros((m + 1, nv))
    A1[0, n] = -1.0
    A1[1:, :n] = -F
    b1 = np.concatenate([[0.0], -g])
    # SOC 2: s = (u, x) in K_{n+1}
    A2 = np.zeros((n + 1, nv))
    A2[0, n + 1] = -1.0
    A2[1:, :n] = -np.eye(n)
    b2 = np.zeros(n + 1)

    A = np.vstack([A1, A2])
    b = np.concatenate([b1, b2])
    cones = [SecondOrderConeT(m + 1), SecondOrderConeT(n + 1)]
    return P, q, A, b, cones


def batched_socp(B=4096, n=6, seed=0):
    """Batch of small random SOCPs (the throughput north-star config)."""
    rng = np.random.default_rng(seed)
    Ps, qs, As, bs = [], [], [], []
    for _ in range(B):
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        Ps.append(F @ F.T + 0.5 * np.eye(n))
        qs.append(rng.standard_normal(n))
        As.append(np.vstack([np.eye(n), np.zeros((1, n)), -np.eye(n)]))
        bs.append(np.concatenate([rng.uniform(0.5, 1.5, n),
                                  [rng.uniform(1.0, 2.0)], np.zeros(n)]))
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    return (np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs)), cones


def maxcut_sdp(nv=100, density=0.05, seed=0):
    """Max-cut SDP relaxation, dual form:
        min 1'y  s.t.  diag(y) − L/4 ⪰ 0
    over a sparse banded graph Laplacian.  The PSD rows of [A b] carry the
    graph's sparsity, so the chordal decomposition engages."""
    rng = np.random.default_rng(seed)
    W = np.zeros((nv, nv))
    for i in range(nv - 1):
        W[i, i + 1] = W[i + 1, i] = rng.uniform(0.5, 1.5)
    extra = int(density * nv * nv / 2)
    for _ in range(extra):
        i, j = rng.integers(0, nv, 2)
        if i != j and abs(i - j) < 8:
            W[i, j] = W[j, i] = rng.uniform(0.5, 1.5)
    L = np.diag(W.sum(axis=1)) - W

    t = nv * (nv + 1) // 2

    def tri(i, j):
        i, j = min(i, j), max(i, j)
        return (j * (j + 1)) // 2 + i

    def svec(M):
        out = np.zeros(t)
        for col in range(nv):
            for row in range(col + 1):
                out[tri(row, col)] = M[row, col] * (
                    1.0 if row == col else np.sqrt(2.0)
                )
        return out

    # variables y ∈ R^nv;  s = svec(diag(y) − L/4) ∈ PSD cone
    P = np.zeros((nv, nv))
    q = np.ones(nv)
    A_psd = np.zeros((t, nv))
    for i in range(nv):
        A_psd[tri(i, i), i] = -1.0
    b_psd = -svec(L / 4.0)
    cones = [PSDTriangleConeT(nv)]
    return P, q, A_psd, b_psd, cones


def large_banded_qp_sparse(grid=2500, seed=0):
    """Large banded QP assembled directly in scipy sparse (AUG2DC-scale):
    n = 2*grid variables, grid chain equalities, 4*grid bounds.
    Exercises the sparse data mode end-to-end."""
    import scipy.sparse as sps

    rng = np.random.default_rng(seed)
    n = 2 * grid
    diag = rng.uniform(1.0, 3.0, n)
    off = rng.uniform(-0.4, 0.4, n - 1)
    P = sps.diags([off, diag, off], offsets=[-1, 0, 1], format="csr")
    q = rng.standard_normal(n)
    m_eq = grid
    rows = np.repeat(np.arange(m_eq), 2)
    cols = np.empty(2 * m_eq, dtype=np.int64)
    cols[0::2] = 2 * np.arange(m_eq)
    cols[1::2] = 2 * np.arange(m_eq) + 1
    vals = np.tile([1.0, -1.0], m_eq)
    Aeq = sps.coo_matrix((vals, (rows, cols)), shape=(m_eq, n)).tocsr()
    beq = rng.standard_normal(m_eq) * 0.1
    eye = sps.identity(n, format="csr")
    A = sps.vstack([Aeq, eye, -eye]).tocsr()
    b = np.concatenate([beq, 5 * np.ones(n), 5 * np.ones(n)])
    from clarabel_tpu import ZeroConeT, NonnegativeConeT

    cones = [ZeroConeT(m_eq), NonnegativeConeT(2 * n)]
    return P, q, A, b, cones
