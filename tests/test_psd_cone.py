"""PSD cone tests: kernel-level numerics + solver-level SDP parity.

Mirrors the reference's unit tests (reference:
test/UnitTests/test_coneops_psdtrianglecone.jl) and the basic SDP opt test
(reference: test/OptTests/basic_sdp.jl).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from clarabel_tpu import (
    Solver,
    Settings,
    SolverStatus,
    PSDTriangleConeT,
    NonnegativeConeT,
)
from clarabel_tpu.cones import psd
from clarabel_tpu.cones.layout import ConeLayout


def rand_sym(rng, n):
    M = rng.standard_normal((n, n))
    return (M + M.T) / 2


def rand_psd(rng, n):
    M = rng.standard_normal((n, n))
    return M @ M.T + n * np.eye(n)


def svec_np(M):
    """Reference svec: column-major triu with √2 off-diagonal scaling."""
    n = M.shape[0]
    out = []
    for col in range(n):
        for row in range(col + 1):
            out.append(M[row, col] * (1.0 if row == col else np.sqrt(2.0)))
    return np.array(out)


def test_svec_mat_roundtrip():
    rng = np.random.default_rng(0)
    n = 5
    M = rand_sym(rng, n)
    x = svec_np(M)[None, :]
    M2 = np.asarray(psd.svec_to_mat(jnp.asarray(x), n))[0]
    assert np.allclose(M2, M)
    x2 = np.asarray(psd.mat_to_svec(jnp.asarray(M2[None]), n))[0]
    assert np.allclose(x2, x[0])
    # inner products are preserved: <svec(A),svec(B)> = <A,B>
    B = rand_sym(rng, n)
    assert np.isclose(svec_np(M) @ svec_np(B), np.tensordot(M, B))


def test_nt_scaling_identities():
    """NT scaling must satisfy W z = λ = W^{-T} s (as svec vectors)."""
    rng = np.random.default_rng(1)
    n = 4
    t = n * (n + 1) // 2
    S = rand_psd(rng, n)
    Z = rand_psd(rng, n)

    layout = ConeLayout([PSDTriangleConeT(n)])
    g = layout.groups[f"psd{n}"]

    s = jnp.asarray(svec_np(S))
    z = jnp.asarray(svec_np(Z))
    state, ok = psd.update_scaling(g, s, z)
    assert bool(ok)

    R = np.asarray(state["R"])[0]
    Rinv = np.asarray(state["Rinv"])[0]
    lam = np.asarray(state["lam"])[0]

    assert np.allclose(R @ Rinv, np.eye(n), atol=1e-10)
    # W z = svec(Rᵀ Z R) should equal λ (diagonal)
    WZ = R.T @ Z @ R
    assert np.allclose(WZ, np.diag(lam), atol=1e-9)
    # W^{-T} s = svec(Rinv S Rinvᵀ) should equal λ
    WiS = Rinv @ S @ Rinv.T
    assert np.allclose(WiS, np.diag(lam), atol=1e-9)


def test_hs_block_matches_mul():
    """Dense Hs block must agree with the operator x -> WᵀWx."""
    rng = np.random.default_rng(2)
    n = 3
    t = n * (n + 1) // 2
    layout = ConeLayout([PSDTriangleConeT(n)])
    g = layout.groups[f"psd{n}"]

    s = jnp.asarray(svec_np(rand_psd(rng, n)))
    z = jnp.asarray(svec_np(rand_psd(rng, n)))
    state, ok = psd.update_scaling(g, s, z)

    H = np.asarray(psd.hs_dense_scatter(g, state, jnp.zeros((t, t))))
    for _ in range(3):
        x = rng.standard_normal(t)
        y = np.asarray(psd.mul_Hs(g, state, jnp.asarray(x), jnp.zeros(t)))
        assert np.allclose(H @ x, y, atol=1e-9)
    assert np.allclose(H, H.T, atol=1e-10)


def test_basic_sdp_feasible():
    # reference: test/OptTests/basic_sdp.jl:6-50
    P = np.eye(6)
    q = np.zeros(6)
    A = np.eye(6)
    b = np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0])
    cones = [PSDTriangleConeT(3)]
    sol = Solver(P, q, A, b, cones).solve()
    refsol = np.array([
        -3.0729833267361095, 0.3696004167288786, -0.022226685581313674,
        0.31441213129613066, -0.026739700851545107, -0.016084530571308823,
    ])
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - refsol) < 1e-4
    assert abs(sol.obj_val - 4.840076866013861) < 1e-4


def test_sdp_primal_infeasible():
    # reference: test/OptTests/basic_sdp.jl:76-90 (negative definiteness
    # constraint added to an SDP forces infeasibility)
    P = np.eye(6)
    q = np.zeros(6)
    A = np.vstack([np.eye(6), -np.eye(6)])
    b = np.concatenate([
        np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0]),
        np.array([-1.0, 0.0, -1.0, 0.0, 0.0, -1.0]),
    ])
    cones = [PSDTriangleConeT(3), PSDTriangleConeT(3)]
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.PRIMAL_INFEASIBLE


def test_sdp_mixed_with_nn():
    """PSD + nonnegative cones in one problem."""
    rng = np.random.default_rng(5)
    n = 3
    t = 6
    P = np.eye(t)
    q = rng.standard_normal(t)
    A = np.vstack([np.eye(t), rng.standard_normal((2, t))])
    b = np.concatenate([svec_np(rand_psd(rng, n)), np.ones(2)])
    cones = [PSDTriangleConeT(n), NonnegativeConeT(2)]
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert sol.r_prim < 1e-8 and sol.r_dual < 1e-8


def test_eigvalsh_sym_closed_forms():
    """Closed-form n<=3 symmetric eigenvalues match numpy, including the
    zero-diagonal tridiagonal blocks that NaN TPU's batched eigvalsh."""
    import jax.numpy as jnp
    from clarabel_tpu.cones.psd import _eigvalsh_sym

    rng = np.random.default_rng(5)
    for n in (1, 2, 3):
        for _ in range(20):
            F = rng.standard_normal((4, n, n))
            Z = 0.5 * (F + np.swapaxes(F, 1, 2))
            e = np.asarray(_eigvalsh_sym(jnp.asarray(Z)))
            eref = np.linalg.eigvalsh(Z)
            assert np.max(np.abs(e - eref)) < 1e-12, (n, e, eref)

    # the pathological case: zero diagonal, tridiagonal
    Z = np.zeros((1, 3, 3))
    Z[0, 0, 1] = Z[0, 1, 0] = 0.146
    Z[0, 1, 2] = Z[0, 2, 1] = 0.167
    e = np.asarray(_eigvalsh_sym(jnp.asarray(Z)))
    assert np.all(np.isfinite(e))
    assert np.max(np.abs(e - np.linalg.eigvalsh(Z))) < 1e-14

    # isotropic (p == 0) branch
    Z = 3.7 * np.broadcast_to(np.eye(3), (2, 3, 3)).copy()
    e = np.asarray(_eigvalsh_sym(jnp.asarray(Z)))
    assert np.allclose(e, 3.7)

    # n >= 4 falls through to jnp.linalg.eigvalsh
    F = rng.standard_normal((3, 5, 5))
    Z = 0.5 * (F + np.swapaxes(F, 1, 2))
    e = np.asarray(_eigvalsh_sym(jnp.asarray(Z)))
    assert np.max(np.abs(e - np.linalg.eigvalsh(Z))) < 1e-10
