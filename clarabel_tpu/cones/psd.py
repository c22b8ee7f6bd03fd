"""PSD triangle cone operations, batched over same-size cone groups.

Scaled-triangle (svec) storage with √2 off-diagonal scaling, NT scaling via
two Choleskys + an SVD, step lengths via eigenvalues — the math of the
reference implementation (reference: src/cones/coneops_psdtrianglecone.jl),
re-expressed as batched tensor ops:

* a group of `c` cones of side n is a (c, t) block, t = n(n+1)/2;
* svec<->mat conversion is a static gather/scatter with a per-entry scale;
* Cholesky / SVD / eigh are `jnp.linalg` batched primitives;
* the dense Hs block (the symmetric Kronecker skron(RRᵀ), reference
  :502-540) is assembled by applying X ↦ (RRᵀ) X (RRᵀ) to the svec basis
  with one einsum instead of the reference's quadruple scalar loop.

Deviation from the reference: `_logdet_barrier` returns +inf (not
typemax with a sign flip) when the shifted point leaves the cone, so the
barrier line search correctly rejects infeasible steps.
"""

from functools import lru_cache
from typing import Dict

import numpy as np
import jax.numpy as jnp

from .layout import ConeGroup, _gather, _scatter

_SQRT2 = np.sqrt(2.0)
_ISQRT2 = 1.0 / _SQRT2


@lru_cache(maxsize=None)
def _tri_indices(n: int):
    """Static (rows, cols, scale, diag_mask) for column-major triu svec
    ordering (reference: coneops_psdtrianglecone.jl:469-483)."""
    rows, cols = [], []
    for col in range(n):
        for row in range(col + 1):
            rows.append(row)
            cols.append(col)
    rows = np.asarray(rows, dtype=np.int32)
    cols = np.asarray(cols, dtype=np.int32)
    diag = rows == cols
    scale_in = np.where(diag, 1.0, _ISQRT2)   # svec value -> matrix entry
    return rows, cols, scale_in, diag


@lru_cache(maxsize=None)
def _svec_basis(n: int) -> np.ndarray:
    """(t, n, n) orthonormal symmetric basis E_p with svec(X)_p = <E_p, X>."""
    rows, cols, _, diag = _tri_indices(n)
    t = len(rows)
    E = np.zeros((t, n, n))
    for p in range(t):
        i, j = rows[p], cols[p]
        if i == j:
            E[p, i, i] = 1.0
        else:
            E[p, i, j] = _ISQRT2
            E[p, j, i] = _ISQRT2
    return E


def svec_to_mat(X_svec, n: int):
    """(c, t) -> (c, n, n) symmetric."""
    rows, cols, scale, _ = _tri_indices(n)
    c = X_svec.shape[0]
    vals = X_svec * scale[None, :]
    M = jnp.zeros((c, n, n), X_svec.dtype)
    M = M.at[:, rows, cols].set(vals)
    M = M.at[:, cols, rows].set(vals)
    return M


def mat_to_svec(M, n: int):
    """(c, n, n) -> (c, t);  x_idx = M_ii on diag, (M_ij+M_ji)/√2 off."""
    rows, cols, _, diag = _tri_indices(n)
    up = M[:, rows, cols]
    lo = M[:, cols, rows]
    return jnp.where(diag[None, :], up, (up + lo) * _ISQRT2)


def _diag_svec_positions(n: int) -> np.ndarray:
    k = np.arange(n)
    return (k * (k + 1)) // 2 + k  # 0-based triangular_index of diagonals


def _chol_ok(L):
    return jnp.all(jnp.isfinite(L), axis=(-2, -1))


def _pad_diag(g: ConeGroup):
    """(count, n) float mask of PAD diagonal entries for a clique-size
    bucketed group (cones of true side k embedded in the leading k×k
    block of the side-n bucket), or None when the group is exact.

    Adding this mask to the diagonal pins each pad block to the
    identity, making every factorization exact on the real block:
    chol(blkdiag(S, I)) = blkdiag(chol(S), I), logdet unchanged, NT
    scaling block-diagonal with W_pad = I (so pad entries of every
    scattered output are dropped by the sentinel indices)."""
    if g.true_dims is None:
        return None
    cached = getattr(g, "_psd_pad_cache", None)
    if cached is not None:
        return cached
    n = g.psd_n
    tds = np.asarray(g.true_dims, dtype=np.int64)
    ks = np.round((np.sqrt(8.0 * tds + 1.0) - 1.0) / 2.0).astype(np.int64)
    mask = (np.arange(n)[None, :] >= ks[:, None]).astype(np.float64)
    g._psd_pad_cache = mask
    return mask


def _add_pad_eye(M, pad, value=1.0):
    """M + value*diag(pad) batched; no-op when pad is None."""
    if pad is None:
        return M
    n = M.shape[-1]
    r = jnp.arange(n)
    return M.at[:, r, r].add(value * jnp.asarray(pad, M.dtype))


# Pad-block diagonal value used inside the NT scaling update.  It MUST
# sit far away from the real singular-value cluster: with pads at 1,
# the SVD of L2ᵀL1 sees pad singular values colliding with the real
# λ ≈ 1 cluster near the central-path start, mixes the degenerate
# subspaces, and the scaled quantities leak mass into pad coordinates
# that the sentinel scatter then DROPS — observed as NUMERICAL_ERROR on
# a 434-cone padded group (max-cut nv=500, forced single bucket).  An
# exact power of two keeps chol/λ^{-1/2} arithmetic exact, so the pad
# block of R/Rinv is exactly the identity; real λ would have to reach
# 2⁴⁰ (s∘z entries ~1e24) to collide.
_PAD_SCALE = float(2.0 ** 40)


# ---------------------------------------------------------------------------
# interface implementations (same call signatures as ops.py expects)
# ---------------------------------------------------------------------------

def identity_scaling(g: ConeGroup, dtype) -> Dict:
    n, c = g.psd_n, g.count
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (c, n, n))
    return {"R": eye, "Rinv": eye, "lam": jnp.ones((c, n), dtype)}


def unit_initialization(g: ConeGroup, z, s):
    diag_pos = _diag_svec_positions(g.psd_n)
    z = z.at[g.idx[:, diag_pos]].set(1.0)
    s = s.at[g.idx[:, diag_pos]].set(1.0)
    return z, s


def _eigvalsh_sym(Z):
    """Batched symmetric eigenvalues with closed forms for n ≤ 3.

    TPU's batched f64 eigvalsh emulation returns NaN for benign
    zero-diagonal tridiagonal blocks (observed on v5e with the 3×3
    cliques of a chordal-decomposed max-cut SDP; fine on CPU and in
    numpy).  Chordal decomposition produces *many* tiny cliques, so the
    n ≤ 3 cases get exact closed forms — branch-free elementwise ops
    that are also much faster than the iterative lowering inside the
    IPM while_loop.  Larger blocks keep `jnp.linalg.eigvalsh`; callers
    that only need margins stay NaN-safe via shift_to_cone_interior.
    Returns eigenvalues in ascending order (matching eigvalsh).
    """
    n = Z.shape[-1]
    if n == 1:
        return Z[..., 0, :]
    if n == 2:
        a, b, d = Z[..., 0, 0], Z[..., 0, 1], Z[..., 1, 1]
        mid = 0.5 * (a + d)
        rad = jnp.sqrt(jnp.square(0.5 * (a - d)) + jnp.square(b))
        return jnp.stack([mid - rad, mid + rad], axis=-1)
    if n == 3:
        # trigonometric closed form (Smith 1961), ascending order
        a, b, c = Z[..., 0, 0], Z[..., 1, 1], Z[..., 2, 2]
        d, e, f = Z[..., 0, 1], Z[..., 1, 2], Z[..., 0, 2]
        q = (a + b + c) / 3.0
        p1 = jnp.square(d) + jnp.square(e) + jnp.square(f)
        p2 = (jnp.square(a - q) + jnp.square(b - q) + jnp.square(c - q)
              + 2.0 * p1)
        p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
        tiny = jnp.finfo(Z.dtype).tiny
        pin = jnp.where(p > 0, p, 1.0)
        A_, B_, C_ = (a - q) / pin, (b - q) / pin, (c - q) / pin
        D_, E_, F_ = d / pin, e / pin, f / pin
        detB = (A_ * (B_ * C_ - E_ * E_)
                - D_ * (D_ * C_ - E_ * F_)
                + F_ * (D_ * E_ - B_ * F_))
        r = jnp.clip(0.5 * detB, -1.0, 1.0)
        phi = jnp.arccos(r) / 3.0
        e1 = q + 2.0 * p * jnp.cos(phi)                       # largest
        e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
        e2 = 3.0 * q - e1 - e3
        iso = p2 <= tiny  # (near-)isotropic: all eigenvalues equal q
        e1 = jnp.where(iso, q, e1)
        e2 = jnp.where(iso, q, e2)
        e3 = jnp.where(iso, q, e3)
        return jnp.stack([e3, e2, e1], axis=-1)
    return jnp.linalg.eigvalsh(Z)


def margins(g: ConeGroup, zvec):
    pad = _pad_diag(g)
    Z = svec_to_mat(_gather(zvec, g), g.psd_n)
    if pad is None:
        e = _eigvalsh_sym(Z)
        return jnp.min(e), jnp.sum(jnp.maximum(e, 0.0))
    # Bucketed group: pad each cone's decoupled identity block with a
    # value STRICTLY above its real block's spectral radius
    # (λmax ≤ ‖Z‖_F < 1 + ‖Z‖_F), so in the ascending eigenvalue list
    # the first k_i entries are exactly the real spectrum and the pads
    # sit on top.  Min/beta then read only real eigenvalues — no
    # saturation at the pad value and no subtraction error (the prior
    # pad-at-1 scheme saturated the min margin at 1, which produced a
    # spurious extra shift whenever the target exceeded 1 — ADVICE r3).
    padval = 1.0 + jnp.sqrt(jnp.sum(jnp.square(Z), axis=(-2, -1)))
    e = _eigvalsh_sym(_add_pad_eye(Z, pad, padval[:, None]))
    n = g.psd_n
    tds = np.asarray(g.true_dims, dtype=np.int64)
    ks = np.round((np.sqrt(8.0 * tds + 1.0) - 1.0) / 2.0).astype(np.int64)
    real = jnp.asarray(np.arange(n)[None, :] < ks[:, None])
    beta = jnp.sum(jnp.where(real, jnp.maximum(e, 0.0), 0.0))
    return jnp.min(e[:, 0]), beta


def scaled_unit_shift(g: ConeGroup, z, alpha):
    diag_pos = _diag_svec_positions(g.psd_n)
    return z.at[g.idx[:, diag_pos]].add(alpha)


def update_scaling(g: ConeGroup, s, z):
    """NT scaling: chol(S), chol(Z), SVD(L2ᵀL1) -> λ, R, Rinv.
    reference: coneops_psdtrianglecone.jl:78-143"""
    n = g.psd_n
    pad = _pad_diag(g)
    S = _add_pad_eye(svec_to_mat(_gather(s, g), n), pad, _PAD_SCALE)
    Z = _add_pad_eye(svec_to_mat(_gather(z, g), n), pad, _PAD_SCALE)

    L1 = jnp.linalg.cholesky(S)
    L2 = jnp.linalg.cholesky(Z)
    ok = jnp.logical_and(jnp.all(_chol_ok(L1)), jnp.all(_chol_ok(L2)))

    L1s = jnp.where(jnp.isfinite(L1), L1, 0.0)
    L2s = jnp.where(jnp.isfinite(L2), L2, 0.0)

    tmp = jnp.einsum("cji,cjk->cik", L2s, L1s)  # L2ᵀ L1
    U, lam, Vt = jnp.linalg.svd(tmp)
    lam_safe = jnp.maximum(lam, jnp.finfo(lam.dtype).tiny)
    lam_isqrt = 1.0 / jnp.sqrt(lam_safe)

    # R = L1 V Λ^{-1/2},  Rinv = Λ^{-1/2} Uᵀ L2ᵀ
    R = jnp.einsum("cij,ckj->cik", L1s, Vt) * lam_isqrt[:, None, :]
    Rinv = lam_isqrt[:, :, None] * jnp.einsum("cji,ckj->cik", U, L2s)

    return {"R": R, "Rinv": Rinv, "lam": lam}, ok


def _mul_w_mat(R, X, transpose: bool):
    """W x = svec(Rᵀ X R) (:N) or Wᵀ x = svec(R X Rᵀ) (:T), matrix form.
    reference: coneops_psdtrianglecone.jl:409-437"""
    if transpose:
        return jnp.einsum("cij,cjk,clk->cil", R, X, R)
    return jnp.einsum("cji,cjk,ckl->cil", R, X, R)


def hs_blocks(g: ConeGroup, state, dtype):
    """Dense per-cone Hs = skron(RRᵀ) blocks, (c, t, t).
    Hs[p,q] = <E_p, A E_q A>, A = RRᵀ (symmetric Kronecker product)."""
    n = g.psd_n
    R = state["R"]
    A = jnp.einsum("cij,ckj->cik", R, R)  # RRᵀ
    E = jnp.asarray(_svec_basis(n), dtype)  # (t, n, n)
    # M[q] = A E_q A, then Hs[p,q] = sum_ij E_p[ij] M[q][ij]
    M = jnp.einsum("cij,qjk,ckl->cqil", A, E, A)
    return jnp.einsum("pij,cqij->cpq", E, M)


def hs_dense_scatter(g: ConeGroup, state, H):
    Hs = hs_blocks(g, state, H.dtype)
    H = H.at[g.idx[:, :, None], g.idx[:, None, :]].set(Hs)
    return H


def mul_Hs(g: ConeGroup, state, x, y):
    """y = WᵀW x = svec(A X A), A = RRᵀ."""
    n = g.psd_n
    R = state["R"]
    X = svec_to_mat(_gather(x, g), n)
    WX = _mul_w_mat(R, X, transpose=False)
    Y = _mul_w_mat(R, WX, transpose=True)
    return _scatter(y, g, mat_to_svec(Y, n))


def affine_ds(g: ConeGroup, state, ds):
    """ds = λ ∘ λ = diag(λ²).  reference: :190-205"""
    diag_pos = _diag_svec_positions(g.psd_n)
    lam = state["lam"]
    vals = jnp.zeros((g.count, g.width), ds.dtype)
    vals = vals.at[:, diag_pos].set(lam * lam)
    return _scatter(ds, g, vals)


def combined_ds_shift(g: ConeGroup, state, step_z, step_s, sigma_mu, shift):
    """shift = W⁻¹Δs ∘ WΔz − σμe.
    reference: coneops_symmetric_common.jl:2-35"""
    n = g.psd_n
    R, Rinv = state["R"], state["Rinv"]
    Dz = svec_to_mat(_gather(step_z, g), n)
    Ds = svec_to_mat(_gather(step_s, g), n)
    WDz = _mul_w_mat(R, Dz, transpose=False)      # mul_W!(:N):  Rᵀ Δz R
    WiDs = _mul_w_mat(Rinv, Ds, transpose=True)   # mul_Winv!(:T): Rinv Δs Rinvᵀ
    # circ: (YZ + ZY)/2
    C = 0.5 * (jnp.einsum("cij,cjk->cik", WiDs, WDz)
               + jnp.einsum("cij,cjk->cik", WDz, WiDs))
    out = mat_to_svec(C, n)
    diag_pos = _diag_svec_positions(n)
    out = out.at[:, diag_pos].add(-sigma_mu)
    return _scatter(shift, g, out)


def ds_from_dz_offset(g: ConeGroup, state, ds, out):
    """out = Wᵀ(λ \\ ds), with (λ \\ Z)_ij = 2 Z_ij/(λ_i+λ_j).
    reference: :218-227, :336-354"""
    n = g.psd_n
    R, lam = state["R"], state["lam"]
    Z = svec_to_mat(_gather(ds, g), n)
    denom = lam[:, :, None] + lam[:, None, :]
    X = 2.0 * Z / denom
    Y = _mul_w_mat(R, X, transpose=True)
    return _scatter(out, g, mat_to_svec(Y, n))


def step_length(g: ConeGroup, state, dz, ds, z, s):
    """min over (z, s) of the eig-based max step.
    reference: :230-254, :439-466"""
    n = g.psd_n
    R, Rinv, lam = state["R"], state["Rinv"], state["lam"]
    lam_isqrt = 1.0 / jnp.sqrt(lam)

    def component(d_vec, Rx, transpose):
        D = svec_to_mat(_gather(d_vec, g), n)
        Dt = _mul_w_mat(Rx, D, transpose=transpose)
        M = lam_isqrt[:, :, None] * Dt * lam_isqrt[:, None, :]
        gamma = jnp.min(
            _eigvalsh_sym(0.5 * (M + jnp.swapaxes(M, -1, -2))), axis=-1
        )
        per = jnp.where(gamma < 0, 1.0 / jnp.maximum(-gamma, 1e-300), np.inf)
        return jnp.min(per)

    az = component(dz, R, False)          # WΔz = Rᵀ Δz R
    a_s = component(ds, Rinv, True)       # W⁻ᵀΔs = Rinv Δs Rinvᵀ
    return jnp.minimum(az, a_s)


def compute_barrier(g: ConeGroup, z, s, dz, ds, alpha):
    """-logdet(S) - logdet(Z) at the shifted point; +inf outside the cone."""
    n = g.psd_n
    pad = _pad_diag(g)

    def logdet_term(x, dx):
        X = _add_pad_eye(
            svec_to_mat(_gather(x, g) + alpha * _gather(dx, g), n), pad)
        L = jnp.linalg.cholesky(X)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        ok = jnp.all(jnp.isfinite(diag), axis=-1)
        val = 2.0 * jnp.sum(
            jnp.log(jnp.where(jnp.isfinite(diag) & (diag > 0), diag, 1.0)),
            axis=-1,
        )
        return jnp.sum(jnp.where(ok, -val, np.inf))

    return logdet_term(z, dz) + logdet_term(s, ds)
