"""Dense quasidefinite LDLᵀ factorization for TPU.

Replaces the reference's QDLDL sparse LDL backend (reference:
src/kktsolvers/direct-ldl/directldl_qdldl.jl:1-96) with a dense,
fixed-shape factorization:

* no pivoting — symmetric quasidefinite KKT matrices admit an LDLᵀ
  factorization for any symmetric permutation (Vanderbei 1995), and the
  solver supplies static regularization, so a static elimination order is
  safe;
* QDLDL-style *dynamic regularization* applied per pivot: if
  sign(j)·d(j) < eps then d(j) <- sign(j)·delta
  (reference: directldl_qdldl.jl dynamic regularization via Dsigns);
* fully vectorized: each elimination step is a masked rank-update matvec,
  so the factorization maps to (n, n)x(n,) products on the MXU and is
  `vmap`-compatible for batched instance solving.

The unblocked column loop runs n sequential steps of O(n²) work.  A blocked
right-looking variant (panel solve + MXU Schur update) is provided for
larger single instances.
"""


import jax
import jax.numpy as jnp
from jax import lax

from . import smallops as so


def ldl_factor(K, signs, dyn_eps=1e-13, dyn_delta=2e-7, dynamic_enable=True):
    """LDLᵀ factor of dense symmetric quasidefinite K with pivot signs.

    Args:
      K: (n, n) full symmetric matrix.
      signs: (n,) ±1 expected pivot signs (Dsigns).
      dyn_eps / dyn_delta: QDLDL dynamic regularization parameters.

    Returns:
      (L, d, ok): unit lower-triangular L, diagonal d, and a scalar bool
      `ok` true iff all pivots are finite and nonzero
      (reference success check: directldl_qdldl.jl:79, all-finite Dinv).
    """
    n = K.shape[0]
    idx = jnp.arange(n)

    def body(j, carry):
        L, d = carry
        # w_k = L[j,k] d_k for k < j
        w = jnp.where(idx < j, L[j, :] * d, 0.0)
        # c_i = K[i,j] - sum_{k<j} L[i,k] w_k   (masked matvec, MXU-friendly)
        c = K[:, j] - so.mv(L, w)
        dj = c[j]
        if dynamic_enable:
            sj = signs[j]
            dj = jnp.where(sj * dj < dyn_eps, sj * dyn_delta, dj)
        dj_safe = jnp.where(dj != 0, dj, 1.0)
        col = jnp.where(idx > j, c / dj_safe, 0.0)
        L = L.at[:, j].set(col.at[j].set(1.0))
        d = d.at[j].set(dj)
        return (L, d)

    L0 = jnp.zeros_like(K)
    d0 = jnp.zeros((n,), K.dtype)
    L, d = lax.fori_loop(0, n, body, (L0, d0))
    ok = jnp.logical_and(jnp.all(jnp.isfinite(d)), jnp.all(d != 0))
    return L, d, ok


def ldl_factor_unrolled(K, signs, dyn_eps=1e-13, dyn_delta=2e-7,
                        dynamic_enable=True, nb: int = 128):
    """LDLᵀ of dense symmetric quasidefinite K with trace-time-unrolled
    panels — no `lax.fori_loop`/`while_loop` anywhere.

    Same algorithm and dynamic-regularization semantics as `ldl_factor`
    (QDLDL-style sign-aware pivot clamping; reference:
    directldl_qdldl.jl), but the column loop is unrolled at trace time
    into straight-line fused rank-1 ops and the cross-panel trailing
    update is one matmul per panel.  Inside an outer `lax.while_loop`
    (the IPM loop) every fori trip pays ~6 µs sequencing overhead, so
    the loop-based factor costs ~n·6 µs regardless of flops; the
    unrolled form compiles to ~n fused ops that pipeline (see
    smallops.chol_blocked_unrolled for the cholesky analogue and the
    measured numbers).
    """
    n = K.shape[-1]
    L = jnp.zeros_like(K)
    dvals = []
    for k0 in range(0, n, nb):
        k1 = min(k0 + nb, n)
        w = k1 - k0
        panel = K[..., k0:, k0:k1]               # (..., n-k0, w)
        cols = []
        ds = []
        for j in range(w):
            dj = panel[..., j, j]
            if dynamic_enable:
                sj = signs[k0 + j]
                dj = jnp.where(sj * dj < dyn_eps, sj * dyn_delta, dj)
            dj_safe = jnp.where(dj != 0, dj, 1.0)
            col = panel[..., :, j] / dj_safe[..., None]
            col = col.at[..., :j].set(0.0)
            col = col.at[..., j].set(1.0)
            scaled = col * dj_safe[..., None]
            panel = panel - scaled[..., :, None] * col[..., None, :w]
            cols.append(col)
            ds.append(dj)
        Lpan = jnp.stack(cols, axis=-1)          # (..., n-k0, w)
        L = L.at[..., k0:, k0:k1].set(Lpan)
        dvals.extend(ds)
        if k1 < n:
            L21 = Lpan[..., w:, :]               # (..., n-k1, w)
            dpan = jnp.stack(ds, axis=-1)        # (..., w)
            S22 = L21 @ jnp.swapaxes(L21 * dpan[..., None, :], -1, -2)
            K = K.at[..., k1:, k1:].add(-S22)
    d = jnp.stack(dvals, axis=-1)
    ok = jnp.logical_and(jnp.all(jnp.isfinite(d)), jnp.all(d != 0))
    return L, d, ok


def ldl_solve(L, d, b):
    """Solve (L D Lᵀ) x = b.  Supports b of shape (n,) or (n, k)."""
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True, unit_diagonal=True)
    y = y / d[:, None]
    x = jax.scipy.linalg.solve_triangular(
        L.T, y, lower=False, unit_diagonal=True
    )
    return x[:, 0] if squeeze else x


def invert_unit_lower(L):
    """Explicit inverse of a unit lower-triangular matrix in O(log n)
    matmul steps.

    With N the strictly-lower part, L = I + N and N is nilpotent, so
       L⁻¹ = Σ_k (−N)^k = Π_j (I + (−N)^(2^j)).
    Each factor is one MXU matmul; total depth is 2·ceil(log2 n) matmuls
    instead of n sequential substitution steps.  This converts every
    subsequent triangular solve into two matmuls, which is the profitable
    trade on TPU where small sequential steps are latency-bound.
    """
    import math

    n = L.shape[-1]
    A = -(L - jnp.eye(n, dtype=L.dtype))  # A = -N, nilpotent
    inv = jnp.eye(n, dtype=L.dtype) + A
    power = A
    steps = max(0, math.ceil(math.log2(n)) - 1) if n > 1 else 0
    for _ in range(steps):
        power = so.mm(power, power)
        inv = inv + so.mm(inv, power)
    return inv


def ldl_solve_via_inverse(Linv, d, b):
    """Solve (L D Lᵀ) x = b given the explicit L⁻¹: two matmuls + scale."""
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    y = so.mv(Linv, b)
    y = y / d[:, None]
    x = so.rmv(Linv, y)
    return x[:, 0] if squeeze else x


def ldl_factor_blocked(K, signs, dyn_eps=1e-13, dyn_delta=2e-7,
                       dynamic_enable=True, block=128):
    """Blocked right-looking LDLᵀ: diagonal blocks factored with the
    unblocked loop, panels via triangular solve, trailing update via one
    MXU matmul per block step.  Requires n % block == 0 (callers pad)."""
    n = K.shape[0]
    assert n % block == 0
    nb = n // block
    idx = jnp.arange(n)

    def step(kb, carry):
        W, d = carry  # W holds both the evolving Schur complement and L
        j0 = kb * block
        # extract the current diagonal block of the working matrix
        Kbb = lax.dynamic_slice(W, (j0, j0), (block, block))
        sb = lax.dynamic_slice(signs, (j0,), (block,))
        Lbb, db, _ = ldl_factor(Kbb, sb, dyn_eps, dyn_delta, dynamic_enable)
        # panel: rows below the block, masked so earlier/later rows are inert
        panel = lax.dynamic_slice(W, (0, j0), (n, block))
        row_mask = (idx >= j0 + block)[:, None]
        panel = jnp.where(row_mask, panel, 0.0)
        # solve panel * (Lbb D)^-T:  Lsub = panel Lbb^-T D^-1
        Lsub = jax.scipy.linalg.solve_triangular(
            Lbb, panel.T, lower=True, unit_diagonal=True
        ).T
        Lsub = Lsub / db[None, :]
        # trailing Schur update: W -= Lsub D Lsubᵀ (masked to trailing block)
        upd = (Lsub * db[None, :]) @ Lsub.T
        W = W - jnp.where(row_mask & row_mask.T, upd, 0.0)
        # write factors back
        Lcol = jnp.where(row_mask, Lsub, 0.0)
        Lcol = lax.dynamic_update_slice(
            Lcol, Lbb * jnp.tril(jnp.ones((block, block), K.dtype)), (j0, 0)
        )
        W = lax.dynamic_update_slice(W, Lcol, (0, j0))
        d = lax.dynamic_update_slice(d, db, (j0,))
        return (W, d)

    W, d = lax.fori_loop(0, nb, step, (K, jnp.zeros((n,), K.dtype)))
    L = jnp.tril(W, -1) + jnp.eye(n, dtype=K.dtype)
    ok = jnp.logical_and(jnp.all(jnp.isfinite(d)), jnp.all(d != 0))
    return L, d, ok
