"""Condensed (normal-equations) KKT backend.

Eliminates the conic block analytically instead of factoring the full
augmented system: with Hs⁻¹ available in closed form per cone (see
cones.ops.mul_Hs_inv), the step equations

    [P  Aᵀ] [x]   [bx]
    [A  -H ] [z] = [bz]

reduce to  (P + εI + Aᵀ H⁻¹ A) x = bx + Aᵀ H⁻¹ bz,  z = H⁻¹(A x − bz).

On TPU this replaces the column-by-column LDL elimination (hundreds of
small sequential kernels per IPM iteration) with a handful of large
batched ops: one matmul chain to build the Schur matrix S, one fused
`jnp.linalg.cholesky`, and matmul triangular solves.  The squared
conditioning of the normal equations is compensated by iterative
refinement against the TRUE augmented KKT matrix, exactly as the LDL
backend refines against its unregularized matrix.

Zero cones have Hs = 0 (equality rows); their block is regularized to εI
— the same static regularization the reference applies to those KKT
diagonals (reference: kktsolver_directldl.jl:247-310) — and the
refinement loop removes the ε-perturbation from the solution.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..cones import ops as cone_ops


class CondensedFactor(NamedTuple):
    Lchol: jnp.ndarray    # (n, n) Cholesky factor of S
    K_true: jnp.ndarray   # full (n+m, n+m) KKT for refinement
    A: jnp.ndarray
    eps: jnp.ndarray      # () zero-cone regularization
    ok: jnp.ndarray


def assemble_and_factor_condensed(P, A, Hs_dense, layout, state, signs,
                                  settings, factor_dtype):
    """Hs_dense is only used for K_true (refinement); the condensed system
    itself uses the closed-form Hs⁻¹."""
    n = P.shape[0]
    K_true = jnp.block([[P, A.T], [A, -Hs_dense]])

    diag = jnp.diagonal(K_true)
    maxdiag = jnp.max(jnp.abs(diag))
    eps = (
        settings.static_regularization_constant
        + settings.static_regularization_proportional * maxdiag
    )

    HinvA = cone_ops.mul_Hs_inv(layout, state, A, eps)     # (m, n)
    S = P + A.T @ HinvA
    S = S + eps * jnp.eye(n, dtype=S.dtype)

    Lchol = jnp.linalg.cholesky(S.astype(jnp.dtype(factor_dtype)))
    ok = jnp.all(jnp.isfinite(Lchol))
    Lchol = jnp.where(jnp.isfinite(Lchol), Lchol, 0.0)
    return CondensedFactor(Lchol, K_true, A, jnp.asarray(eps), ok), state


def _condensed_apply(fac: CondensedFactor, layout, state, rhs):
    """One application of the condensed inverse to rhs = [bx; bz];
    supports (n+m,) and (n+m, k)."""
    n = fac.Lchol.shape[0]
    out_dtype = rhs.dtype
    bx, bz = rhs[:n], rhs[n:]
    Hinv_bz = cone_ops.mul_Hs_inv(layout, state, bz, fac.eps)
    w = (bx + fac.A.T @ Hinv_bz).astype(fac.Lchol.dtype)
    y = jax.scipy.linalg.solve_triangular(fac.Lchol, w, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        fac.Lchol.T, y, lower=False
    ).astype(out_dtype)
    z = cone_ops.mul_Hs_inv(layout, state, fac.A @ x - bz, fac.eps)
    return jnp.concatenate([x, z])


def solve_refined_condensed(fac: CondensedFactor, layout, state, rhs,
                            settings):
    """Condensed solve + iterative refinement on the augmented residual
    (same scheme as kkt.dense.solve_refined)."""
    x = _condensed_apply(fac, layout, state, rhs)

    abstol = settings.iterative_refinement_abstol
    reltol = settings.iterative_refinement_reltol
    stop_ratio = settings.iterative_refinement_stop_ratio
    max_iter = settings.iterative_refinement_max_iter

    normb = jnp.max(jnp.abs(rhs))
    e0 = rhs - fac.K_true @ x
    norme0 = jnp.max(jnp.abs(e0))
    ok0 = jnp.isfinite(norme0)

    def cond(carry):
        i, x, e, norme, done, ok = carry
        return jnp.logical_and(
            jnp.logical_and(i < max_iter, jnp.logical_not(done)),
            jnp.logical_and(ok, norme > abstol + reltol * normb),
        )

    def body(carry):
        i, x, e, norme, done, ok = carry
        dx = _condensed_apply(fac, layout, state, e)
        xnew = x + dx
        enew = rhs - fac.K_true @ xnew
        nn = jnp.max(jnp.abs(enew))
        okn = jnp.isfinite(nn)
        ratio = norme / jnp.where(nn != 0, nn, jnp.finfo(nn.dtype).tiny)
        stop = ratio < stop_ratio
        accept = jnp.logical_and(okn, jnp.logical_or(~stop, ratio > 1.0))
        x = jnp.where(accept, xnew, x)
        e = jnp.where(accept, enew, e)
        norme = jnp.where(accept, nn, norme)
        return (i + 1, x, e, norme, jnp.logical_or(stop, ~okn),
                jnp.logical_and(ok, okn))

    _, x, _, norme, _, ok = lax.while_loop(
        cond, body, (jnp.asarray(0), x, e0, norme0, jnp.asarray(False), ok0)
    )
    return x, jnp.logical_and(ok, jnp.isfinite(norme))


def kkt_solve_xz_condensed(fac, layout, state, bx, bz, settings):
    n = bx.shape[0]
    sol, ok = solve_refined_condensed(
        fac, layout, state, jnp.concatenate([bx, bz]), settings
    )
    return sol[:n], sol[n:], ok


def kkt_solve_xz2_condensed(fac, layout, state, bx1, bz1, bx2, bz2,
                            settings):
    """Two condensed solves as one multi-RHS solve with joint refinement."""
    n = bx1.shape[0]
    rhs = jnp.stack(
        [jnp.concatenate([bx1, bz1]), jnp.concatenate([bx2, bz2])], axis=1
    )
    sol, ok = solve_refined_condensed(fac, layout, state, rhs, settings)
    return sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1], ok
