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

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..cones import ops as cone_ops
from ..linalg import smallops as so


class CondensedFactor(NamedTuple):
    Lchol: jnp.ndarray    # (n, n) Cholesky factor of S
    Linv: Optional[jnp.ndarray]  # explicit L⁻¹ (None on the small-n path)
    A: jnp.ndarray
    eps: jnp.ndarray      # () zero-cone regularization
    ok: jnp.ndarray


def assemble_and_factor_condensed(P, A, layout, state, signs,
                                  settings, factor_dtype):
    """The condensed system uses the closed-form Hs⁻¹; the true augmented
    KKT is never materialized — refinement residuals apply it as an
    operator (kkt.blockarrow.make_kkt_matvec)."""
    n = P.shape[0]
    hsd = cone_ops.hs_diag(layout, state, P.dtype)
    maxdiag = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(P))),
        jnp.max(jnp.abs(hsd)) if hsd.shape[0] else jnp.asarray(0.0, P.dtype),
    )
    eps = (
        settings.static_regularization_constant
        + settings.static_regularization_proportional * maxdiag
    )

    HinvA = cone_ops.mul_Hs_inv(layout, state, A, eps)     # (m, n)
    S = P + so.rmv(A, HinvA)
    S = S + eps * jnp.eye(n, dtype=S.dtype)

    Sf = S.astype(jnp.dtype(factor_dtype))
    if 32 < n <= 2048 and jax.default_backend() != "cpu":
        # trace-time-unrolled blocked factorization: XLA's cholesky keeps
        # its column loops as nested HLO whiles inside the IPM while_loop
        # and pays ~6 µs sequencing per trip (32 ms/factor at n=502 f64
        # measured on v5e vs 0.09 ms standalone); the unrolled panels
        # compile to straight-line fused code (see smallops docstring)
        Lchol = so.chol_blocked_unrolled(Sf)
    else:
        Lchol = so.chol_small(Sf)
    ok = jnp.all(jnp.isfinite(Lchol))
    Lchol = jnp.where(jnp.isfinite(Lchol), Lchol, 0.0)
    if n <= 32 and jnp.dtype(factor_dtype) == jnp.float64:
        Linv = None  # unrolled-substitution path, no inverse needed
    else:
        # explicit L⁻¹ once per factor: solve_triangular against I costs
        # one blocked pass (0.12 ms at n=502 f64 on v5e) while the same
        # call with a skinny per-solve RHS costs 7.3 ms — every apply
        # (and every refinement pass) becomes two plain matvecs instead
        # of two sequential blocked solves.  Accuracy loss vs in-place
        # solves is restored by refinement against the true KKT operator
        # (same trade as the dense LDL backend's log-depth inverse).
        Linv = jax.scipy.linalg.solve_triangular(
            Lchol, jnp.eye(n, dtype=Lchol.dtype), lower=True
        )
        Linv = jnp.where(jnp.isfinite(Linv), Linv, 0.0)
    return CondensedFactor(Lchol, Linv, A, jnp.asarray(eps), ok), state


def _condensed_apply(fac: CondensedFactor, layout, state, rhs):
    """One application of the condensed inverse to rhs = [bx; bz];
    supports (n+m,) and (n+m, k)."""
    n = fac.Lchol.shape[0]
    out_dtype = rhs.dtype
    bx, bz = rhs[:n], rhs[n:]
    Hinv_bz = cone_ops.mul_Hs_inv(layout, state, bz, fac.eps)
    w = (bx + so.rmv(fac.A, Hinv_bz)).astype(fac.Lchol.dtype)
    if fac.Linv is None:
        # unrolled substitution — avoids the f64 triangular-solve lowering
        # (which is bit-accurate true f64 but ~3x slower end to end; on
        # TPU's f32-pair f64 emulation a fraction of marginal batch lanes
        # end ALMOST_SOLVED instead of SOLVED — measured 4071+25 vs
        # 4084+12 of 4096 — an accepted trade for the speed)
        y = so.solve_lower_small(fac.Lchol, w)
        x = so.solve_upper_from_lower_small(fac.Lchol, y).astype(out_dtype)
    else:
        y = fac.Linv @ w
        x = (fac.Linv.T @ y).astype(out_dtype)
    z = cone_ops.mul_Hs_inv(layout, state, so.mv(fac.A, x) - bz, fac.eps)
    return jnp.concatenate([x, z])


def solve_refined_condensed(fac: CondensedFactor, layout, state, kkt_mv,
                            rhs, settings):
    """Condensed solve + iterative refinement on the augmented residual
    (same scheme as kkt.dense.solve_refined).  `kkt_mv` applies the TRUE
    augmented KKT (never materialized).

    For small systems the refinement loop is fully unrolled with
    accept-masking instead of a `lax.while_loop`: on TPU the loop
    boundary forces carried-buffer copies every trip, which dominated the
    profile; unrolled passes fuse and the masking preserves the exact
    accept/stop semantics of the loop (later passes become no-ops)."""
    x = _condensed_apply(fac, layout, state, rhs)

    # The normal equations square the KKT conditioning, so refinement must
    # run to the f64 floor — with the reference's default thresholds
    # (1e-12/1e-13) marginal IPM lanes stall several iterations before
    # termination (measured: 4066/4096 solved, max 24 iters vs 4096/4096,
    # max 14 with the floor).  Extra passes are accept-masked and cheap.
    abstol = min(settings.iterative_refinement_abstol, 1e-14)
    reltol = min(settings.iterative_refinement_reltol, 1e-15)
    stop_ratio = settings.iterative_refinement_stop_ratio
    max_iter = settings.iterative_refinement_max_iter

    normb = jnp.max(jnp.abs(rhs))
    e0 = rhs - kkt_mv(x)
    norme0 = jnp.max(jnp.abs(e0))
    ok0 = jnp.isfinite(norme0)

    def active(carry):
        i, x, e, norme, done, ok = carry
        return jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(ok, norme > abstol + reltol * normb),
        )

    def body(carry, masked: bool):
        i, x, e, norme, done, ok = carry
        dx = _condensed_apply(fac, layout, state, e)
        xnew = x + dx
        enew = rhs - kkt_mv(xnew)
        nn = jnp.max(jnp.abs(enew))
        okn = jnp.isfinite(nn)
        ratio = norme / jnp.where(nn != 0, nn, jnp.finfo(nn.dtype).tiny)
        stop = ratio < stop_ratio
        accept = jnp.logical_and(okn, jnp.logical_or(~stop, ratio > 1.0))
        if masked:
            act = active(carry)
            accept = jnp.logical_and(accept, act)
            done = jnp.where(act, jnp.logical_or(stop, ~okn), done)
            ok = jnp.where(act, jnp.logical_and(ok, okn), ok)
        else:
            done = jnp.logical_or(stop, ~okn)
            ok = jnp.logical_and(ok, okn)
        x = jnp.where(accept, xnew, x)
        e = jnp.where(accept, enew, e)
        norme = jnp.where(accept, nn, norme)
        return (i + 1, x, e, norme, done, ok)

    carry = (jnp.asarray(0), x, e0, norme0, jnp.asarray(False), ok0)
    if rhs.shape[0] <= 256:
        for _ in range(max_iter):
            carry = body(carry, masked=True)
        _, x, _, norme, _, ok = carry
    else:
        def cond(carry):
            return jnp.logical_and(carry[0] < max_iter, active(carry))

        _, x, _, norme, _, ok = lax.while_loop(
            cond, lambda c: body(c, masked=False), carry
        )
    return x, jnp.logical_and(ok, jnp.isfinite(norme))


def kkt_solve_xz_condensed(fac, layout, state, kkt_mv, bx, bz, settings):
    n = bx.shape[0]
    sol, ok = solve_refined_condensed(
        fac, layout, state, kkt_mv, jnp.concatenate([bx, bz]), settings
    )
    return sol[:n], sol[n:], ok


def kkt_solve_xz2_condensed(fac, layout, state, kkt_mv, bx1, bz1, bx2, bz2,
                            settings):
    """Two condensed solves as one multi-RHS solve with joint refinement."""
    n = bx1.shape[0]
    rhs = jnp.stack(
        [jnp.concatenate([bx1, bz1]), jnp.concatenate([bx2, bz2])], axis=1
    )
    sol, ok = solve_refined_condensed(fac, layout, state, kkt_mv, rhs,
                                      settings)
    return sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1], ok
