"""Dense KKT system functions for the TPU IPM core.

Replaces the reference's sparse CSC KKT assembly + DirectLDL solver stack
(reference: src/kktsolvers/kktsolver_directldl.jl,
src/kktsolvers/direct-ldl/directldl_kkt_assembly.jl) with a dense,
fixed-shape formulation:

    K = [ P   Aᵀ ]      Dsigns = (+1 ×n, −1 ×m)
        [ A  −Hs ]

* static regularization ±ε on the diagonal with
  ε = const + proportional·‖diag K‖∞
  (reference: kktsolver_directldl.jl:247-310);
* dynamic per-pivot regularization inside the LDL kernel;
* iterative refinement against the *unregularized* K
  (reference: kktsolver_directldl.jl:389-449).

Dense is the right first-order choice on TPU: the factorization becomes
MXU matmuls, and sparse-cone expansions (SOC rank-2, genpow rank-3) are
unnecessary because dense Hs blocks cost nothing extra.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..linalg.ldl import (
    ldl_factor, ldl_solve, invert_unit_lower, ldl_solve_via_inverse,
)
from ..linalg import smallops as so


class KKTFactor(NamedTuple):
    L: jnp.ndarray
    d: jnp.ndarray
    K_true: jnp.ndarray  # unregularized KKT matrix (for iterative refinement)
    ok: jnp.ndarray      # scalar bool
    Linv: jnp.ndarray    # explicit L⁻¹ (zeros-shaped dummy when disabled)
    perm: jnp.ndarray    # elimination order ((1,) dummy when natural)
    iperm: jnp.ndarray   # inverse permutation ((1,) dummy when natural)


def _use_inverse(settings, N: int) -> bool:
    flag = settings.dense_solve_via_inverse
    if flag is None:
        # latency-bound regime: explicit inverse wins for small/medium KKT
        return N <= 512
    return bool(flag)


def _use_pallas(settings, factor_dtype, N: int) -> bool:
    flag = getattr(settings, "use_pallas", None)
    if flag is not None and not flag:
        return False
    if jnp.dtype(factor_dtype) != jnp.float32:
        return False  # the lane-batched kernel is f32
    if N > 80:
        return False  # VMEM block budget
    if flag:
        return True
    # auto (None): on for TPU backends.  (The historical "failed to
    # legalize func.return" Mosaic rejection was x64-traced index maps;
    # the kernel now traces its pallas_call under jax.enable_x64(False).)
    import jax

    return jax.default_backend() == "tpu"


def _factor_solve(fac: KKTFactor, rhs):
    """Apply the factorization at its own dtype, returning rhs's dtype
    (mixed precision: f32 factor applied to f64 residuals, accumulation
    stays in f64)."""
    out_dtype = rhs.dtype
    rhs_f = rhs.astype(fac.L.dtype)
    if fac.perm.size > 1:
        rhs_f = rhs_f[fac.perm]
    if fac.Linv.size > 1:
        x = ldl_solve_via_inverse(fac.Linv, fac.d, rhs_f)
    else:
        x = ldl_solve(fac.L, fac.d, rhs_f)
    if fac.perm.size > 1:
        x = x[fac.iperm]
    return x.astype(out_dtype)


def assemble_and_factor(P, A, Hs, signs, settings, factor_dtype=None):
    """Build K, apply static regularization, LDL-factor."""
    n = P.shape[0]
    m = A.shape[0]
    K_true = jnp.block([[P, A.T], [A, -Hs]])

    if settings.static_regularization_enable:
        diag = jnp.diagonal(K_true)
        maxdiag = jnp.max(jnp.abs(diag))
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional * maxdiag
        )
        K_reg = K_true + jnp.diag(signs * eps)
    else:
        K_reg = K_true

    # optional lower-precision factorization: iterative refinement against
    # the full-precision K_true recovers accuracy (mixed-precision mode)
    if factor_dtype is None:
        factor_dtype = settings.factor_dtype
    factor_dtype = jnp.dtype(factor_dtype)
    K_fac = K_reg.astype(factor_dtype)

    use_pallas = _use_pallas(settings, factor_dtype, n + m)
    # pivot-growth control: eliminate in DESCENDING |diag| order.  For
    # quasidefinite K any symmetric permutation admits a signed LDLᵀ
    # (Vanderbei); the natural [x-block; z-block] order fails when the
    # leading diagonal is tiny relative to the trailing block (P = 0
    # with a large SOC: the ±ε-regularized x pivots come first and the
    # multipliers grow like ‖A‖/ε — measured NUMERICAL_ERROR at
    # iteration 1 on robust-LS, docs/STATUS.md).  Largest-pivot-first
    # eliminates the well-scaled block early and defers near-singular
    # pivots to the trailing submatrix, the role AMD + per-pivot
    # dynamic regularization plays in the reference
    # (directldl_qdldl.jl:17-25,60-88).  Skipped on the lane-batched
    # Pallas path, whose kernel specializes on static (trace-time)
    # Dsigns.
    diag_order = getattr(settings, "dense_ldl_diag_order", None)
    if diag_order is None:
        # un-resolved auto (caller outside build_solve): conservative off
        diag_order = False
    if use_pallas:
        # the lane-batched Pallas factor specializes on static Dsigns
        diag_order = False
    if diag_order:
        perm = jnp.argsort(-jnp.abs(jnp.diagonal(K_reg)))
        iperm = jnp.argsort(perm)
        K_fac = K_fac[perm][:, perm]
        signs = signs[perm]
    else:
        perm = jnp.zeros((1,), jnp.int32)
        iperm = perm

    if use_pallas:
        # fused lane-batched Pallas factor+inverse; under the batched
        # solver's vmap this hits one kernel for the whole instance batch
        from ..linalg.pallas_ldl import make_factor_inverse
        import numpy as _np

        fi = make_factor_inverse(
            _np.asarray(signs),
            settings.dynamic_regularization_eps,
            settings.dynamic_regularization_delta,
            settings.dynamic_regularization_enable,
        )
        Linv, d, ok = fi(K_fac)
        return KKTFactor(Linv, d, K_true, ok, Linv, perm, iperm)

    N = n + m
    if N > 512:
        # blocked right-looking factorization: panel solves + one MXU
        # Schur-update matmul per 128-column block step
        from ..linalg.ldl import ldl_factor_blocked

        pad = (-N) % 128
        if pad:
            Kp = jnp.zeros((N + pad, N + pad), K_fac.dtype)
            Kp = Kp.at[:N, :N].set(K_fac)
            Kp = Kp.at[jnp.arange(N, N + pad), jnp.arange(N, N + pad)].set(1.0)
            sp = jnp.concatenate(
                [signs.astype(factor_dtype),
                 jnp.ones((pad,), factor_dtype)]
            )
        else:
            Kp, sp = K_fac, signs.astype(factor_dtype)
        Lp, dp, ok = ldl_factor_blocked(
            Kp, sp,
            dyn_eps=settings.dynamic_regularization_eps,
            dyn_delta=settings.dynamic_regularization_delta,
            dynamic_enable=settings.dynamic_regularization_enable,
        )
        L, d = Lp[:N, :N], dp[:N]
    else:
        import jax as _jax

        if N > 32 and _jax.default_backend() != "cpu":
            # trace-time-unrolled panels: the fori-loop factor pays ~6 µs
            # sequencing per trip when nested inside the IPM while_loop
            # (see linalg.ldl.ldl_factor_unrolled); straight-line code
            # pipelines.  CPU keeps the loop form (fast there, and the
            # unrolled trace slows test compiles).
            from ..linalg.ldl import ldl_factor_unrolled

            L, d, ok = ldl_factor_unrolled(
                K_fac,
                signs,
                dyn_eps=settings.dynamic_regularization_eps,
                dyn_delta=settings.dynamic_regularization_delta,
                dynamic_enable=settings.dynamic_regularization_enable,
            )
        else:
            L, d, ok = ldl_factor(
                K_fac,
                signs.astype(factor_dtype),
                dyn_eps=settings.dynamic_regularization_eps,
                dyn_delta=settings.dynamic_regularization_delta,
                dynamic_enable=settings.dynamic_regularization_enable,
            )
    if _use_inverse(settings, N):
        Linv = invert_unit_lower(L)
    else:
        Linv = jnp.zeros((1,), K_true.dtype)
    return KKTFactor(L, d, K_true, ok, Linv, perm, iperm)


def solve_refined(fac: KKTFactor, rhs, settings):
    """LDL solve + iterative refinement (reference: kktsolver_directldl.jl:389-466).

    Returns (x, ok) where ok indicates a finite refined residual.
    """
    x = _factor_solve(fac, rhs)

    if not settings.iterative_refinement_enable:
        return x, jnp.all(jnp.isfinite(x))

    abstol = settings.iterative_refinement_abstol
    reltol = settings.iterative_refinement_reltol
    stop_ratio = settings.iterative_refinement_stop_ratio
    max_iter = settings.iterative_refinement_max_iter

    normb = jnp.max(jnp.abs(rhs))
    e0 = rhs - so.mv(fac.K_true, x)
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
        dx = _factor_solve(fac, e)
        xnew = x + dx
        enew = rhs - so.mv(fac.K_true, xnew)
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
        # unrolled accept-masked passes: a lax.while_loop boundary forces
        # carried-buffer copies + sequencing overhead every trip on TPU;
        # unrolled passes fuse and later passes become no-ops (same
        # scheme as the condensed backend's refinement)
        for _ in range(max_iter):
            carry = body(carry, masked=True)
        _, x, _, _, _, ok = carry
    else:
        def cond(carry):
            return jnp.logical_and(carry[0] < max_iter, active(carry))

        _, x, _, _, _, ok = lax.while_loop(
            cond, lambda c: body(c, masked=False), carry
        )
    return x, ok


def kkt_solve_xz(fac: KKTFactor, bx, bz, settings):
    """Solve the (n+m) KKT system with RHS [bx; bz]; split the result."""
    n = bx.shape[0]
    rhs = jnp.concatenate([bx, bz])
    sol, ok = solve_refined(fac, rhs, settings)
    return sol[:n], sol[n:], ok


def kkt_solve_xz2(fac: KKTFactor, bx1, bz1, bx2, bz2, settings):
    """Two KKT solves as one multi-RHS solve (shared factor application +
    joint iterative refinement): returns (x1, z1, x2, z2, ok)."""
    n = bx1.shape[0]
    rhs = jnp.stack(
        [jnp.concatenate([bx1, bz1]), jnp.concatenate([bx2, bz2])], axis=1
    )
    sol, ok = solve_refined(fac, rhs, settings)
    return sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1], ok
