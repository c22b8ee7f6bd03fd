"""Generic iterative refinement around any KKT apply function.

Mirrors the reference's refinement loop (reference:
src/kktsolvers/kktsolver_directldl.jl:389-449,455-466): residual
stop-ratio test, accept-or-rollback, abstol+reltol·‖b‖ target.  The
residual is computed with a parts-composed KKT matvec so the (n+m)²
matrix is never materialized.
"""

import jax.numpy as jnp
from jax import lax


def solve_refined(apply_fn, kkt_mv, rhs, settings):
    """x ≈ K⁻¹ rhs via apply_fn, refined against kkt_mv.

    Returns (x, ok)."""
    x = apply_fn(rhs)

    abstol = settings.iterative_refinement_abstol
    reltol = settings.iterative_refinement_reltol
    stop_ratio = settings.iterative_refinement_stop_ratio
    max_iter = settings.iterative_refinement_max_iter

    normb = jnp.max(jnp.abs(rhs))
    e0 = rhs - kkt_mv(x)
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
        dx = apply_fn(e)
        xnew = x + dx
        enew = rhs - kkt_mv(xnew)
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
