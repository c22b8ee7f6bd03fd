"""Block-arrow structured KKT backend (in-loop).

Uses a host-computed BlockArrowPlan (structure.py) to factor the KKT as p
independent diagonal-block LDLs plus one dense Schur complement — the
same math as the multi-device Schur solver (parallel/schur.py), here
vmapped on one device.  Per-iteration work drops from O(N³) dense to
O(p·nb³ + nb²·nt·p + nt³), a large win for banded / grid /
multi-scenario problems; on a mesh the vmap axis shards over `tp`.

Iterative refinement against the full unpermuted KKT preserves accuracy,
exactly as in the dense and condensed backends.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..linalg.ldl import ldl_factor, ldl_factor_blocked, ldl_solve
from ..structure import BlockArrowPlan


class BlockArrowFactorS(NamedTuple):
    Lb: jnp.ndarray       # (p, nb, nb)
    db: jnp.ndarray       # (p, nb)
    DinvB: jnp.ndarray    # (p, nb, nt)
    Bc: jnp.ndarray       # (p, nb, nt) coupling blocks
    Ls: jnp.ndarray       # (nt, nt)
    ds: jnp.ndarray       # (nt,)
    ok: jnp.ndarray


def make_kkt_matvec(P, A, layout, state):
    """Matvec with the TRUE augmented KKT, composed from its parts —
    avoids materializing the N x N matrix for iterative refinement.
    Works for dense or SparseCOO P/A (linalg.matops)."""
    from ..cones import ops as cone_ops
    from ..linalg import matops

    n = matops.nrows(P)

    def matvec(x):
        vec_in = x.ndim == 1
        X = x[:, None] if vec_in else x
        x1, x2 = X[:n], X[n:]
        top = matops.mv(P, x1) + matops.rmv(A, x2)
        k = X.shape[1]
        Hx2 = jnp.stack(
            [cone_ops.mul_Hs(layout, state, x2[:, i]) for i in range(k)],
            axis=1,
        )
        bot = matops.mv(A, x1) - Hx2
        out = jnp.concatenate([top, bot], axis=0)
        return out[:, 0] if vec_in else out

    return matvec


def assemble_and_factor_blockarrow(P, A, Hs, plan: BlockArrowPlan, signs,
                                   settings, factor_dtype):
    n, m = plan.n, plan.m
    N = n + m
    K_true = jnp.block([[P, A.T], [A, -Hs]])

    diag = jnp.diagonal(K_true)
    maxdiag = jnp.max(jnp.abs(diag))
    eps = (
        settings.static_regularization_constant
        + settings.static_regularization_proportional * maxdiag
    )
    K_reg = (K_true + jnp.diag(signs * eps)).astype(jnp.dtype(factor_dtype))

    # pad with an identity row/col so sentinel gathers yield unit pivots
    Kp = jnp.zeros((N + 1, N + 1), K_reg.dtype)
    Kp = Kp.at[:N, :N].set(K_reg)
    Kp = Kp.at[N, N].set(1.0)

    bi = jnp.asarray(plan.block_idx)
    ti = jnp.asarray(plan.tail_idx)
    D = Kp[bi[:, :, None], bi[:, None, :]]
    Bc = Kp[bi[:, :, None], ti[None, None, :]]
    C = Kp[ti[:, None], ti[None, :]]

    bsigns = jnp.asarray(plan.block_signs, K_reg.dtype)
    tsigns = jnp.asarray(plan.tail_signs, K_reg.dtype)

    dyn = dict(
        dyn_eps=settings.dynamic_regularization_eps,
        dyn_delta=settings.dynamic_regularization_delta,
        dynamic_enable=settings.dynamic_regularization_enable,
    )
    # large blocks: MXU-friendly 128-blocked right-looking factorization
    # (plan pads nb to a multiple of 128 in that regime)
    if plan.nb >= 192 and plan.nb % 128 == 0:
        factor_one = lambda Kb, sb: ldl_factor_blocked(Kb, sb, **dyn)
    else:
        factor_one = lambda Kb, sb: ldl_factor(Kb, sb, **dyn)
    Lb, db, okb = jax.vmap(factor_one)(D, bsigns)
    DinvB = jax.vmap(ldl_solve)(Lb, db, Bc)
    S = C - jnp.einsum("pij,pik->jk", Bc, DinvB)
    Ls, ds, oks = ldl_factor(S, tsigns, **dyn)
    ok = jnp.logical_and(jnp.all(okb), oks)
    return BlockArrowFactorS(Lb, db, DinvB, Bc, Ls, ds, ok)


def _ba_apply(fac: BlockArrowFactorS, plan: BlockArrowPlan, rhs):
    """Apply the factorization to rhs (N,) or (N, k)."""
    vec_in = rhs.ndim == 1
    R = rhs[:, None] if vec_in else rhs
    out_dtype = R.dtype
    Rf = R.astype(fac.Lb.dtype)

    bi = jnp.asarray(plan.block_idx)
    ti = jnp.asarray(plan.tail_idx)
    rb = Rf.at[bi].get(mode="fill", fill_value=0.0)    # (p, nb, k)
    rt = Rf[ti]                                        # (nt, k)

    u = jax.vmap(ldl_solve)(fac.Lb, fac.db, rb)        # (p, nb, k)
    red = rt - jnp.einsum("pij,pik->jk", fac.Bc, u)
    y = ldl_solve(fac.Ls, fac.ds, red)                 # (nt, k)
    xb = u - jnp.einsum("pij,jk->pik", fac.DinvB, y)

    out = jnp.zeros(R.shape, fac.Lb.dtype)
    out = out.at[bi].set(xb, mode="drop")
    out = out.at[ti].set(y)
    out = out.astype(out_dtype)
    return out[:, 0] if vec_in else out


def solve_refined_blockarrow(fac, plan, kkt_mv, rhs, settings):
    """Block-arrow solve + iterative refinement on the augmented residual
    (computed with the parts-composed matvec, not a materialized K)."""
    from .refine import solve_refined

    return solve_refined(
        lambda r: _ba_apply(fac, plan, r), kkt_mv, rhs, settings
    )


def kkt_solve_xz_blockarrow(fac, plan, kkt_mv, bx, bz, settings):
    n = bx.shape[0]
    sol, ok = solve_refined_blockarrow(
        fac, plan, kkt_mv, jnp.concatenate([bx, bz]), settings
    )
    return sol[:n], sol[n:], ok


def kkt_solve_xz2_blockarrow(fac, plan, kkt_mv, bx1, bz1, bx2, bz2, settings):
    n = bx1.shape[0]
    rhs = jnp.stack(
        [jnp.concatenate([bx1, bz1]), jnp.concatenate([bx2, bz2])], axis=1
    )
    sol, ok = solve_refined_blockarrow(fac, plan, kkt_mv, rhs, settings)
    return sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1], ok
