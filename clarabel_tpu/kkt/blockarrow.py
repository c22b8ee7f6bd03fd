"""Block-arrow structured KKT backend (in-loop).

Uses a host-computed BlockArrowPlan (structure.py) to factor the KKT as p
independent diagonal-block LDLs plus one dense Schur complement — the
same math as the multi-device Schur solver (parallel/schur.py), here
vmapped on one device.  Per-iteration work drops from O(N³) dense to
O(p·nb³ + nb²·nt·p + nt³), a large win for banded / grid /
multi-scenario problems; on a mesh the vmap axis shards over `tp`.

Iterative refinement against the full unpermuted KKT preserves accuracy,
exactly as in the dense and condensed backends.

Multi-device: pass a `jax.sharding.Mesh` with a `tp` axis and the block
axis runs under `shard_map` — each device factors its local diagonal
blocks and one `psum` over ICI reduces the dense Schur complement, which
every device factors redundantly (the TPU-native counterpart of the
reference's multithreaded-Pardiso parallel factorization,
reference: ext/directldl_pardiso.jl, src/settings.jl:108-110).
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as PS

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


_FACTOR_SPEC = None  # built lazily (needs PS instances)


def _fac_pspec(axis):
    return BlockArrowFactorS(
        Lb=PS(axis), db=PS(axis), DinvB=PS(axis), Bc=PS(axis),
        Ls=PS(), ds=PS(), ok=PS(),
    )


def _dyn_kwargs(settings):
    return dict(
        dyn_eps=settings.dynamic_regularization_eps,
        dyn_delta=settings.dynamic_regularization_delta,
        dynamic_enable=settings.dynamic_regularization_enable,
    )


def _pick_factor_one(nb, dyn):
    # large blocks: MXU-friendly 128-blocked right-looking factorization
    # (plan pads nb to a multiple of 128 in that regime)
    if nb >= 192 and nb % 128 == 0:
        return lambda Kb, sb: ldl_factor_blocked(Kb, sb, **dyn)
    return lambda Kb, sb: ldl_factor(Kb, sb, **dyn)


def factor_blocks(D, Bc, C, bsigns, tsigns, settings,
                  mesh: Optional[Mesh] = None, axis: str = "tp"):
    """Shared block-arrow numeric factorization: p block LDLs + dense
    Schur.  With a mesh, the block axis shards over `axis` and the Schur
    complement is psum-reduced over ICI; the (small, dense) Schur factor
    is computed redundantly on every device."""
    dyn = _dyn_kwargs(settings)
    factor_one = _pick_factor_one(D.shape[-1], dyn)

    def local(D, Bc, C, bs, ts):
        Lb, db, okb = jax.vmap(factor_one)(D, bs)
        DinvB = jax.vmap(ldl_solve)(Lb, db, Bc)
        S_local = jnp.einsum("pij,pik->jk", Bc, DinvB)
        if mesh is not None:
            S_local = lax.psum(S_local, axis)
        S = C - S_local
        Ls, ds, oks = ldl_factor(S, ts, **dyn)
        nbad = jnp.sum(jnp.logical_not(okb).astype(jnp.int32))
        if mesh is not None:
            nbad = lax.psum(nbad, axis)
        ok = jnp.logical_and(nbad == 0, oks)
        return BlockArrowFactorS(Lb, db, DinvB, Bc, Ls, ds, ok)

    if mesh is None:
        return local(D, Bc, C, bsigns, tsigns)
    sm = jax.shard_map(
        local, mesh=mesh,
        in_specs=(PS(axis), PS(axis), PS(), PS(axis), PS()),
        out_specs=_fac_pspec(axis),
        check_vma=False,
    )
    return sm(D, Bc, C, bsigns, tsigns)


def assemble_and_factor_blockarrow(P, A, Hs, plan: BlockArrowPlan, signs,
                                   settings, factor_dtype, mesh=None,
                                   tp_axis="tp"):
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

    # blocks appended by pad_plan_blocks are all-sentinel: their gather
    # lands on Kp[N, N] = 1 at EVERY position (an all-ones matrix), so
    # overwrite them with exact identities (static index list)
    pad_blocks = np.where((plan.block_idx >= N).all(axis=1))[0]
    if len(pad_blocks):
        D = D.at[pad_blocks].set(jnp.eye(plan.nb, dtype=D.dtype))
        Bc = Bc.at[pad_blocks].set(0.0)

    bsigns = jnp.asarray(plan.block_signs, K_reg.dtype)
    tsigns = jnp.asarray(plan.tail_signs, K_reg.dtype)
    return factor_blocks(D, Bc, C, bsigns, tsigns, settings,
                         mesh=mesh, axis=tp_axis)


def _ba_apply(fac: BlockArrowFactorS, plan: BlockArrowPlan, rhs,
              mesh=None, tp_axis="tp"):
    """Apply the factorization to rhs (N,) or (N, k)."""
    vec_in = rhs.ndim == 1
    R = rhs[:, None] if vec_in else rhs
    out_dtype = R.dtype
    Rf = R.astype(fac.Lb.dtype)

    bi = jnp.asarray(plan.block_idx)
    ti = jnp.asarray(plan.tail_idx)
    rb = Rf.at[bi].get(mode="fill", fill_value=0.0)    # (p, nb, k)
    rt = Rf[ti]                                        # (nt, k)

    def local(fac, rb, rt):
        u = jax.vmap(ldl_solve)(fac.Lb, fac.db, rb)    # (p, nb, k)
        red_local = jnp.einsum("pij,pik->jk", fac.Bc, u)
        if mesh is not None:
            red_local = lax.psum(red_local, tp_axis)
        red = rt - red_local
        y = ldl_solve(fac.Ls, fac.ds, red)             # (nt, k)
        xb = u - jnp.einsum("pij,jk->pik", fac.DinvB, y)
        return xb, y

    if mesh is None:
        xb, y = local(fac, rb, rt)
    else:
        sm = jax.shard_map(
            local, mesh=mesh,
            in_specs=(_fac_pspec(tp_axis), PS(tp_axis), PS()),
            out_specs=(PS(tp_axis), PS()),
            check_vma=False,
        )
        xb, y = sm(fac, rb, rt)

    out = jnp.zeros(R.shape, fac.Lb.dtype)
    out = out.at[bi].set(xb, mode="drop")
    out = out.at[ti].set(y)
    out = out.astype(out_dtype)
    return out[:, 0] if vec_in else out


def solve_refined_blockarrow(fac, plan, kkt_mv, rhs, settings,
                             mesh=None, tp_axis="tp"):
    """Block-arrow solve + iterative refinement on the augmented residual
    (computed with the parts-composed matvec, not a materialized K)."""
    from .refine import solve_refined

    return solve_refined(
        lambda r: _ba_apply(fac, plan, r, mesh=mesh, tp_axis=tp_axis),
        kkt_mv, rhs, settings,
    )


def kkt_solve_xz_blockarrow(fac, plan, kkt_mv, bx, bz, settings,
                            mesh=None, tp_axis="tp"):
    n = bx.shape[0]
    sol, ok = solve_refined_blockarrow(
        fac, plan, kkt_mv, jnp.concatenate([bx, bz]), settings,
        mesh=mesh, tp_axis=tp_axis,
    )
    return sol[:n], sol[n:], ok


def kkt_solve_xz2_blockarrow(fac, plan, kkt_mv, bx1, bz1, bx2, bz2, settings,
                             mesh=None, tp_axis="tp"):
    n = bx1.shape[0]
    rhs = jnp.stack(
        [jnp.concatenate([bx1, bz1]), jnp.concatenate([bx2, bz2])], axis=1
    )
    sol, ok = solve_refined_blockarrow(fac, plan, kkt_mv, rhs, settings,
                                       mesh=mesh, tp_axis=tp_axis)
    return sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1], ok
