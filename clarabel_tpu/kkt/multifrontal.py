"""Multilevel nested-dissection (multifrontal) KKT backend.

Executes the NestedPlan produced by structure_nd.py: a level-synchronous
multifrontal LDLᵀ where every tree level is ONE vmapped dense kernel over
same-shaped padded frontal matrices.  This is the multilevel
generalization of the single-level block-arrow backend (kkt/blockarrow.py)
and the TPU-native replacement for the fill-reducing sparse LDL backends
of the reference (QDLDL/CHOLMOD, reference:
src/kktsolvers/direct-ldl/directldl_qdldl.jl) on grid/mesh-structured
problems whose single-level separator is too large.

Per level ℓ (bottom-up): gather the K entries owned by each node into its
front, extend-add the children's update matrices, partially factor the
leading rows(t) pivots, emit the Schur update over bnd(t).  The solve is
a bottom-up forward sweep and a top-down backward sweep with static
scatter/gather maps.  Iterative refinement against the parts-composed KKT
matvec preserves accuracy exactly as in the other backends.
"""

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg.ldl import ldl_factor, ldl_factor_blocked, ldl_solve
from ..structure_nd import NestedPlan, NestedLevel
from .refine import solve_refined


class MFLevelFactor(NamedTuple):
    L: jnp.ndarray       # (cnt, nr, nr)
    d: jnp.ndarray       # (cnt, nr)
    B: jnp.ndarray       # (cnt, nr, nbd) coupling rows(t) x bnd(t)
    DinvB: jnp.ndarray   # (cnt, nr, nbd)


class MFFactor(NamedTuple):
    levels: Tuple[MFLevelFactor, ...]   # root-first, like the plan
    ok: jnp.ndarray


def _factor_fn(nr: int, dyn):
    if nr >= 192 and nr % 128 == 0:
        return lambda Kb, sb: ldl_factor_blocked(Kb, sb, **dyn)
    return lambda Kb, sb: ldl_factor(Kb, sb, **dyn)


def _assemble_level_fronts(Kp, lv: NestedLevel, N: int, dtype):
    """Gather the K entries owned by this level's nodes into padded
    fronts: rows(t) x front(t) from K, the bnd x bnd quadrant zeroed
    (those entries are owned by ancestors), unit pivots at row pads."""
    fi = jnp.concatenate(
        [jnp.asarray(lv.rows_idx), jnp.asarray(lv.bnd_idx)], axis=1
    ).astype(jnp.int32)                                  # (cnt, f)
    F = Kp[fi[:, :, None], fi[:, None, :]].astype(dtype)  # (cnt, f, f)
    valid = (fi < N)
    F = jnp.where(valid[:, :, None] & valid[:, None, :], F, 0.0)
    if lv.nbd:
        F = F.at[:, lv.nr:, lv.nr:].set(0.0)
    # unit pivots at padded row positions
    pad = ~valid[:, :lv.nr]
    eye_pad = jax.vmap(jnp.diag)(pad.astype(F.dtype))     # (cnt, nr, nr)
    F = F.at[:, :lv.nr, :lv.nr].add(eye_pad)
    return F


def _extend_add(F, child_U, child_lv: NestedLevel):
    """Scatter-add children's update matrices into the parent fronts.
    child_U: (2*cnt, nbd_c, nbd_c); up_pos sentinel = parent front size,
    absorbed by one pad row/col."""
    cnt, f, _ = F.shape
    up = jnp.asarray(child_lv.up_pos).astype(jnp.int32)   # (2*cnt, nbd_c)
    pid = (jnp.arange(child_lv.cnt, dtype=jnp.int32) // 2)
    Fp = jnp.zeros((cnt, f + 1, f + 1), F.dtype)
    Fp = Fp.at[pid[:, None, None], up[:, :, None], up[:, None, :]].add(
        child_U.astype(F.dtype)
    )
    return F + Fp[:, :f, :f]


def assemble_and_factor_multifrontal(P, A, Hs, plan: NestedPlan, signs,
                                     settings, factor_dtype) -> MFFactor:
    n, m = plan.n, plan.m
    N = n + m
    K_true = jnp.block([[P, A.T], [A, -Hs]])

    diag = jnp.diagonal(K_true)
    maxdiag = jnp.max(jnp.abs(diag))
    eps = (
        settings.static_regularization_constant
        + settings.static_regularization_proportional * maxdiag
    )
    K_reg = K_true + jnp.diag(signs * eps)

    # one pad row/col so sentinel gathers read zeros
    Kp = jnp.zeros((N + 1, N + 1), K_reg.dtype)
    Kp = Kp.at[:N, :N].set(K_reg)

    fdtype = jnp.dtype(factor_dtype)
    dyn = dict(
        dyn_eps=settings.dynamic_regularization_eps,
        dyn_delta=settings.dynamic_regularization_delta,
        dynamic_enable=settings.dynamic_regularization_enable,
    )

    facs = [None] * len(plan.levels)
    child_U = None
    ok = jnp.asarray(True)
    for li in range(plan.depth, -1, -1):
        lv = plan.levels[li]
        F = _assemble_level_fronts(Kp, lv, N, fdtype)
        if child_U is not None:
            F = _extend_add(F, child_U, plan.levels[li + 1])
        D = F[:, :lv.nr, :lv.nr]
        B = F[:, :lv.nr, lv.nr:]
        rsigns = jnp.asarray(lv.rows_signs, fdtype)
        Lb, db, okb = jax.vmap(_factor_fn(lv.nr, dyn))(D, rsigns)
        ok = jnp.logical_and(ok, jnp.all(okb))
        if lv.nbd:
            DinvB = jax.vmap(ldl_solve)(Lb, db, B)
            # the update forwards the children's accumulated bnd x bnd
            # contributions (sitting in F's trailing quadrant after
            # extend-add) plus the local Schur term
            child_U = (
                F[:, lv.nr:, lv.nr:] - jnp.einsum("cij,cik->cjk", B, DinvB)
            )
        else:
            DinvB = B
            child_U = None
        facs[li] = MFLevelFactor(L=Lb, d=db, B=B, DinvB=DinvB)
    return MFFactor(levels=tuple(facs), ok=ok)


def factor_from_level_blocks(fronts, plan: NestedPlan, settings,
                             factor_dtype) -> MFFactor:
    """Factor pre-assembled per-level fronts (sparse map-based assembly
    path, see kkt/assembly_maps_nd.py).  fronts[li]: (cnt, f, f)."""
    dyn = dict(
        dyn_eps=settings.dynamic_regularization_eps,
        dyn_delta=settings.dynamic_regularization_delta,
        dynamic_enable=settings.dynamic_regularization_enable,
    )
    fdtype = jnp.dtype(factor_dtype)
    facs = [None] * len(plan.levels)
    child_U = None
    ok = jnp.asarray(True)
    for li in range(plan.depth, -1, -1):
        lv = plan.levels[li]
        F = fronts[li].astype(fdtype)
        if child_U is not None:
            F = _extend_add(F, child_U, plan.levels[li + 1])
        D = F[:, :lv.nr, :lv.nr]
        B = F[:, :lv.nr, lv.nr:]
        rsigns = jnp.asarray(lv.rows_signs, fdtype)
        Lb, db, okb = jax.vmap(_factor_fn(lv.nr, dyn))(D, rsigns)
        ok = jnp.logical_and(ok, jnp.all(okb))
        if lv.nbd:
            DinvB = jax.vmap(ldl_solve)(Lb, db, B)
            child_U = (
                F[:, lv.nr:, lv.nr:] - jnp.einsum("cij,cik->cjk", B, DinvB)
            )
        else:
            DinvB = B
            child_U = None
        facs[li] = MFLevelFactor(L=Lb, d=db, B=B, DinvB=DinvB)
    return MFFactor(levels=tuple(facs), ok=ok)


def _mf_apply(fac: MFFactor, plan: NestedPlan, rhs):
    """Apply the multifrontal factorization to rhs (N,) or (N, k)."""
    vec_in = rhs.ndim == 1
    R = rhs[:, None] if vec_in else rhs
    out_dtype = R.dtype
    W = R.astype(fac.levels[0].L.dtype)

    # forward sweep: leaves -> root
    us = [None] * len(plan.levels)
    for li in range(plan.depth, -1, -1):
        lv = plan.levels[li]
        lf = fac.levels[li]
        ridx = jnp.asarray(lv.rows_idx)
        rb = W.at[ridx].get(mode="fill", fill_value=0.0)   # (cnt, nr, k)
        u = jax.vmap(ldl_solve)(lf.L, lf.d, rb)
        us[li] = u
        if lv.nbd:
            contrib = jnp.einsum("cij,cik->cjk", lf.B, u)  # (cnt, nbd, k)
            W = W.at[jnp.asarray(lv.bnd_idx)].add(-contrib, mode="drop")

    # backward sweep: root -> leaves
    X = jnp.zeros_like(W)
    for li in range(0, plan.depth + 1):
        lv = plan.levels[li]
        lf = fac.levels[li]
        if lv.nbd:
            xb = X.at[jnp.asarray(lv.bnd_idx)].get(mode="fill",
                                                   fill_value=0.0)
            xr = us[li] - jnp.einsum("cij,cjk->cik", lf.DinvB, xb)
        else:
            xr = us[li]
        X = X.at[jnp.asarray(lv.rows_idx)].set(xr, mode="drop")

    X = X.astype(out_dtype)
    return X[:, 0] if vec_in else X


def kkt_solve_xz_multifrontal(fac, plan, kkt_mv, bx, bz, settings):
    n = bx.shape[0]
    sol, ok = solve_refined(
        lambda r: _mf_apply(fac, plan, r), kkt_mv,
        jnp.concatenate([bx, bz]), settings,
    )
    return sol[:n], sol[n:], jnp.logical_and(ok, fac.ok)


def kkt_solve_xz2_multifrontal(fac, plan, kkt_mv, bx1, bz1, bx2, bz2,
                               settings):
    n = bx1.shape[0]
    rhs = jnp.stack(
        [jnp.concatenate([bx1, bz1]), jnp.concatenate([bx2, bz2])], axis=1
    )
    sol, ok = solve_refined(
        lambda r: _mf_apply(fac, plan, r), kkt_mv, rhs, settings,
    )
    return (sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1],
            jnp.logical_and(ok, fac.ok))
