"""Batched cone operations over a static ConeLayout.

Each cone family implements the ~20-operation interface of the reference
(reference: src/cones/coneops_defaults.jl:11-314) as *pure functions over
batched group arrays*: a group of `c` cones of width `d` is processed as a
single (c, d) tensor op, replacing the reference's per-cone loop +
`@conedispatch` jump table (reference: src/cones/cone_dispatch.jl:34-47).

Conventions:
* full conic vectors (z, s, dz, ds, ...) have length m and are gathered
  per-group with the layout's static index arrays;
* scaling state is a pytree dict {group_name: {field: array}};
* all functions are jit/vmap-safe: no data-dependent shapes or branching.

Cone math provenance:
* zero cone       — reference: src/cones/coneops_zerocone.jl
* nonnegative     — reference: src/cones/coneops_nncone.jl
* second order    — reference: src/cones/coneops_socone.jl
* symmetric glue  — reference: src/cones/coneops_symmetric_common.jl
* composite fanout— reference: src/cones/coneops_compositecone.jl
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layout import (ConeLayout, _gather, _scatter, _grow, _srow_set)
from ..linalg.smallops import chol3_solve
from . import psd as psd_ops
from . import nonsymmetric as nonsym_ops

# large-but-finite stand-in for floatmax in step length ratios
_BIG = 1e30  # large-but-finite in both f32 and f64


# ---------------------------------------------------------------------------
# second-order cone helpers (batched over leading cone axis)
# ---------------------------------------------------------------------------

def _soc_residual(Z):
    """(z0 - ||z1||)(z0 + ||z1||), batched.  reference: coneops_socone.jl:415-419"""
    z1n = jnp.linalg.norm(Z[:, 1:], axis=1)
    return (Z[:, 0] - z1n) * (Z[:, 0] + z1n)


def _sqrt_soc_residual(Z):
    res = _soc_residual(Z)
    return jnp.where(res > 0.0, jnp.sqrt(jnp.maximum(res, 0.0)), 0.0)


def _soc_mul_W(w, eta, X):
    """y = W x (symmetric), ECOS fast product.  reference: coneops_socone.jl:313-333"""
    zeta = jnp.sum(w[:, 1:] * X[:, 1:], axis=1)
    c = X[:, 0] + zeta / (1.0 + w[:, 0])
    y0 = eta * (w[:, 0] * X[:, 0] + zeta)
    y1 = eta[:, None] * (X[:, 1:] + c[:, None] * w[:, 1:])
    return jnp.concatenate([y0[:, None], y1], axis=1)


def _soc_mul_Winv(w, eta, X):
    """y = W^{-1} x.  reference: coneops_socone.jl:336-357"""
    zeta = jnp.sum(w[:, 1:] * X[:, 1:], axis=1)
    c = -X[:, 0] + zeta / (1.0 + w[:, 0])
    etainv = 1.0 / eta
    y0 = etainv * (w[:, 0] * X[:, 0] - zeta)
    y1 = etainv[:, None] * (X[:, 1:] + c[:, None] * w[:, 1:])
    return jnp.concatenate([y0[:, None], y1], axis=1)


def _soc_circ(Y, Z):
    """x = y ∘ z.  reference: coneops_socone.jl:376-391"""
    x0 = jnp.sum(Y * Z, axis=1)
    x1 = Y[:, :1] * Z[:, 1:] + Z[:, :1] * Y[:, 1:]
    return jnp.concatenate([x0[:, None], x1], axis=1)


# ---------------------------------------------------------------------------
# identity scaling / initialization
# ---------------------------------------------------------------------------

def set_identity_scaling(layout: ConeLayout, dtype) -> Dict:
    """reference: coneops_{nncone,socone}.jl set_identity_scaling!"""
    state = {}
    for name, g in layout.groups.items():
        if g.kind == "nn":
            state[name] = {
                "w": jnp.ones((g.width,), dtype),
                "lam": jnp.ones((g.width,), dtype),
            }
        elif g.kind == "soc":
            w = jnp.zeros((g.count, g.width), dtype).at[:, 0].set(1.0)
            state[name] = {
                "w": w,
                "lam": jnp.zeros((g.count, g.width), dtype),
                "eta": jnp.ones((g.count,), dtype),
            }
        elif g.kind == "zero":
            state[name] = {}
        elif g.kind == "psd":
            state[name] = psd_ops.identity_scaling(g, dtype)
        elif g.kind in ("exp", "pow", "genpow"):
            state[name] = nonsym_ops.identity_scaling(g, dtype)
        else:
            raise NotImplementedError(g.kind)
    return state


def unit_initialization(layout: ConeLayout, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit (z, s) for the asymmetric start.
    reference: src/variables.jl:213-226 + per-cone unit_initialization!"""
    z = jnp.zeros((layout.m,), dtype)
    s = jnp.zeros((layout.m,), dtype)
    for name, g in layout.groups.items():
        if g.kind == "nn":
            z = _scatter(z, g, jnp.ones(g.idx.shape, z.dtype))
            s = _scatter(s, g, jnp.ones(g.idx.shape, s.dtype))
        elif g.kind == "soc":
            z = z.at[g.idx[:, 0]].set(1.0)
            s = s.at[g.idx[:, 0]].set(1.0)
        elif g.kind == "zero":
            pass
        elif g.kind == "psd":
            z, s = psd_ops.unit_initialization(g, z, s)
        elif g.kind in ("exp", "pow", "genpow"):
            z, s = nonsym_ops.unit_initialization(g, z, s)
    return z, s


# ---------------------------------------------------------------------------
# margins / shifts (symmetric initialization path)
# ---------------------------------------------------------------------------

def margins(layout: ConeLayout, z, pd: str):
    """(min margin, sum of positive margins).
    reference: coneops_compositecone.jl:49-63 and per-cone margins."""
    alpha = jnp.asarray(_BIG, z.dtype)
    beta = jnp.asarray(0.0, z.dtype)
    for name, g in layout.groups.items():
        if g.kind == "nn":
            zg = _grow(z, g)
            alpha = jnp.minimum(alpha, jnp.min(zg))
            beta = beta + jnp.sum(jnp.maximum(zg, 0.0))
        elif g.kind == "soc":
            Z = _gather(z, g)
            a = Z[:, 0] - jnp.linalg.norm(Z[:, 1:], axis=1)
            alpha = jnp.minimum(alpha, jnp.min(a))
            beta = beta + jnp.sum(jnp.maximum(a, 0.0))
        elif g.kind == "zero":
            pass  # (floatmax, 0): reference coneops_zerocone.jl:27-39
        elif g.kind == "psd":
            a, b = psd_ops.margins(g, z)
            alpha = jnp.minimum(alpha, a)
            beta = beta + b
        # nonsymmetric cones never take this path
    return alpha, beta


def scaled_unit_shift(layout: ConeLayout, z, alpha, pd: str):
    """z += alpha * e per cone (zero cone: project to 0 on the primal side).
    reference: per-cone scaled_unit_shift!"""
    for name, g in layout.groups.items():
        if g.kind == "nn":
            z = _srow_set(z, g, _grow(z, g) + alpha)
        elif g.kind == "soc":
            z = z.at[g.idx[:, 0]].add(alpha)
        elif g.kind == "zero":
            if pd == "primal":
                z = _srow_set(z, g, jnp.zeros((g.idx.shape[1],), z.dtype))
        elif g.kind == "psd":
            z = psd_ops.scaled_unit_shift(g, z, alpha)
    return z


# ---------------------------------------------------------------------------
# scaling update
# ---------------------------------------------------------------------------

def update_scaling(layout: ConeLayout, state: Dict, s, z, mu, scaling_strategy):
    """NT (or nonsymmetric) scaling update for every group.

    Returns (new_state, is_success).  reference:
    coneops_nncone.jl:77-89, coneops_socone.jl:75-154,
    coneops_compositecone.jl:103-120.
    """
    ok = jnp.asarray(True)
    new_state = {}
    for name, g in layout.groups.items():
        if g.kind == "zero":
            new_state[name] = {}
        elif g.kind == "nn":
            sg, zg = _grow(s, g), _grow(z, g)
            prod = sg * zg
            ok = jnp.logical_and(ok, jnp.all(prod > 0))
            prod_safe = jnp.maximum(prod, 0.0)
            ratio_safe = jnp.where(zg != 0, sg / jnp.where(zg != 0, zg, 1.0), 0.0)
            new_state[name] = {
                "w": jnp.sqrt(jnp.maximum(ratio_safe, 0.0)),
                "lam": jnp.sqrt(prod_safe),
            }
        elif g.kind == "soc":
            S, Z = _gather(s, g), _gather(z, g)
            zscale = _sqrt_soc_residual(Z)
            sscale = _sqrt_soc_residual(S)
            okg = jnp.logical_and(zscale > 0, sscale > 0)
            zs = jnp.where(zscale > 0, zscale, 1.0)
            ss = jnp.where(sscale > 0, sscale, 1.0)

            eta = jnp.sqrt(ss / zs)

            w = S / ss[:, None]
            w = w.at[:, 0].add(Z[:, 0] / zs)
            w = w.at[:, 1:].add(-Z[:, 1:] / zs[:, None])

            wscale = _sqrt_soc_residual(w)
            okg = jnp.logical_and(okg, wscale > 0)
            ws = jnp.where(wscale > 0, wscale, 1.0)
            w = w / ws[:, None]

            w1sq = jnp.sum(w[:, 1:] ** 2, axis=1)
            w = w.at[:, 0].set(jnp.sqrt(1.0 + w1sq))

            # scaling point λ: reference coneops_socone.jl:115-123
            gamma = 0.5 * ws
            lam1 = (
                ((gamma + Z[:, 0] / zs) / ss)[:, None] * S[:, 1:]
                + ((gamma + S[:, 0] / ss) / zs)[:, None] * Z[:, 1:]
            )
            lam1 = lam1 / (S[:, 0] / ss + Z[:, 0] / zs + 2.0 * gamma)[:, None]
            lam = jnp.concatenate([gamma[:, None], lam1], axis=1)
            lam = lam * jnp.sqrt(ss * zs)[:, None]

            ok = jnp.logical_and(ok, jnp.all(okg))
            new_state[name] = {"w": w, "lam": lam, "eta": eta}
        elif g.kind == "psd":
            st, okg = psd_ops.update_scaling(g, s, z)
            ok = jnp.logical_and(ok, okg)
            new_state[name] = st
        elif g.kind in ("exp", "pow", "genpow"):
            st, okg = nonsym_ops.update_scaling(g, s, z, mu, scaling_strategy)
            ok = jnp.logical_and(ok, okg)
            new_state[name] = st
        else:
            raise NotImplementedError(g.kind)
    return new_state, ok


# ---------------------------------------------------------------------------
# Hs (dense assembly + product)
# ---------------------------------------------------------------------------

def hs_dense(layout: ConeLayout, state: Dict, dtype):
    """Assemble the full m x m Hs = blkdiag of per-cone W'W (or μH) blocks.

    The reference writes per-cone triu blocks into a sparse KKT via index
    maps (reference: kktsolver_directldl.jl:211-245); the dense TPU path
    scatters whole blocks instead.
    """
    m = layout.m
    H = jnp.zeros((m, m), dtype)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            pass
        elif g.kind == "nn":
            w = state[name]["w"]
            H = H.at[g.idx[0], g.idx[0]].set(w * w)
        elif g.kind == "soc":
            w, eta = state[name]["w"], state[name]["eta"]
            # H_i = eta^2 (2 w w' - J);  reference: coneops_socone.jl:169-187
            blocks = 2.0 * w[:, :, None] * w[:, None, :]
            d = g.width
            J = jnp.zeros((d, d), dtype).at[0, 0].set(1.0)
            J = J.at[jnp.arange(1, d), jnp.arange(1, d)].set(-1.0)
            blocks = blocks - J[None, :, :]
            blocks = blocks * (eta**2)[:, None, None]
            H = H.at[g.idx[:, :, None], g.idx[:, None, :]].set(blocks)
        elif g.kind == "psd":
            H = psd_ops.hs_dense_scatter(g, state[name], H)
        elif g.kind in ("exp", "pow", "genpow"):
            H = nonsym_ops.hs_dense_scatter(g, state[name], H)
        else:
            raise NotImplementedError(g.kind)
    return H


def hs_diag(layout: ConeLayout, state: Dict, dtype):
    """Diagonal of Hs as an (m,) vector — for regularization scaling
    (reference: kktsolver_directldl.jl:247-310 uses ‖diag(KKT)‖∞) without
    materializing the m×m Hs."""
    y = jnp.zeros((layout.m,), dtype)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            pass
        elif g.kind == "nn":
            w = state[name]["w"]
            y = y.at[g.idx[0]].set(w * w)
        elif g.kind == "soc":
            w, eta = state[name]["w"], state[name]["eta"]
            jd = jnp.concatenate([
                jnp.ones((1,), dtype), -jnp.ones((g.width - 1,), dtype)
            ])
            vals = (2.0 * w * w - jd[None, :]) * (eta**2)[:, None]
            y = _scatter(y, g, vals)
        elif g.kind == "psd":
            blocks = psd_ops.hs_blocks(g, state[name], dtype)
            y = _scatter(y, g, jnp.diagonal(blocks, axis1=1, axis2=2))
        elif g.kind in ("exp", "pow", "genpow"):
            blocks = nonsym_ops.hs_blocks(g, state[name], dtype)
            y = _scatter(y, g, jnp.diagonal(blocks, axis1=1, axis2=2))
        else:
            raise NotImplementedError(g.kind)
    return y


# SOCs at/above this dimension use the rank-2 Hs representation in
# sparse data mode: only the diagonal η²I enters the assembled KKT and
# the ±rank-1 terms are applied as a Sherman-Morrison-Woodbury
# correction (kkt/socrank.py).  The TPU-native counterpart of the
# reference's sparse SOC expansion (reference: cone_types.jl:65-117,
# directldl_datamaps.jl:8-79, SOC_NO_EXPANSION_MAX_SIZE=4): instead of
# appending u,v rows/columns to the KKT (dynamic dimensions), the
# low-rank terms stay outside the factorization in a static-shape dense
# capacitance system.
SOC_RANK2_MIN_DIM = 33


def _is_rank2_soc(g, soc_rank2_min_dim) -> bool:
    return (soc_rank2_min_dim is not None and g.kind == "soc"
            and g.width >= soc_rank2_min_dim)


def _is_lowrank_genpow(g, min_dim) -> bool:
    """Large generalized power cones use the same SMW treatment: their
    dual-scaling Hs = μ(D + pp' − qq' − rr') is diagonal-plus-rank-3
    (reference keeps it sparse-expandable always,
    coneops_genpowcone.jl:14-18, directldl_datamaps.jl:81-167)."""
    return (min_dim is not None and g.kind == "genpow"
            and g.width >= min_dim)


def hs_flat_values(layout: ConeLayout, state: Dict, dtype,
                   soc_rank2_min_dim=None):
    """Flat vector of all Hs entries, group by group, matching the KKT
    coordinates produced by `hs_coords` — the value side of the map-based
    sparse KKT assembly (the TPU analogue of the reference's per-cone
    Hs index maps, reference: directldl_datamaps.jl)."""
    parts = []
    for name, g in layout.groups.items():
        if g.kind == "zero":
            continue  # Hs = 0: no values
        if g.kind == "nn":
            w = state[name]["w"]
            parts.append(w * w)
        elif _is_rank2_soc(g, soc_rank2_min_dim):
            # rank-2 mode: only the η²I diagonal is assembled
            eta = state[name]["eta"]
            parts.append(
                ((eta**2)[:, None]
                 * jnp.ones((g.count, g.width), dtype)).reshape(-1)
            )
        elif _is_lowrank_genpow(g, soc_rank2_min_dim):
            st = state[name]
            dvec = jnp.concatenate(
                [st["d1"], st["d2"][:, None]
                 * jnp.ones((g.count, g.dim2), dtype)], axis=1,
            )
            parts.append((st["mu"] * dvec).reshape(-1))
        elif g.kind == "soc":
            w, eta = state[name]["w"], state[name]["eta"]
            blocks = 2.0 * w[:, :, None] * w[:, None, :]
            d = g.width
            J = jnp.zeros((d, d), dtype).at[0, 0].set(1.0)
            J = J.at[jnp.arange(1, d), jnp.arange(1, d)].set(-1.0)
            blocks = (blocks - J[None, :, :]) * (eta**2)[:, None, None]
            parts.append(blocks.reshape(-1))
        elif g.kind == "psd":
            parts.append(
                psd_ops.hs_blocks(g, state[name], dtype).reshape(-1)
            )
        elif g.kind in ("exp", "pow", "genpow"):
            parts.append(
                nonsym_ops.hs_blocks(g, state[name], dtype).reshape(-1)
            )
        else:
            raise NotImplementedError(g.kind)
    if not parts:
        return jnp.zeros((0,), dtype)
    return jnp.concatenate(parts)


def hs_coords(layout: ConeLayout, n: int, soc_rank2_min_dim=None):
    """Host-side (rows, cols) KKT coordinates for every entry emitted by
    `hs_flat_values`, in identical order.  Conic rows are offset by n;
    bucketed-SOC pad entries get the out-of-range sentinel n+m (dropped
    by the assembly scatter)."""
    m = layout.m
    sentinel = n + m
    rows_out, cols_out = [], []
    for name, g in layout.groups.items():
        if g.kind == "zero":
            continue
        idx = g.idx.astype(np.int64)
        # map real indices to n+idx, sentinels stay out of range
        kk = np.where(idx >= m, sentinel, n + idx)
        if g.kind == "nn":
            rows_out.append(kk[0])
            cols_out.append(kk[0])
        elif _is_rank2_soc(g, soc_rank2_min_dim) or \
                _is_lowrank_genpow(g, soc_rank2_min_dim):
            # diagonal entries only (matches hs_flat_values low-rank order)
            rows_out.append(kk.reshape(-1))
            cols_out.append(kk.reshape(-1))
        else:
            r = np.broadcast_to(kk[:, :, None], (g.count, g.width, g.width))
            c = np.broadcast_to(kk[:, None, :], (g.count, g.width, g.width))
            # either side padded -> drop the entry
            pad = (r >= sentinel) | (c >= sentinel)
            rows_out.append(np.where(pad, sentinel, r).reshape(-1))
            cols_out.append(np.where(pad, sentinel, c).reshape(-1))
    if not rows_out:
        return (np.zeros(0, dtype=np.int64),) * 2
    return np.concatenate(rows_out), np.concatenate(cols_out)


def mul_Hs(layout: ConeLayout, state: Dict, x):
    """y = Hs x.  reference: coneops_compositecone.jl:138-150"""
    y = jnp.zeros_like(x)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            pass
        elif g.kind == "nn":
            w = state[name]["w"]
            y = _srow_set(y, g, w * (w * _grow(x, g)))
        elif g.kind == "soc":
            w, eta = state[name]["w"], state[name]["eta"]
            X = _gather(x, g)
            c = 2.0 * jnp.sum(w * X, axis=1)
            out = X.at[:, 0].multiply(-1.0)
            out = out + c[:, None] * w
            out = out * (eta**2)[:, None]
            y = _scatter(y, g, out)
        elif g.kind == "psd":
            y = psd_ops.mul_Hs(g, state[name], x, y)
        elif g.kind in ("exp", "pow", "genpow"):
            y = nonsym_ops.mul_Hs(g, state[name], x, y)
    return y


def mul_Hs_inv(layout: ConeLayout, state: Dict, x, eps_zero):
    """y = Hs⁻¹ x, applied per cone group with closed-form inverses.

    Supports x of shape (m,) or (m, k).  Used by the condensed
    (normal-equations) KKT backend; `eps_zero` regularizes the zero-cone
    block (whose true Hs is 0 — equality rows), mirroring the static
    regularization the reference applies to those KKT diagonals.

    Inverses:
      nonnegative: 1/w² elementwise
      SOC (dense Hs = η²(2ww'−J)): Hs⁻¹ = η⁻²(2w̄w̄'−J), w̄ = Jw,
        using (2ww'−J)⁻¹ = 2(Jw)(Jw)'−J for w'Jw = 1
      PSD: Hs⁻¹ x = svec((RinvᵀRinv) X (RinvᵀRinv))
      exp/pow: batched 3×3 solve against the stored Hs block
      genpow: batched solve against the dense μ(D+pp'−qq'−rr') block
    """
    vec_in = x.ndim == 1
    X = x[:, None] if vec_in else x
    k = X.shape[1]
    y = jnp.zeros_like(X)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            y = _srow_set(y, g, _grow(X, g) / eps_zero)
        elif g.kind == "nn":
            w = state[name]["w"]
            y = _srow_set(y, g, _grow(X, g) / (w * w)[:, None])
        elif g.kind == "soc":
            w, eta = state[name]["w"], state[name]["eta"]
            wbar = w.at[:, 1:].multiply(-1.0)  # Jw
            Xg = _gather(X, g)  # (c, d, k)
            ccoef = 2.0 * jnp.sum(wbar[:, :, None] * Xg, axis=1)
            out = Xg.at[:, 0, :].multiply(-1.0)      # -J x = [-x0; x1]
            out = out + ccoef[:, None, :] * wbar[:, :, None]
            out = out / (eta**2)[:, None, None]
            y = _scatter(y, g, out)
        elif g.kind == "psd":
            from . import psd as _psd

            nmat = g.psd_n
            t = g.width
            Rinv = state[name]["Rinv"]
            G = jnp.einsum("cji,cjk->cik", Rinv, Rinv)  # RinvᵀRinv
            Xg = _gather(X, g)  # (c, t, k)
            # batch the svec<->mat conversion over the RHS columns
            Xg2 = jnp.transpose(Xg, (0, 2, 1)).reshape(g.count * k, t)
            M = _psd.svec_to_mat(Xg2, nmat).reshape(g.count, k, nmat, nmat)
            out = jnp.einsum("cij,cqjk,ckl->cqil", G, M, G)
            out2 = _psd.mat_to_svec(
                out.reshape(g.count * k, nmat, nmat), nmat
            ).reshape(g.count, k, t)
            y = _scatter(y, g, jnp.transpose(out2, (0, 2, 1)))
        elif g.kind in ("exp", "pow"):
            Hs = state[name]["Hs"]
            Xg = _gather(X, g)
            out = chol3_solve(Hs, Xg)
            y = _scatter(y, g, out)
        elif g.kind == "genpow":
            d1 = g.dim1
            mu = state[name]["mu"]
            dvec = jnp.concatenate(
                [state[name]["d1"],
                 state[name]["d2"][:, None]
                 * jnp.ones((g.count, g.dim2), X.dtype)],
                axis=1,
            )
            qf = jnp.concatenate(
                [state[name]["q"], jnp.zeros((g.count, g.dim2), X.dtype)],
                axis=1,
            )
            rf = jnp.concatenate(
                [jnp.zeros((g.count, d1), X.dtype), state[name]["r"]], axis=1
            )
            p = state[name]["p"]
            # Hs/μ = D + pp' − qq' − rr': invert by a chain of three
            # Sherman–Morrison rank-1 updates on the diagonal base —
            # elementwise only (no batched LU, which has no f64 TPU path)
            apply_inv = lambda v: v / dvec[:, :, None]
            for u, sgn in ((p, 1.0), (qf, -1.0), (rf, -1.0)):
                Au = apply_inv(u[:, :, None])[..., 0]
                denom = 1.0 + sgn * jnp.sum(u * Au, axis=1)

                def apply_inv(v, prev=apply_inv, u=u, Au=Au,
                              denom=denom, sgn=sgn):
                    Av = prev(v)
                    coef = jnp.sum(u[:, :, None] * Av, axis=1)
                    return Av - sgn * Au[:, :, None] * (
                        coef[:, None, :] / denom[:, None, None]
                    )

            out = apply_inv(_gather(X, g)) / mu
            y = _scatter(y, g, out)
        else:
            raise NotImplementedError(g.kind)
    return y[:, 0] if vec_in else y


# ---------------------------------------------------------------------------
# step direction RHS components
# ---------------------------------------------------------------------------

def affine_ds(layout: ConeLayout, state: Dict, s):
    """ds = λ ∘ λ (symmetric) or s (nonsymmetric).
    reference: coneops_compositecone.jl:153-165"""
    ds = jnp.zeros_like(s)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            pass
        elif g.kind == "nn":
            lam = state[name]["lam"]
            ds = _srow_set(ds, g, lam * lam)
        elif g.kind == "soc":
            lam = state[name]["lam"]
            ds = _scatter(ds, g, _soc_circ(lam, lam))
        elif g.kind == "psd":
            ds = psd_ops.affine_ds(g, state[name], ds)
        elif g.kind in ("exp", "pow", "genpow"):
            ds = _scatter(ds, g, _gather(s, g))
    return ds


def combined_ds_shift(layout: ConeLayout, state: Dict, step_z, step_s, sigma_mu, z):
    """shift = W⁻¹Δs ∘ WΔz − σμe (symmetric)
          or  σμ·g(z) + higher-order correction (nonsymmetric).
    reference: coneops_symmetric_common.jl:2-35,
    coneops_nonsymmetric_common.jl."""
    shift = jnp.zeros_like(step_z)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            pass
        elif g.kind == "nn":
            w = state[name]["w"]
            dz, ds = _grow(step_z, g), _grow(step_s, g)
            wdz = w * dz
            winv_ds = ds / w
            shift = _srow_set(shift, g, winv_ds * wdz - sigma_mu)
        elif g.kind == "soc":
            w, eta = state[name]["w"], state[name]["eta"]
            Dz, Ds = _gather(step_z, g), _gather(step_s, g)
            Wdz = _soc_mul_W(w, eta, Dz)
            Winv_ds = _soc_mul_Winv(w, eta, Ds)
            out = _soc_circ(Winv_ds, Wdz)
            out = out.at[:, 0].add(-sigma_mu)
            shift = _scatter(shift, g, out)
        elif g.kind == "psd":
            shift = psd_ops.combined_ds_shift(g, state[name], step_z, step_s, sigma_mu, shift)
        elif g.kind in ("exp", "pow", "genpow"):
            shift = nonsym_ops.combined_ds_shift(
                g, state[name], step_z, step_s, sigma_mu, z, shift
            )
    return shift


def ds_from_dz_offset(layout: ConeLayout, state: Dict, ds, z):
    """out = Wᵀ(λ \\ ds) (symmetric) or ds (nonsymmetric).
    reference: coneops_compositecone.jl:185-202"""
    out = jnp.zeros_like(ds)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            pass
        elif g.kind == "nn":
            zg = _grow(z, g)
            out = _srow_set(out, g, _grow(ds, g) / zg)
        elif g.kind == "soc":
            # stable form: reference coneops_socone.jl:241-268
            w, eta, lam = state[name]["w"], state[name]["eta"], state[name]["lam"]
            Z, DS = _gather(z, g), _gather(ds, g)
            resz = _soc_residual(Z)
            lam1ds1 = jnp.sum(lam[:, 1:] * DS[:, 1:], axis=1)
            w1ds1 = jnp.sum(w[:, 1:] * DS[:, 1:], axis=1)
            O = -Z
            O = O.at[:, 0].set(Z[:, 0])
            c = lam[:, 0] * DS[:, 0] - lam1ds1
            O = O * (c / resz)[:, None]
            O = O.at[:, 0].add(eta * w1ds1)
            O = O.at[:, 1:].add(
                eta[:, None]
                * (DS[:, 1:] + (w1ds1 / (1.0 + w[:, 0]))[:, None] * w[:, 1:])
            )
            O = O / lam[:, :1]
            out = _scatter(out, g, O)
        elif g.kind == "psd":
            out = psd_ops.ds_from_dz_offset(g, state[name], ds, out)
        elif g.kind in ("exp", "pow", "genpow"):
            out = _scatter(out, g, _gather(ds, g))
    return out


# ---------------------------------------------------------------------------
# step length & barrier
# ---------------------------------------------------------------------------

def step_length(layout: ConeLayout, state, dz, ds, z, s, alpha_max, settings_ls):
    """max step α so that (z+αdz, s+αds) stays in the cone (interior).

    Symmetric cones are evaluated first; if any nonsymmetric cone is present
    the step is capped at 1−√eps before their backtracking searches run.
    reference: coneops_compositecone.jl:205-243.
    """
    alpha = jnp.asarray(alpha_max, z.dtype)

    for name, g in layout.groups.items():
        if g.kind == "zero":
            continue
        if g.kind == "nn":
            dzg, dsg = _grow(dz, g), _grow(ds, g)
            zg, sg = _grow(z, g), _grow(s, g)
            az = jnp.where(dzg < 0, -zg / jnp.where(dzg < 0, dzg, -1.0), _BIG)
            a_s = jnp.where(dsg < 0, -sg / jnp.where(dsg < 0, dsg, -1.0), _BIG)
            alpha = jnp.minimum(alpha, jnp.minimum(jnp.min(az), jnp.min(a_s)))
        elif g.kind == "soc":
            az = _soc_step_length_comp(_gather(z, g), _gather(dz, g))
            a_s = _soc_step_length_comp(_gather(s, g), _gather(ds, g))
            alpha = jnp.minimum(alpha, jnp.minimum(az, a_s))
        elif g.kind == "psd":
            a = psd_ops.step_length(g, state[name], dz, ds, z, s)
            alpha = jnp.minimum(alpha, a)

    if layout.has_nonsymmetric:
        eps = jnp.finfo(z.dtype).eps
        alpha = jnp.minimum(alpha, 1.0 - jnp.sqrt(eps))
        for name, g in layout.groups.items():
            if g.kind in ("exp", "pow", "genpow"):
                a = nonsym_ops.step_length(
                    g, dz, ds, z, s, alpha, settings_ls
                )
                alpha = jnp.minimum(alpha, a)
    return alpha


def _soc_step_length_comp(X, Y):
    """Min positive root of the per-cone boundary quadratic, batched,
    cancellation-safe.  reference: coneops_socone.jl:443-512"""
    x0, y0 = X[:, 0], Y[:, 0]
    # scalar-part bound
    a0 = jnp.where(
        jnp.logical_and(x0 >= 0, y0 < 0),
        -x0 / jnp.where(y0 < 0, y0, -1.0),
        _BIG,
    )

    a = _soc_residual(Y)
    b = 2.0 * (x0 * y0 - jnp.sum(X[:, 1:] * Y[:, 1:], axis=1))
    c = jnp.maximum(0.0, _soc_residual(X))
    d = b * b - 4.0 * a * c

    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    t = jnp.where(b >= 0, -b - sqrt_d, -b + sqrt_d)
    t_safe = jnp.where(t != 0, t, 1.0)
    a_safe = jnp.where(a != 0, a, 1.0)
    r1 = jnp.where(t != 0, (2.0 * c) / t_safe, _BIG)
    r2 = jnp.where(a != 0, t / (2.0 * a_safe), _BIG)
    r1 = jnp.where(r1 < 0, _BIG, r1)
    r2 = jnp.where(r2 < 0, _BIG, r2)
    root = jnp.minimum(r1, r2)

    # edge cases mirror the reference's branch structure
    alpha_i = jnp.where(
        jnp.logical_or(jnp.logical_and(a > 0, b > 0), d < 0),
        _BIG,
        jnp.where(
            a == 0,
            _BIG,
            jnp.where(c == 0, jnp.where(a >= 0, _BIG, 0.0), root),
        ),
    )
    return jnp.min(jnp.minimum(alpha_i, a0))


def compute_barrier(layout: ConeLayout, state, z, s, dz, ds, alpha):
    """f(s+αds) + f*(z+αdz) summed over cones.
    reference: coneops_compositecone.jl:246-265"""
    barrier = jnp.asarray(0.0, z.dtype)
    for name, g in layout.groups.items():
        if g.kind == "zero":
            continue
        if g.kind == "nn":
            si = _grow(s, g) + alpha * _grow(ds, g)
            zi = _grow(z, g) + alpha * _grow(dz, g)
            prod = si * zi
            barrier = barrier - jnp.sum(_logsafe(prod))
        elif g.kind == "soc":
            rs = _soc_residual(_gather(s, g) + alpha * _gather(ds, g))
            rz = _soc_residual(_gather(z, g) + alpha * _gather(dz, g))
            per = jnp.where(
                jnp.logical_and(rs > 0, rz > 0),
                -_logsafe(rs * rz) / 2.0,
                jnp.inf,
            )
            barrier = barrier + jnp.sum(per)
        elif g.kind == "psd":
            barrier = barrier + psd_ops.compute_barrier(g, z, s, dz, ds, alpha)
        elif g.kind in ("exp", "pow", "genpow"):
            barrier = barrier + nonsym_ops.compute_barrier(g, z, s, dz, ds, alpha)
    return barrier


def _logsafe(x):
    """log with -inf/NaN protection.  reference: src/utils/mathutils.jl logsafe"""
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), -jnp.inf)


# ---------------------------------------------------------------------------
# equilibration rectification
# ---------------------------------------------------------------------------

def rectify_equilibration(layout: ConeLayout, e):
    """Force scalar (mean) scaling on cones that do not allow elementwise
    equilibration.  Returns (delta, any_changed) with e_new = delta * e.
    reference: coneops_defaults.jl:32-44, coneops_compositecone.jl:28-47"""
    delta = jnp.ones_like(e)
    changed = False
    for name, g in layout.groups.items():
        if g.kind in ("zero", "nn"):
            continue
        eg = _gather(e, g)  # (count, width)
        if g.true_dims is not None:
            mean = (jnp.sum(eg, axis=1, keepdims=True)
                    / jnp.asarray(g.true_dims, e.dtype)[:, None])
        else:
            mean = jnp.mean(eg, axis=1, keepdims=True)
        eg_safe = jnp.where(eg != 0, eg, 1.0)
        delta = _scatter(delta, g, mean / eg_safe)
        changed = True
    return delta, changed


def soc_rank2_uv(layout: ConeLayout, state: Dict, n: int, dtype,
                 soc_rank2_min_dim=None):
    """Columns of the rank-2 SOC correction for the SMW-corrected sparse
    KKT (kkt/socrank.py).

    For each rank-2 SOC,  Hs = η²(2ww' − J) = η²I + uu' − vv'  with
    u = √2·η·w and v = √2·η·e₀ (using −J = I − 2e₀e₀', w'Jw = 1).  The
    KKT carries −Hs, so  K = K₀ + U S U'  with per-cone column signs
    s_u = −1, s_v = +1.  Returns (U, signs): U is (n+m, 2k) with the
    columns scattered into the conic rows; k = total rank-2 SOC count.
    Returns (None, None) when no rank-2 SOC exists in the layout.
    """
    N = n + layout.m
    cols = []
    signs = []
    for name, g in layout.groups.items():
        if _is_rank2_soc(g, soc_rank2_min_dim):
            w, eta = state[name]["w"], state[name]["eta"]
            coef = (np.sqrt(2.0) * eta)[:, None]
            rows = n + g.idx  # (count, width); sentinel pads >= N drop
            for c in range(g.count):
                u = jnp.zeros((N,), dtype).at[rows[c]].set(
                    (coef[c] * w[c]).astype(dtype), mode="drop"
                )
                v = jnp.zeros((N,), dtype).at[rows[c, 0]].set(
                    (np.sqrt(2.0) * eta[c]).astype(dtype)
                )
                cols.extend([u, v])
                signs.extend([-1.0, 1.0])
        elif _is_lowrank_genpow(g, soc_rank2_min_dim):
            # Hs = μD + (√μ p)(√μ p)' − (√μ q̄)(√μ q̄)' − (√μ r̄)(√μ r̄)'
            st = state[name]
            smu = jnp.sqrt(st["mu"])
            d1 = g.dim1
            rows = n + g.idx
            for c in range(g.count):
                up = jnp.zeros((N,), dtype).at[rows[c]].set(
                    (smu * st["p"][c]).astype(dtype), mode="drop"
                )
                uq = jnp.zeros((N,), dtype).at[rows[c, :d1]].set(
                    (smu * st["q"][c]).astype(dtype), mode="drop"
                )
                ur = jnp.zeros((N,), dtype).at[rows[c, d1:]].set(
                    (smu * st["r"][c]).astype(dtype), mode="drop"
                )
                cols.extend([up, uq, ur])
                signs.extend([-1.0, 1.0, 1.0])
    if not cols:
        return None, None
    return jnp.stack(cols, axis=1), np.asarray(signs)
