"""Exponential / power / generalized power cone operations, batched.

Nonsymmetric cone support with dual and primal-dual (BFGS-style) scaling
strategies, third-order corrections, Wright-omega primal barriers, and
masked fixed-bound backtracking line searches — the math of the reference
implementation re-expressed as batched fixed-shape tensor programs:

* exponential cone — reference: src/cones/coneops_expcone.jl
* power cone       — reference: src/cones/coneops_powcone.jl
* gen. power cone  — reference: src/cones/coneops_genpowcone.jl
* shared strategy  — reference: src/cones/coneops_nonsymmetric_common.jl

Data-dependent iteration (Newton–Raphson primal gradients, feasibility
backtracking) becomes batched `lax.while_loop`s with per-cone done masks.
"""


import numpy as np
import jax.numpy as jnp
from jax import lax

from .layout import ConeGroup, _gather, _scatter
from ..linalg.smallops import chol3_solve

_BIG = 1e30  # large-but-finite in both f32 and f64

# exp-cone unit initialization constants
# (reference: coneops_expcone.jl:36-52)
_EXP_UNIT = np.array([-1.051383945322714, 0.556409619469370, 1.258967884768947])


def _logsafe(x):
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), -jnp.inf)


# ---------------------------------------------------------------------------
# scalar numerical subroutines (batched over the cone axis)
# ---------------------------------------------------------------------------

def _wright_omega(z):
    """ω(z): solution y of y + log(y) = z for z >= 1 (batched).
    reference: coneops_expcone.jl:412-468 (Santiago Serrano thesis alg. 4);
    the z^-3 series term is applied correctly here (the reference drops it)."""
    # series initialization for z < 1 + π
    zm1 = z - 1.0
    p1 = zm1
    w_small = 1.0 + 0.5 * p1
    p2 = p1 * zm1
    w_small = w_small + (1.0 / 16.0) * p2
    p3 = p2 * zm1
    w_small = w_small - (1.0 / 192.0) * p3
    p4 = p3 * zm1
    w_small = w_small - (1.0 / 3072.0) * p4
    p5 = p4 * zm1
    w_small = w_small + (13.0 / 61440.0) * p5

    # asymptotic initialization for larger z
    z_big = jnp.maximum(z, 1.0 + np.pi)
    logz = jnp.log(z_big)
    zinv = 1.0 / z_big
    w_big = z_big - logz
    q = logz * zinv
    w_big = w_big + q
    q = q * zinv
    w_big = w_big + q * (logz / 2.0 - 1.0)
    q = q * zinv
    w_big = w_big + q * (logz * logz / 3.0 - 1.5 * logz + 1.0)

    w = jnp.where(z < 1.0 + np.pi, w_small, w_big)

    # two Santiago refinement iterations
    r = z - w - jnp.log(jnp.maximum(w, 1e-300))
    for _ in range(2):
        wp1 = w + 1.0
        t = wp1 * (wp1 + (2.0 * r) / 3.0)
        w = w * (1.0 + (r / wp1) * (t - 0.5 * r) / (t - r))
        r = (2.0 * w * w - 8.0 * w - 1.0) / (72.0 * wp1**6) * r**4
    return w


def _newton_raphson_onesided(x0, f0, f1, dtype):
    """Batched one-sided NR (reference: coneops_nonsymmetric_common.jl:170-193).
    x0: (c,) start left of the root; f0/f1 map (c,) -> (c,)."""
    eps = float(np.finfo(dtype).eps)
    sqrt_eps = float(np.sqrt(eps))

    def cond(carry):
        i, x, done = carry
        return jnp.logical_and(i < 100, jnp.any(~done))

    def body(carry):
        i, x, done = carry
        dfdx = f1(x)
        dfdx_safe = jnp.where(dfdx != 0, dfdx, 1.0)
        dx = -f0(x) / dfdx_safe
        stop = jnp.logical_or(
            jnp.logical_or(dx < eps, jnp.abs(dx / jnp.where(x != 0, x, 1.0)) < sqrt_eps),
            jnp.abs(dfdx) < eps,
        )
        x = jnp.where(jnp.logical_or(done, stop), x, x + dx)
        return (i + 1, x, jnp.logical_or(done, stop))

    _, x, _ = lax.while_loop(
        cond, body, (jnp.asarray(0), x0, jnp.zeros(x0.shape, bool))
    )
    return x


def _backtrack_search(q, dq, feas_fcn, alpha_init, alpha_min, step):
    """Per-cone feasibility backtracking, min over cones.
    reference: coneops_nonsymmetric_common.jl:5-34"""
    c = q.shape[0]
    a0 = jnp.full((c,), alpha_init, q.dtype)

    def cond(carry):
        a, done = carry
        return jnp.any(~done)

    def body(carry):
        a, done = carry
        feas = feas_fcn(q + a[:, None] * dq)
        newdone = jnp.logical_or(done, feas)
        a = jnp.where(newdone, a, a * step)
        killed = jnp.logical_and(~newdone, a < alpha_min)
        a = jnp.where(killed, 0.0, a)
        return a, jnp.logical_or(newdone, killed)

    a, _ = lax.while_loop(cond, body, (a0, jnp.zeros((c,), bool)))
    return jnp.min(a)


# ---------------------------------------------------------------------------
# exponential cone internals (reference: coneops_expcone.jl:213-399)
# ---------------------------------------------------------------------------

def _exp_is_primal_feasible(S):
    ok = jnp.logical_and(S[:, 2] > 0, S[:, 1] > 0)
    res = S[:, 1] * _logsafe(S[:, 2] / jnp.where(S[:, 1] > 0, S[:, 1], 1.0)) - S[:, 0]
    return jnp.logical_and(ok, res > 0)


def _exp_is_dual_feasible(Z):
    ok = jnp.logical_and(Z[:, 2] > 0, Z[:, 0] < 0)
    zsafe = jnp.where(Z[:, 0] < 0, Z[:, 0], -1.0)
    res = Z[:, 1] - Z[:, 0] - Z[:, 0] * _logsafe(-Z[:, 2] / zsafe)
    return jnp.logical_and(ok, res > 0)


def _exp_barrier_dual(Z):
    z1, z2, z3 = Z[:, 0], Z[:, 1], Z[:, 2]
    l = _logsafe(-z3 / jnp.where(z1 != 0, z1, -1.0))
    return -_logsafe(-z3 * z1) - _logsafe(z2 - z1 - z1 * l)


def _exp_barrier_primal(S):
    s1, s2, s3 = S[:, 0], S[:, 1], S[:, 2]
    s2s = jnp.where(s2 > 0, s2, 1.0)
    s3s = jnp.where(s3 > 0, s3, 1.0)
    arg = 1.0 - s1 / s2s - _logsafe(s2s / s3s)
    w = _wright_omega(jnp.maximum(arg, 0.0))
    w = (w - 1.0) ** 2 / jnp.where(w != 0, w, 1.0)
    val = -_logsafe(w) - 2.0 * _logsafe(s2) - _logsafe(s3) - 3.0
    feas = _exp_is_primal_feasible(S)
    return jnp.where(feas, val, jnp.inf)


def _exp_grad_primal(S):
    """reference: coneops_expcone.jl:284-297"""
    s1, s2, s3 = S[:, 0], S[:, 1], S[:, 2]
    w = _wright_omega(1.0 - s1 / s2 - _logsafe(s2 / s3))
    g1 = 1.0 / ((w - 1.0) * s2)
    g2 = g1 + g1 * _logsafe(w * s2 / s3) - 1.0 / s2
    g3 = w / ((1.0 - w) * s3)
    return jnp.stack([g1, g2, g3], axis=1)


def _exp_dual_grad_H(Z):
    """gradient + Hessian of f*(z).  reference: coneops_expcone.jl:370-399"""
    z1, z2, z3 = Z[:, 0], Z[:, 1], Z[:, 2]
    l = _logsafe(-z3 / z1)
    r = -z1 * l - z1 + z2
    c2 = 1.0 / r
    g1 = c2 * l - 1.0 / z1
    g2 = -c2
    g3 = (c2 * z1 - 1.0) / z3
    grad = jnp.stack([g1, g2, g3], axis=1)

    H11 = (r * r - z1 * r + l * l * z1 * z1) / (r * z1 * z1 * r)
    H12 = -l / (r * r)
    H22 = 1.0 / (r * r)
    H13 = (z2 - z1) / (r * r * z3)
    H23 = -z1 / (r * r * z3)
    H33 = (r * r - z1 * r + z1 * z1) / (r * r * z3 * z3)
    H = jnp.stack([
        jnp.stack([H11, H12, H13], axis=1),
        jnp.stack([H12, H22, H23], axis=1),
        jnp.stack([H13, H23, H33], axis=1),
    ], axis=1)
    return grad, H


def _exp_higher_correction(H_dual, Zc, ds, v):
    """3rd-order correction η.  reference: coneops_expcone.jl:319-366"""
    u = chol3_solve(H_dual, ds)
    u = jnp.where(jnp.all(jnp.isfinite(u), axis=1, keepdims=True), u, 0.0)
    z1, z2, z3 = Zc[:, 0], Zc[:, 1], Zc[:, 2]

    gpsi2 = jnp.ones_like(z1)
    gpsi3 = -z1 / z3
    gpsi1 = _logsafe(gpsi3)
    psi = z1 * gpsi1 - z1 + z2

    gpsi = jnp.stack([gpsi1, gpsi2, gpsi3], axis=1)
    dotpsi_u = jnp.sum(gpsi * u, axis=1)
    dotpsi_v = jnp.sum(gpsi * v, axis=1)

    coef = (
        (u[:, 0] * (v[:, 0] / z1 - v[:, 2] / z3)
         + u[:, 2] * (z1 * v[:, 2] / z3 - v[:, 0]) / z3) * psi
        - 2.0 * dotpsi_u * dotpsi_v
    ) / (psi**3)
    eta = gpsi * coef[:, None]

    inv_psi2 = 1.0 / (psi * psi)
    eta1 = eta[:, 0] + (
        (1.0 / psi - 2.0 / z1) * u[:, 0] * v[:, 0] / (z1 * z1)
        - u[:, 2] * v[:, 2] / (z3 * z3) / psi
        + dotpsi_u * inv_psi2 * (v[:, 0] / z1 - v[:, 2] / z3)
        + dotpsi_v * inv_psi2 * (u[:, 0] / z1 - u[:, 2] / z3)
    )
    eta3 = eta[:, 2] + (
        2.0 * (z1 / psi - 1.0) * u[:, 2] * v[:, 2] / (z3**3)
        - (u[:, 2] * v[:, 0] + u[:, 0] * v[:, 2]) / (z3 * z3) / psi
        + dotpsi_u * inv_psi2 * (z1 * v[:, 2] / (z3 * z3) - v[:, 0] / z3)
        + dotpsi_v * inv_psi2 * (z1 * u[:, 2] / (z3 * z3) - u[:, 0] / z3)
    )
    eta = jnp.stack([eta1, eta[:, 1], eta3], axis=1) / 2.0
    return eta


# ---------------------------------------------------------------------------
# power cone internals (reference: coneops_powcone.jl:217-478)
# ---------------------------------------------------------------------------

def _pow_phi_dual(Z, a):
    return (Z[:, 0] / a) ** (2 * a) * (Z[:, 1] / (1 - a)) ** (2 - 2 * a)


def _pow_is_primal_feasible(S, a):
    ok = jnp.logical_and(S[:, 0] > 0, S[:, 1] > 0)
    res = jnp.exp(2 * a * _logsafe(S[:, 0]) + 2 * (1 - a) * _logsafe(S[:, 1])) - S[:, 2] ** 2
    return jnp.logical_and(ok, res > 0)


def _pow_is_dual_feasible(Z, a):
    ok = jnp.logical_and(Z[:, 0] > 0, Z[:, 1] > 0)
    res = jnp.exp(
        2 * a * _logsafe(Z[:, 0] / a) + 2 * (1 - a) * _logsafe(Z[:, 1] / (1 - a))
    ) - Z[:, 2] ** 2
    return jnp.logical_and(ok, res > 0)


def _pow_barrier_dual(Z, a):
    return (
        -_logsafe(_pow_phi_dual(Z, a) - Z[:, 2] ** 2)
        - (1 - a) * _logsafe(Z[:, 0])
        - a * _logsafe(Z[:, 1])
    )


def _pow_grad_primal(S, a, dtype):
    """NR-based primal gradient.  reference: coneops_powcone.jl:288-316,449-478"""
    s1, s2, s3 = S[:, 0], S[:, 1], S[:, 2]
    phi = s1 ** (2 * a) * s2 ** (2 - 2 * a)
    abs_s = jnp.abs(s3)
    eps = float(np.finfo(dtype).eps)
    big = abs_s > eps
    abs_safe = jnp.where(big, abs_s, 1.0)

    x0 = -1.0 / abs_safe + (
        2.0 * abs_safe + jnp.sqrt(phi * phi / (abs_safe * abs_safe) + 3.0 * phi)
    ) / (phi - abs_safe * abs_safe)
    t0 = -2.0 * a * _logsafe(a) - 2.0 * (1 - a) * _logsafe(1 - a)

    def f0(x):
        t1 = x * x
        t2 = 2.0 * x / abs_safe
        return (
            2 * a * _logsafe(2 * a * t1 + (1 + a) * t2)
            + 2 * (1 - a) * _logsafe(2 * (1 - a) * t1 + (2 - a) * t2)
            - _logsafe(phi) - _logsafe(t1 + t2) - 2.0 * _logsafe(t2) + t0
        )

    def f1(x):
        t1 = x * x
        t2 = 2.0 * x / abs_safe
        return (
            2 * a * a / (a * x + (1 + a) / abs_safe)
            + 2 * (1 - a) * (1 - a) / ((1 - a) * x + (2 - a) / abs_safe)
            - 2.0 * (x + 1.0 / abs_safe) / (t1 + t2)
        )

    g3abs = _newton_raphson_onesided(x0, f0, f1, dtype)
    g3 = jnp.where(big, jnp.sign(s3) * g3abs, 0.0)
    g1 = jnp.where(big, -(a * g3 * s3 + 1.0 + a) / s1, -(1 + a) / s1)
    g2 = jnp.where(big, -((1 - a) * g3 * s3 + 2.0 - a) / s2, -(2 - a) / s2)
    return jnp.stack([g1, g2, g3], axis=1)


def _pow_barrier_primal(S, a, dtype):
    g = _pow_grad_primal(S, a, dtype)
    val = (
        _logsafe((-g[:, 0] / a) ** (2 * a) * (-g[:, 1] / (1 - a)) ** (2 - 2 * a)
                 - g[:, 2] ** 2)
        + (1 - a) * _logsafe(-g[:, 0]) + a * _logsafe(-g[:, 1]) - 3.0
    )
    return jnp.where(_pow_is_primal_feasible(S, a), val, jnp.inf)


def _pow_dual_grad_H(Z, a):
    """reference: coneops_powcone.jl:408-440"""
    z1, z2, z3 = Z[:, 0], Z[:, 1], Z[:, 2]
    phi = _pow_phi_dual(Z, a)
    psi = phi - z3 * z3

    g1p = 2 * a * phi / (z1 * psi)
    g2p = 2 * (1 - a) * phi / (z2 * psi)
    g3p = -2 * z3 / psi

    H11 = g1p * g1p - 2 * a * (2 * a - 1) * phi / (z1 * z1 * psi) + (1 - a) / (z1 * z1)
    H12 = g1p * g2p - 4 * a * (1 - a) * phi / (z1 * z2 * psi)
    H22 = g2p * g2p - 2 * (1 - a) * (1 - 2 * a) * phi / (z2 * z2 * psi) + a / (z2 * z2)
    H13 = g1p * g3p
    H23 = g2p * g3p
    H33 = g3p * g3p + 2.0 / psi
    H = jnp.stack([
        jnp.stack([H11, H12, H13], axis=1),
        jnp.stack([H12, H22, H23], axis=1),
        jnp.stack([H13, H23, H33], axis=1),
    ], axis=1)

    grad = jnp.stack([-g1p - (1 - a) / z1, -g2p - a / z2, -g3p], axis=1)
    return grad, H


def _pow_higher_correction(H_dual, Zc, a, ds, v):
    """reference: coneops_powcone.jl:329-404"""
    u = chol3_solve(H_dual, ds)
    u = jnp.where(jnp.all(jnp.isfinite(u), axis=1, keepdims=True), u, 0.0)
    z1, z2, z3 = Zc[:, 0], Zc[:, 1], Zc[:, 2]
    phi = _pow_phi_dual(Zc, a)
    psi = phi - z3 * z3

    gpsi = jnp.stack([2 * a * phi / z1, 2 * (1 - a) * phi / z2, -2 * z3], axis=1)

    Hpsi11 = 2 * a * (2 * a - 1) * phi / (z1 * z1)
    Hpsi12 = 4 * a * (1 - a) * phi / (z1 * z2)
    Hpsi22 = 2 * (1 - a) * (1 - 2 * a) * phi / (z2 * z2)

    dotpsi_u = jnp.sum(gpsi * u, axis=1)
    dotpsi_v = jnp.sum(gpsi * v, axis=1)

    Hpsi_v1 = Hpsi11 * v[:, 0] + Hpsi12 * v[:, 1]
    Hpsi_v2 = Hpsi12 * v[:, 0] + Hpsi22 * v[:, 1]
    Hpsi_v3 = -2.0 * v[:, 2]

    u_dot_Hpsi_v = u[:, 0] * Hpsi_v1 + u[:, 1] * Hpsi_v2 + u[:, 2] * Hpsi_v3
    coef = (u_dot_Hpsi_v * psi - 2.0 * dotpsi_u * dotpsi_v) / (psi**3)
    coef2 = (
        4 * a * (2 * a - 1) * (1 - a) * phi
        * (u[:, 0] / z1 - u[:, 1] / z2) * (v[:, 0] / z1 - v[:, 1] / z2) / psi
    )
    inv_psi2 = 1.0 / (psi * psi)

    e1 = (coef * gpsi[:, 0] - 2 * (1 - a) * u[:, 0] * v[:, 0] / (z1**3)
          + coef2 / z1 + Hpsi_v1 * dotpsi_u * inv_psi2)
    e2 = (coef * gpsi[:, 1] - 2 * a * u[:, 1] * v[:, 1] / (z2**3)
          - coef2 / z2 + Hpsi_v2 * dotpsi_u * inv_psi2)
    e3 = coef * gpsi[:, 2] + Hpsi_v3 * dotpsi_u * inv_psi2

    Hpsi_u1 = Hpsi11 * u[:, 0] + Hpsi12 * u[:, 1]
    Hpsi_u2 = Hpsi12 * u[:, 0] + Hpsi22 * u[:, 1]
    Hpsi_u3 = -2.0 * u[:, 2]

    eta = jnp.stack([
        (e1 + Hpsi_u1 * dotpsi_v * inv_psi2) / 2.0,
        (e2 + Hpsi_u2 * dotpsi_v * inv_psi2) / 2.0,
        (e3 + Hpsi_u3 * dotpsi_v * inv_psi2) / 2.0,
    ], axis=1)
    return eta


# ---------------------------------------------------------------------------
# primal-dual (BFGS) scaling for 3-d cones
# (reference: coneops_nonsymmetric_common.jl:50-164)
# ---------------------------------------------------------------------------

def _primal_dual_scaling_3d(H_dual, st, zt, S, Z, dtype):
    """Returns the PD-scaled Hs and a per-cone bool of whether the PD form
    was usable (else caller falls back to μ_local * H_dual)."""
    eps = float(np.finfo(dtype).eps)
    dot_sz = jnp.sum(S * Z, axis=1)
    mu = dot_sz / 3.0
    mut = jnp.sum(zt * st, axis=1) / 3.0

    ds = S + mu[:, None] * st
    dz = Z + mu[:, None] * zt
    dot_dsz = jnp.sum(ds * dz, axis=1)

    de1 = mu * mut - 1.0
    Hzt = jnp.einsum("cij,cj->ci", H_dual, zt)
    de2 = jnp.sum(zt * Hzt, axis=1) - 3.0 * mut * mut

    usable = jnp.logical_and(
        jnp.logical_and(jnp.abs(de1) > np.sqrt(eps), jnp.abs(de2) > eps),
        jnp.logical_and(dot_sz > 0, dot_dsz > 0),
    )
    de2_safe = jnp.where(de2 != 0, de2, 1.0)

    tmp = mut[:, None] * st - Hzt
    Hws = (
        H_dual
        - st[:, :, None] * st[:, None, :] / 3.0
        - tmp[:, :, None] * tmp[:, None, :] / de2_safe[:, None, None]
    )
    t = mu * jnp.sqrt(jnp.sum(Hws * Hws, axis=(1, 2)))

    axis = jnp.cross(Z, zt)
    axis_norm = jnp.linalg.norm(axis, axis=1, keepdims=True)
    axis = axis / jnp.where(axis_norm > 0, axis_norm, 1.0)

    dot_sz_safe = jnp.where(dot_sz != 0, dot_sz, 1.0)
    dot_dsz_safe = jnp.where(dot_dsz != 0, dot_dsz, 1.0)
    Hs_pd = (
        S[:, :, None] * S[:, None, :] / dot_sz_safe[:, None, None]
        + ds[:, :, None] * ds[:, None, :] / dot_dsz_safe[:, None, None]
        + t[:, None, None] * axis[:, :, None] * axis[:, None, :]
    )
    usable = jnp.logical_and(usable, jnp.all(jnp.isfinite(Hs_pd), axis=(1, 2)))
    Hs_fallback = mu[:, None, None] * H_dual
    return jnp.where(usable[:, None, None], Hs_pd, Hs_fallback)


# ---------------------------------------------------------------------------
# genpow internals (reference: coneops_genpowcone.jl:237-472)
# ---------------------------------------------------------------------------

def _genpow_phi_dual(U, a):
    # U: (c, d1) head variables, a: (c, d1)
    return jnp.exp(jnp.sum(2 * a * _logsafe(U / a), axis=1))


def _genpow_is_primal_feasible(W, a, d1):
    S1, S2 = W[:, :d1], W[:, d1:]
    ok = jnp.all(S1 > 0, axis=1)
    res = jnp.exp(jnp.sum(2 * a * _logsafe(S1), axis=1)) - jnp.sum(S2 * S2, axis=1)
    return jnp.logical_and(ok, res > 0)


def _genpow_is_dual_feasible(W, a, d1):
    Z1, Z2 = W[:, :d1], W[:, d1:]
    ok = jnp.all(Z1 > 0, axis=1)
    res = _genpow_phi_dual(Z1, a) - jnp.sum(Z2 * Z2, axis=1)
    return jnp.logical_and(ok, res > 0)


def _genpow_barrier_dual(W, a, d1):
    Z1, Z2 = W[:, :d1], W[:, d1:]
    res = _genpow_phi_dual(Z1, a) - jnp.sum(Z2 * Z2, axis=1)
    return -_logsafe(res) - jnp.sum((1.0 - a) * _logsafe(Z1), axis=1)


def _genpow_grad_primal(W, a, d1, dtype):
    """reference: coneops_genpowcone.jl:393-426, NR at :437-472"""
    P, R = W[:, :d1], W[:, d1:]
    phi = jnp.exp(jnp.sum(2 * a * _logsafe(P), axis=1))
    norm_r = jnp.linalg.norm(R, axis=1)
    eps = float(np.finfo(dtype).eps)
    big = norm_r > eps
    nr = jnp.where(big, norm_r, 1.0)
    psi_const = 1.0 / jnp.sum(a * a, axis=1)  # ψ = 1/⟨α,α⟩ (reference: cone_types.jl ψ = inv(dot(α,α)))

    x0 = -1.0 / nr + (
        psi_const * nr + jnp.sqrt((phi / (nr * nr) + psi_const * psi_const - 1.0) * phi)
    ) / (phi - nr * nr)

    def f0(x):
        v = -_logsafe(2.0 * x / nr + x * x)
        v = v + jnp.sum(
            2 * a * (_logsafe(x[:, None] * nr[:, None] + (1 + a) / a) - _logsafe(P)),
            axis=1,
        )
        return v

    def f1(x):
        v = -(2.0 * x + 2.0 / nr) / (x * x + 2.0 * x / nr)
        v = v + jnp.sum(2 * a * nr[:, None] / (nr[:, None] * x[:, None] + (1 + a) / a), axis=1)
        return v

    g1 = _newton_raphson_onesided(x0, f0, f1, dtype)
    gr = jnp.where(big[:, None], g1[:, None] * R / nr[:, None], 0.0)
    gp = jnp.where(
        big[:, None],
        -(1.0 + a + a * (g1 * norm_r)[:, None]) / P,
        -(1.0 + a) / P,
    )
    return jnp.concatenate([gp, gr], axis=1)


def _genpow_barrier_primal(W, a, d1, dtype):
    g = _genpow_grad_primal(W, a, d1, dtype)
    val = -_genpow_barrier_dual(-g, a, d1) - (d1 + 1.0)
    return jnp.where(_genpow_is_primal_feasible(W, a, d1), val, jnp.inf)


def _genpow_dual_grad_H(W, a, d1):
    """gradient + (d1, d2, p, q, r) Hessian data.
    reference: coneops_genpowcone.jl:337-389"""
    U, V = W[:, :d1], W[:, d1:]
    phi = _genpow_phi_dual(U, a)
    norm2w = jnp.sum(V * V, axis=1)
    zeta = phi - norm2w
    ok = zeta > 0
    zeta_safe = jnp.where(ok, zeta, 1.0)

    tau = 2.0 * a / U
    grad_head = -tau * (phi / zeta_safe)[:, None] - (1.0 - a) / U
    grad_tail = 2.0 * V / zeta_safe[:, None]
    grad = jnp.concatenate([grad_head, grad_tail], axis=1)

    p0 = jnp.sqrt(phi * (phi + norm2w) / 2.0)
    p1 = -2.0 * phi / p0
    q0 = jnp.sqrt(zeta_safe * phi / 2.0)
    r1 = 2.0 * jnp.sqrt(zeta_safe / (phi + norm2w))

    dd1 = tau * (phi / zeta_safe)[:, None] / U + (1.0 - a) / (U * U)
    dd2 = 2.0 / zeta_safe

    p = jnp.concatenate(
        [p0[:, None] * tau / zeta_safe[:, None], p1[:, None] * V / zeta_safe[:, None]],
        axis=1,
    )
    q = tau * (q0 / zeta_safe)[:, None]
    r = r1[:, None] * V / zeta_safe[:, None]
    return grad, dd1, dd2, p, q, r, ok


# ---------------------------------------------------------------------------
# interface implementations used by ops.py
# ---------------------------------------------------------------------------

def identity_scaling(g: ConeGroup, dtype):
    raise RuntimeError(
        "identity scaling is never used for nonsymmetric cones "
        "(asymmetric problems use unit initialization)"
    )


def unit_initialization(g: ConeGroup, z, s):
    if g.kind == "exp":
        vals = jnp.broadcast_to(jnp.asarray(_EXP_UNIT, z.dtype), g.idx.shape)
        z = _scatter(z, g, vals)
        s = _scatter(s, g, vals)
    elif g.kind == "pow":
        a = jnp.asarray(g.alpha, z.dtype)
        vals = jnp.stack(
            [jnp.sqrt(1.0 + a), jnp.sqrt(1.0 + (1.0 - a)), jnp.zeros_like(a)],
            axis=1,
        )
        z = _scatter(z, g, vals)
        s = _scatter(s, g, vals)
    elif g.kind == "genpow":
        a = jnp.asarray(g.alpha, z.dtype)  # (c, d1)
        head = jnp.sqrt(1.0 + a)
        tail = jnp.zeros((g.count, g.dim2), z.dtype)
        vals = jnp.concatenate([head, tail], axis=1)
        z = _scatter(z, g, vals)
        s = _scatter(s, g, vals)
    return z, s


def update_scaling(g: ConeGroup, s, z, mu, scaling_strategy):
    """reference: coneops_{expcone,powcone}.jl update_scaling! + update_Hs"""
    S, Z = _gather(s, g), _gather(z, g)
    dtype = S.dtype

    if g.kind == "exp":
        grad, H_dual = _exp_dual_grad_H(Z)
        zt = _exp_grad_primal(S)
        Hs_pd = _primal_dual_scaling_3d(H_dual, grad, zt, S, Z, dtype)
        Hs_dual = mu * H_dual
        Hs = jnp.where(scaling_strategy == 0, Hs_pd, Hs_dual)
        ok = jnp.all(jnp.isfinite(Hs))
        return {"grad": grad, "H_dual": H_dual, "Hs": Hs, "z": Z}, ok

    if g.kind == "pow":
        a = jnp.asarray(g.alpha, dtype)
        grad, H_dual = _pow_dual_grad_H(Z, a)
        zt = _pow_grad_primal(S, a, dtype)
        Hs_pd = _primal_dual_scaling_3d(H_dual, grad, zt, S, Z, dtype)
        Hs_dual = mu * H_dual
        Hs = jnp.where(scaling_strategy == 0, Hs_pd, Hs_dual)
        ok = jnp.all(jnp.isfinite(Hs))
        return {"grad": grad, "H_dual": H_dual, "Hs": Hs, "z": Z}, ok

    if g.kind == "genpow":
        a = jnp.asarray(g.alpha, dtype)
        grad, dd1, dd2, p, q, r, okz = _genpow_dual_grad_H(Z, a, g.dim1)
        state = {"grad": grad, "d1": dd1, "d2": dd2, "p": p, "q": q, "r": r,
                 "mu": jnp.asarray(mu, dtype)}
        return state, jnp.all(okz)

    raise NotImplementedError(g.kind)


def hs_blocks(g: ConeGroup, state, dtype):
    """Dense per-cone Hs blocks, (c, width, width)."""
    if g.kind in ("exp", "pow"):
        return state["Hs"]
    if g.kind == "genpow":
        # dense μH = μ(D + pp' − qq' − rr'), q on head block, r on tail
        # (reference: coneops_genpowcone.jl:111-135 sparse form)
        d1 = g.dim1
        mu = state["mu"]
        dvec = jnp.concatenate(
            [state["d1"], state["d2"][:, None] * jnp.ones((g.count, g.dim2), dtype)],
            axis=1,
        )
        qfull = jnp.concatenate([state["q"], jnp.zeros((g.count, g.dim2), dtype)], axis=1)
        rfull = jnp.concatenate([jnp.zeros((g.count, d1), dtype), state["r"]], axis=1)
        p = state["p"]
        return (
            jnp.eye(g.width, dtype=dtype)[None] * dvec[:, None, :]
            + p[:, :, None] * p[:, None, :]
            - qfull[:, :, None] * qfull[:, None, :]
            - rfull[:, :, None] * rfull[:, None, :]
        ) * mu
    raise NotImplementedError(g.kind)


def hs_dense_scatter(g: ConeGroup, state, H):
    blocks = hs_blocks(g, state, H.dtype)
    H = H.at[g.idx[:, :, None], g.idx[:, None, :]].set(blocks)
    return H


def mul_Hs(g: ConeGroup, state, x, y):
    X = _gather(x, g)
    if g.kind in ("exp", "pow"):
        out = jnp.sum(state["Hs"] * X[:, None, :], axis=2)
        return _scatter(y, g, out)
    if g.kind == "genpow":
        d1 = g.dim1
        coef_p = jnp.sum(state["p"] * X, axis=1)
        coef_q = jnp.sum(state["q"] * X[:, :d1], axis=1)
        coef_r = jnp.sum(state["r"] * X[:, d1:], axis=1)
        head = state["d1"] * X[:, :d1] - coef_q[:, None] * state["q"]
        tail = state["d2"][:, None] * X[:, d1:] - coef_r[:, None] * state["r"]
        out = jnp.concatenate([head, tail], axis=1)
        out = out + coef_p[:, None] * state["p"]
        out = out * state["mu"]
        return _scatter(y, g, out)
    raise NotImplementedError(g.kind)


def combined_ds_shift(g: ConeGroup, state, step_z, step_s, sigma_mu, z, shift):
    """shift = σμ·g(z) − η (exp/pow include the 3rd-order correction η;
    genpow has none in the reference)."""
    if g.kind == "exp":
        eta = _exp_higher_correction(
            state["H_dual"], state["z"], _gather(step_s, g), _gather(step_z, g)
        )
        out = state["grad"] * sigma_mu - eta
    elif g.kind == "pow":
        a = jnp.asarray(g.alpha, shift.dtype)
        eta = _pow_higher_correction(
            state["H_dual"], state["z"], a, _gather(step_s, g), _gather(step_z, g)
        )
        out = state["grad"] * sigma_mu - eta
    elif g.kind == "genpow":
        out = state["grad"] * sigma_mu
    else:
        raise NotImplementedError(g.kind)
    return _scatter(shift, g, out)


def step_length(g: ConeGroup, dz, ds, z, s, alpha_max, settings):
    step = settings.linesearch_backtrack_step
    alpha_min = settings.min_terminate_step_length
    Z, S = _gather(z, g), _gather(s, g)
    DZ, DS = _gather(dz, g), _gather(ds, g)
    dtype = Z.dtype

    if g.kind == "exp":
        dual_feas = _exp_is_dual_feasible
        prim_feas = _exp_is_primal_feasible
    elif g.kind == "pow":
        a = jnp.asarray(g.alpha, dtype)
        dual_feas = lambda W: _pow_is_dual_feasible(W, a)
        prim_feas = lambda W: _pow_is_primal_feasible(W, a)
    elif g.kind == "genpow":
        a = jnp.asarray(g.alpha, dtype)
        dual_feas = lambda W: _genpow_is_dual_feasible(W, a, g.dim1)
        prim_feas = lambda W: _genpow_is_primal_feasible(W, a, g.dim1)
    else:
        raise NotImplementedError(g.kind)

    az = _backtrack_search(Z, DZ, dual_feas, alpha_max, alpha_min, step)
    a_s = _backtrack_search(S, DS, prim_feas, alpha_max, alpha_min, step)
    return jnp.minimum(az, a_s)


def compute_barrier(g: ConeGroup, z, s, dz, ds, alpha):
    Z = _gather(z, g) + alpha * _gather(dz, g)
    S = _gather(s, g) + alpha * _gather(ds, g)
    dtype = Z.dtype
    if g.kind == "exp":
        bd = jnp.where(_exp_is_dual_feasible(Z), _exp_barrier_dual(Z), jnp.inf)
        bp = _exp_barrier_primal(S)
    elif g.kind == "pow":
        a = jnp.asarray(g.alpha, dtype)
        bd = jnp.where(_pow_is_dual_feasible(Z, a), _pow_barrier_dual(Z, a), jnp.inf)
        bp = _pow_barrier_primal(S, a, dtype)
    elif g.kind == "genpow":
        a = jnp.asarray(g.alpha, dtype)
        bd = jnp.where(
            _genpow_is_dual_feasible(Z, a, g.dim1),
            _genpow_barrier_dual(Z, a, g.dim1),
            jnp.inf,
        )
        bp = _genpow_barrier_primal(S, a, g.dim1, dtype)
    else:
        raise NotImplementedError(g.kind)
    return jnp.sum(bd) + jnp.sum(bp)
