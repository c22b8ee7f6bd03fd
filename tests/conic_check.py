"""Independent NumPy verification of conic KKT optimality conditions.

Used by the conformance battery: every solver answer is checked directly
against the mathematical optimality conditions in host f64 — primal/dual
cone membership (including the nonsymmetric dual cones in closed form),
stationarity, primal feasibility, and complementary slackness.  This is
an *independent* oracle: none of the solver's own residual machinery is
reused (role analogue of the reference's MOI.Test conformance suite,
reference: test/Interfaces/MOI_wrapper_tests.jl:17-88).
"""

import numpy as np

from clarabel_tpu.cones.api import (
    ZeroConeT, NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
    ExponentialConeT, PowerConeT, GenPowerConeT, nvars,
)


def _unsvec(v, d):
    """svec (upper-tri column-stacked, off-diag ×√2) -> dense symmetric."""
    M = np.zeros((d, d))
    k = 0
    for j in range(d):
        for i in range(j + 1):
            if i == j:
                M[i, j] = v[k]
            else:
                M[i, j] = M[j, i] = v[k] / np.sqrt(2.0)
            k += 1
    return M


def primal_margin(cone, s):
    """Distance-like interior margin: >= -tol means s is in the cone."""
    if isinstance(cone, ZeroConeT):
        return -np.max(np.abs(s)) if len(s) else 0.0
    if isinstance(cone, NonnegativeConeT):
        return np.min(s) if len(s) else 0.0
    if isinstance(cone, SecondOrderConeT):
        return s[0] - np.linalg.norm(s[1:])
    if isinstance(cone, PSDTriangleConeT):
        return np.linalg.eigvalsh(_unsvec(s, cone.dim)).min()
    if isinstance(cone, ExponentialConeT):
        x, y, z = s
        if y > 0:
            return min(z - y * np.exp(x / y), y)
        # boundary: y = 0 requires z >= 0, x <= 0
        return min(z, -x, y)
    if isinstance(cone, PowerConeT):
        a = cone.alpha
        x1, x2, x3 = s
        if x1 >= 0 and x2 >= 0:
            return (x1 ** a) * (x2 ** (1 - a)) - abs(x3)
        return min(x1, x2)
    if isinstance(cone, GenPowerConeT):
        al = np.asarray(cone.alpha)
        d1 = len(al)
        u, w = s[:d1], s[d1:]
        if np.all(u >= 0):
            return np.prod(u ** al) - np.linalg.norm(w)
        return np.min(u)
    raise TypeError(cone)


def dual_margin(cone, z):
    if isinstance(cone, ZeroConeT):
        return 0.0  # dual of {0} is everything
    if isinstance(cone, (NonnegativeConeT, SecondOrderConeT,
                         PSDTriangleConeT)):
        return primal_margin(cone, z)  # self-dual
    if isinstance(cone, ExponentialConeT):
        # K* = cl{(u,v,w): u < 0, -u e^{v/u} <= e w}
        u, v, w = z
        if u < 0:
            return min(np.e * w - (-u) * np.exp(v / u), -u)
        return min(v, w, -u)
    if isinstance(cone, PowerConeT):
        a = cone.alpha
        u, v, w = z
        if u >= 0 and v >= 0:
            return ((u / a) ** a) * ((v / (1 - a)) ** (1 - a)) - abs(w)
        return min(u, v)
    if isinstance(cone, GenPowerConeT):
        al = np.asarray(cone.alpha)
        d1 = len(al)
        u, w = z[:d1], z[d1:]
        if np.all(u >= 0):
            return np.prod((u / al) ** al) - np.linalg.norm(w)
        return np.min(u)
    raise TypeError(cone)


def interior_point(cone, rng):
    """A strictly interior point of the cone (for constructing feasible
    problems)."""
    d = nvars(cone)
    if isinstance(cone, ZeroConeT):
        return np.zeros(d)
    if isinstance(cone, NonnegativeConeT):
        return rng.uniform(0.5, 2.0, d)
    if isinstance(cone, SecondOrderConeT):
        x = rng.standard_normal(d - 1) * 0.3
        return np.concatenate([[np.linalg.norm(x) + rng.uniform(0.5, 1.0)], x])
    if isinstance(cone, PSDTriangleConeT):
        n = cone.dim
        F = rng.standard_normal((n, n)) * 0.3
        M = F @ F.T + np.eye(n)
        out = []
        for j in range(n):
            for i in range(j + 1):
                out.append(M[i, j] * (1.0 if i == j else np.sqrt(2.0)))
        return np.asarray(out)
    if isinstance(cone, ExponentialConeT):
        x = rng.uniform(-0.5, 0.5)
        y = rng.uniform(0.5, 1.5)
        z = y * np.exp(x / y) + rng.uniform(0.3, 1.0)
        return np.array([x, y, z])
    if isinstance(cone, PowerConeT):
        a = cone.alpha
        x1 = rng.uniform(0.8, 1.5)
        x2 = rng.uniform(0.8, 1.5)
        x3 = (x1 ** a) * (x2 ** (1 - a)) * rng.uniform(-0.5, 0.5)
        return np.array([x1, x2, x3])
    if isinstance(cone, GenPowerConeT):
        al = np.asarray(cone.alpha)
        d1 = len(al)
        u = rng.uniform(0.8, 1.5, d1)
        lim = np.prod(u ** al)
        w = rng.standard_normal(d - d1)
        nw = np.linalg.norm(w)
        if nw > 0:
            w *= 0.5 * lim / nw
        return np.concatenate([u, w])
    raise TypeError(cone)


def interior_dual_point(cone, rng):
    if isinstance(cone, ZeroConeT):
        return rng.standard_normal(nvars(cone)) * 0.3
    if isinstance(cone, (NonnegativeConeT, SecondOrderConeT,
                         PSDTriangleConeT)):
        return interior_point(cone, rng)
    if isinstance(cone, ExponentialConeT):
        u = -rng.uniform(0.5, 1.5)
        v = rng.uniform(-0.3, 0.3)
        w = (-u) * np.exp(v / u) / np.e + rng.uniform(0.3, 1.0)
        return np.array([u, v, w])
    if isinstance(cone, PowerConeT):
        a = cone.alpha
        u = rng.uniform(0.8, 1.5)
        v = rng.uniform(0.8, 1.5)
        lim = ((u / a) ** a) * ((v / (1 - a)) ** (1 - a))
        return np.array([u, v, lim * rng.uniform(-0.5, 0.5)])
    if isinstance(cone, GenPowerConeT):
        al = np.asarray(cone.alpha)
        d1 = len(al)
        u = rng.uniform(0.8, 1.5, d1)
        lim = np.prod((u / al) ** al)
        w = rng.standard_normal(nvars(cone) - d1)
        nw = np.linalg.norm(w)
        if nw > 0:
            w *= 0.5 * lim / nw
        return np.concatenate([u, w])
    raise TypeError(cone)


def check_kkt(P, q, A, b, cones, sol, tol=1e-6):
    """Assert the returned (x, z, s) satisfies the KKT conditions."""
    x, z, s = sol.x, sol.z, sol.s
    scale = max(1.0, np.linalg.norm(x), np.linalg.norm(z))
    # stationarity: Px + q + A'z = 0
    stat = np.linalg.norm(P @ x + q + A.T @ z)
    assert stat < tol * scale, f"stationarity {stat:.2e}"
    # primal feasibility: Ax + s = b
    pfeas = np.linalg.norm(A @ x + s - b)
    assert pfeas < tol * scale, f"primal feasibility {pfeas:.2e}"
    # cone memberships
    ofs = 0
    for cone in cones:
        d = nvars(cone)
        pm = primal_margin(cone, s[ofs:ofs + d])
        dm = dual_margin(cone, z[ofs:ofs + d])
        assert pm > -tol * scale, f"{cone}: primal margin {pm:.2e}"
        assert dm > -tol * scale, f"{cone}: dual margin {dm:.2e}"
        ofs += d
    # complementary slackness
    gap = abs(float(s @ z))
    assert gap < tol * scale * scale, f"gap {gap:.2e}"
