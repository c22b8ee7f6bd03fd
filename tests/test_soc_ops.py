"""SOC cone-operator unit tests.

Mirrors reference: test/UnitTests/test_coneops_secondordercone.jl —
NT-scaling identities checked against dense linear algebra.
"""

import numpy as np
import jax.numpy as jnp

from clarabel_tpu import SecondOrderConeT
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.cones import ops as cone_ops


def interior_point(rng, d):
    v = rng.standard_normal(d)
    v[0] = np.linalg.norm(v[1:]) + rng.uniform(0.5, 2.0)
    return v


def test_soc_nt_scaling_identities():
    rng = np.random.default_rng(0)
    d = 7
    layout = ConeLayout([SecondOrderConeT(d)])
    g = layout.groups[f"soc{d}"]

    s = interior_point(rng, d)
    z = interior_point(rng, d)
    state, ok = cone_ops.update_scaling(
        layout, None, jnp.asarray(s), jnp.asarray(z), 1.0, 0
    )
    assert bool(ok)
    st = state[f"soc{d}"]
    w = np.asarray(st["w"])[0]
    eta = float(np.asarray(st["eta"])[0])
    lam = np.asarray(st["lam"])[0]

    # W as a dense matrix: W = η (2ww' − J)^{1/2}... use the ECOS product
    # form instead: W x = η(w0 x0 + w1'x1, x1 + (x0 + w1'x1/(1+w0)) w1)
    def mul_W(x):
        zeta = w[1:] @ x[1:]
        c = x[0] + zeta / (1 + w[0])
        return eta * np.concatenate([[w[0] * x[0] + zeta], x[1:] + c * w[1:]])

    # λ = W z = W^{-T} s  =>  W λ = W W z = Hs z should equal s? No:
    # identity is λ = Wz and Wᵀλ = s (W symmetric).
    assert np.allclose(mul_W(z), lam, atol=1e-12)
    assert np.allclose(mul_W(lam), s, atol=1e-10)

    # Hs = W² : Hs z = W(Wz) = Wλ = s
    y = np.asarray(cone_ops.mul_Hs(layout, state, jnp.asarray(z)))
    assert np.allclose(y, s, atol=1e-10)

    # dense Hs block agrees with the operator
    H = np.asarray(cone_ops.hs_dense(layout, state, np.float64))
    assert np.allclose(H @ z, s, atol=1e-10)
    # Hs = η²(2ww' − J)
    J = np.diag([1.0] + [-1.0] * (d - 1))
    assert np.allclose(H, eta**2 * (2 * np.outer(w, w) - J), atol=1e-12)


def test_soc_step_length_boundary():
    """Step length should place the point exactly on the cone boundary."""
    rng = np.random.default_rng(1)
    d = 5
    layout = ConeLayout([SecondOrderConeT(d)])

    z = interior_point(rng, d)
    dz = rng.standard_normal(d)
    dz[0] = -abs(dz[0]) - np.linalg.norm(dz[1:])  # leaves the cone

    from clarabel_tpu import Settings

    a = float(
        cone_ops.step_length(
            layout, None, jnp.asarray(dz), jnp.zeros(d), jnp.asarray(z),
            jnp.asarray(interior_point(rng, d)), 1e10, Settings(),
        )
    )
    zb = z + a * dz
    res = zb[0] ** 2 - np.linalg.norm(zb[1:]) ** 2
    assert res > -1e-9 and abs(res) < 1e-6 * max(1, zb[0] ** 2)
