"""Condensed (normal-equations) KKT backend: parity with the LDL backend
across all cone families, plus a direct Hs-inverse identity check."""

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus

from fixtures import basic_qp_data, basic_socp_data, eq_constrained_qp_data
from test_nonsymmetric_cones import (
    basic_exp_data, basic_pow_data, basic_genpow_data,
)


CASES = {
    "qp": basic_qp_data,
    "socp": basic_socp_data,
    "eq": eq_constrained_qp_data,
    "exp": basic_exp_data,
    "pow": basic_pow_data,
    "genpow": basic_genpow_data,
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_condensed_matches_ldl(case):
    P, q, A, b, cones = CASES[case]()
    sol_ldl = Solver(P, q, A, b, cones).solve()
    sol_cond = Solver(
        P, q, A, b, cones, Settings(kkt_backend="condensed")
    ).solve()
    assert sol_cond.status == sol_ldl.status
    if sol_ldl.status == SolverStatus.SOLVED:
        assert abs(sol_cond.obj_val - sol_ldl.obj_val) < 1e-6
        assert sol_cond.r_prim < 1e-8 and sol_cond.r_dual < 1e-8


def test_condensed_sdp():
    from test_psd_cone import test_basic_sdp_feasible  # fixture values inline

    P = np.eye(6)
    q = np.zeros(6)
    A = np.eye(6)
    b = np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0])
    from clarabel_tpu import PSDTriangleConeT

    sol = Solver(
        P, q, A, b, [PSDTriangleConeT(3)], Settings(kkt_backend="condensed")
    ).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - 4.840076866013861) < 1e-4


def test_hs_inverse_identity():
    """mul_Hs_inv must invert hs_dense on every cone group type."""
    import jax.numpy as jnp
    from clarabel_tpu.cones.layout import ConeLayout
    from clarabel_tpu.cones import ops as cone_ops
    from clarabel_tpu import (
        NonnegativeConeT, SecondOrderConeT, PSDTriangleConeT,
        ExponentialConeT, PowerConeT,
    )

    rng = np.random.default_rng(0)
    cones = [
        NonnegativeConeT(4), SecondOrderConeT(4), PSDTriangleConeT(3),
        ExponentialConeT(), PowerConeT(0.4),
    ]
    layout = ConeLayout(cones)
    m = layout.m
    # a strictly interior point for every cone
    z, s = cone_ops.unit_initialization(layout, np.float64)
    z = z + 0.01 * jnp.asarray(rng.standard_normal(m))
    s = s + 0.01 * jnp.asarray(rng.standard_normal(m))
    state, ok = cone_ops.update_scaling(layout, None, s, z, 1.0, 1)
    assert bool(ok)

    H = np.asarray(cone_ops.hs_dense(layout, state, np.float64))
    x = rng.standard_normal(m)
    y = np.asarray(cone_ops.mul_Hs_inv(layout, state, jnp.asarray(x), 1e-8))
    assert np.allclose(H @ y, x, atol=1e-8)
