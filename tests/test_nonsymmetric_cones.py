"""Exponential / power / generalized power cone solver tests.

Mirrors the reference opt tests (reference: test/OptTests/basic_exp.jl,
basic_pow.jl, basic_genpow.jl) plus kernel-level checks on the
Wright-omega function and dual gradients/Hessians.
"""

import numpy as np
import pytest

from clarabel_tpu import (
    Solver,
    Settings,
    SolverStatus,
    ZeroConeT,
    NonnegativeConeT,
    ExponentialConeT,
    PowerConeT,
    GenPowerConeT,
)


def basic_exp_data():
    """reference: test/OptTests/basic_exp.jl:6-34"""
    A1 = np.hstack([np.ones((1, 3)), np.zeros((1, 4))])
    b1 = np.array([10.0])
    A2 = np.hstack([np.zeros((3, 2)), -np.eye(3), np.zeros((3, 2))])
    b2 = np.zeros(3)
    A3 = np.zeros((3, 7))
    A3[0, 0] = -1.0
    A3[1, 2] = -1.0
    A3[2, 4] = -1.0
    b3 = np.zeros(3)
    q = np.array([1.0, 0.5, -2.0, -0.1, 1.0, 3.0, 0.0])
    P = np.eye(7) * 1e-1
    A = np.vstack([A1, A2, A3])
    b = np.concatenate([b1, b2, b3])
    cones = [ZeroConeT(1), NonnegativeConeT(3), ExponentialConeT()]
    return P, q, A, b, cones


def basic_pow_data():
    """reference: test/OptTests/basic_pow.jl:6-36"""
    n = 6
    P = np.zeros((n, n))
    q = np.zeros(n)
    q[2] = q[5] = -1.0
    A1 = np.eye(6)
    A2 = np.array([[1.0, 2.0, 0.0, 3.0, 0.0, 0.0]])
    A3 = np.array([[0.0, 0.0, 0.0, 0.0, 1.0, 0.0]])
    A = -np.vstack([A1, A2, A3])
    b = np.concatenate([np.zeros(6), [-3.0], [-1.0]])
    cones = [PowerConeT(0.6), PowerConeT(0.1), ZeroConeT(1), ZeroConeT(1)]
    return P, q, A, b, cones


def basic_genpow_data():
    """reference: test/OptTests/basic_genpow.jl:8-33"""
    n = 6
    P = np.zeros((n, n))
    q = np.zeros(n)
    q[2] = q[5] = -1.0
    A = np.array([
        [-1.0, 0, 0, 0, 0, 0],
        [0, -1.0, 0, 0, 0, 0],
        [0, 0, -1.0, 0, 0, 0],
        [0, 0, 0, -1.0, 0, 0],
        [0, 0, 0, 0, -1.0, 0],
        [0, 0, 0, 0, 0, -1.0],
        [1.0, 2.0, 0, 3.0, 0, 0],
        [0, 0, 0, 0, 1.0, 0],
    ])
    b = np.array([0.0, 0, 0, 0, 0, 0, 3.0, 1.0])
    cones = [
        GenPowerConeT((0.6, 0.4), 1),
        GenPowerConeT((0.1, 0.9), 1),
        ZeroConeT(2),
    ]
    return P, q, A, b, cones


def test_wright_omega():
    """ω satisfies ω + log(ω) = z."""
    import jax.numpy as jnp
    from clarabel_tpu.cones.nonsymmetric import _wright_omega

    z = jnp.asarray(np.linspace(0.1, 40.0, 50))
    w = _wright_omega(z)
    assert np.allclose(np.asarray(w + jnp.log(w)), np.asarray(z), atol=1e-12)


def test_exp_dual_grad_hessian_consistency():
    """H must be the Jacobian of the gradient of the dual barrier."""
    import jax
    import jax.numpy as jnp
    from clarabel_tpu.cones.nonsymmetric import (
        _exp_dual_grad_H, _exp_barrier_dual,
    )

    z = np.array([-0.9, 1.3, 1.7])
    grad, H = _exp_dual_grad_H(jnp.asarray(z[None, :]))
    auto_g = jax.grad(lambda zz: _exp_barrier_dual(zz[None, :])[0])(jnp.asarray(z))
    auto_H = jax.hessian(lambda zz: _exp_barrier_dual(zz[None, :])[0])(jnp.asarray(z))
    assert np.allclose(np.asarray(grad)[0], np.asarray(auto_g), atol=1e-8)
    assert np.allclose(np.asarray(H)[0], np.asarray(auto_H), atol=1e-7)


def test_pow_dual_grad_hessian_consistency():
    import jax
    import jax.numpy as jnp
    from clarabel_tpu.cones.nonsymmetric import (
        _pow_dual_grad_H, _pow_barrier_dual,
    )

    a = 0.3
    z = np.array([0.8, 1.1, 0.4])
    aj = jnp.asarray([a])
    grad, H = _pow_dual_grad_H(jnp.asarray(z[None, :]), aj)
    auto_g = jax.grad(lambda zz: _pow_barrier_dual(zz[None, :], aj)[0])(jnp.asarray(z))
    auto_H = jax.hessian(lambda zz: _pow_barrier_dual(zz[None, :], aj)[0])(jnp.asarray(z))
    assert np.allclose(np.asarray(grad)[0], np.asarray(auto_g), atol=1e-8)
    assert np.allclose(np.asarray(H)[0], np.asarray(auto_H), atol=1e-7)


def test_basic_exp_feasible():
    P, q, A, b, cones = basic_exp_data()
    sol = Solver(P, q, A, b, cones).solve()
    refx = np.array([
        -9.425995201329599, 4.828561507482018, 14.59743362204262,
        1.0000012112102774, 7.65314081561849, -29.99999978458479, 0.0,
    ])
    assert sol.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol.x - refx) < 1e-3
    assert abs(sol.obj_val - (-54.41243965302268)) < 1e-3


def test_basic_pow_feasible():
    P, q, A, b, cones = basic_pow_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - (-1.8458)) < 1e-3


def test_basic_genpow_feasible():
    P, q, A, b, cones = basic_genpow_data()
    sol = Solver(P, q, A, b, cones).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - (-1.8458)) < 1e-3


def test_strategy_downgrade_to_dual():
    """Force the PrimalDual->Dual downgrade (reference:
    src/solver.jl:492-505): with min_switch_step_length above any
    realizable step, asymmetric problems must fall back to the Dual
    scaling strategy and still converge."""
    P, q, A, b, cones = basic_exp_data()
    sol = Solver(
        P, q, A, b, cones,
        Settings(min_switch_step_length=2.0),
    ).solve()
    assert sol.status == SolverStatus.SOLVED
    assert abs(sol.obj_val - (-54.41243965302268)) < 1e-3
