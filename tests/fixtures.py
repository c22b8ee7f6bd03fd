"""Shared problem fixtures with known solutions.

Problem data and expected solutions correspond to the reference's
solver-level opt tests (reference: test/OptTests/*.jl), so that passing
these at the reference's tolerances demonstrates solution parity.
"""

import numpy as np

from clarabel_tpu import (
    NonnegativeConeT,
    SecondOrderConeT,
    ZeroConeT,
)


def basic_lp_data():
    """reference: test/OptTests/basic_lp.jl:6-17"""
    P = np.zeros((3, 3))
    A = np.vstack([np.eye(3), -np.eye(3)]) * 2.0
    q = np.array([3.0, -2.0, 1.0])
    b = np.ones(6)
    cones = [NonnegativeConeT(3), NonnegativeConeT(3)]
    return P, q, A, b, cones


def basic_qp_data():
    """reference: test/OptTests/basic_qp.jl:6-19"""
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A0 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])
    A = np.vstack([-A0, A0])
    b = np.concatenate([-l, u])
    cones = [NonnegativeConeT(3), NonnegativeConeT(3)]
    return P, q, A, b, cones


def basic_qp_data_dualinf():
    """reference: test/OptTests/basic_qp.jl:22-32"""
    P = np.array([[1.0, 1.0], [1.0, 1.0]])
    q = np.array([1.0, -1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0]])
    b = np.array([1.0, 1.0])
    cones = [NonnegativeConeT(2)]
    return P, q, A, b, cones


def basic_socp_data():
    """reference: test/OptTests/basic_socp.jl:6-30"""
    P = np.array(
        [
            [1.4652521089139698, 0.6137176286085666, -1.1527861771130112],
            [0.6137176286085666, 2.219109946678485, -1.4400420548730628],
            [-1.1527861771130112, -1.4400420548730628, 1.6014483534926371],
        ]
    )
    A1 = np.vstack([np.eye(3), -np.eye(3)]) * 2.0
    q = np.array([0.1, -2.0, 1.0])
    b1 = np.ones(6)
    A2 = np.eye(3)
    b2 = np.zeros(3)
    A = np.vstack([A1, A2])
    b = np.concatenate([b1, b2])
    cones = [NonnegativeConeT(3), NonnegativeConeT(3), SecondOrderConeT(3)]
    return P, q, A, b, cones


def eq_constrained_qp_data():
    """Simple equality-constrained QP (zero cone):
    min 1/2 x'Px + q'x  s.t.  sum(x) = 1,  x1 = 0.3
    reference analogue: test/OptTests/basic_eqconstrained.jl"""
    P = np.array([[3.0, 1.0, 0.0], [1.0, 2.0, 0.5], [0.0, 0.5, 1.5]])
    q = np.array([1.0, -2.0, 0.5])
    A = np.array([[1.0, 1.0, 1.0], [1.0, 0.0, 0.0]])
    b = np.array([1.0, 0.3])
    cones = [ZeroConeT(2)]
    return P, q, A, b, cones
