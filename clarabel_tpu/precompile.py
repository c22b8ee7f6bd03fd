"""Warm the jit cache with tiny representative workloads.

Counterpart of the reference's SnoopPrecompile workload set
(reference: src/precompile.jl:49-75): solving one tiny problem per cone
family populates the structure-keyed compile cache so later user solves
with matching structure skip tracing.

Note: on the TPU backend each structure costs a full XLA compile, so this
is opt-in (call `clarabel_tpu.precompile.warmup()`), not import-time.
"""

import numpy as np


def warmup(settings=None, families=("lp", "qp", "socp", "sdp", "exp", "pow")):
    """Compile-and-solve a tiny instance per requested problem family."""
    from . import (
        Solver, Settings, ZeroConeT, NonnegativeConeT, SecondOrderConeT,
        PSDTriangleConeT, ExponentialConeT, PowerConeT,
    )

    settings = settings or Settings()
    results = {}

    if "lp" in families:
        results["lp"] = Solver(
            np.zeros((2, 2)), np.array([1.0, 1.0]),
            -np.eye(2), np.zeros(2), [NonnegativeConeT(2)], settings,
        ).solve().status
    if "qp" in families:
        results["qp"] = Solver(
            np.eye(2), np.array([-1.0, 1.0]),
            np.vstack([np.ones((1, 2)), -np.eye(2)]),
            np.array([1.0, 0.0, 0.0]),
            [ZeroConeT(1), NonnegativeConeT(2)], settings,
        ).solve().status
    if "socp" in families:
        results["socp"] = Solver(
            np.eye(2), np.zeros(2),
            -np.vstack([np.zeros((1, 2)), np.eye(2)]),
            np.array([1.0, 0.0, 0.0]),
            [SecondOrderConeT(3)], settings,
        ).solve().status
    if "sdp" in families:
        results["sdp"] = Solver(
            np.eye(3), np.zeros(3), np.eye(3),
            np.array([1.0, 0.0, 1.0]), [PSDTriangleConeT(2)], settings,
        ).solve().status
    if "exp" in families:
        A = np.zeros((3, 2))
        A[0, 0] = -1.0
        A[1, 1] = -1.0
        results["exp"] = Solver(
            np.eye(2) * 0.1, np.array([1.0, -1.0]), A,
            np.array([0.0, 0.0, 1.0]), [ExponentialConeT()], settings,
        ).solve().status
    if "pow" in families:
        A = -np.vstack([np.eye(2), np.zeros((1, 2))])
        results["pow"] = Solver(
            np.eye(2) * 0.1, np.array([0.0, -1.0]), A,
            np.array([1.0, 1.0, 0.0]), [PowerConeT(0.5)], settings,
        ).solve().status
    return results
