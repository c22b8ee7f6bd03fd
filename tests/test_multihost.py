"""Multi-host mesh construction + 2-D (dp, tp) mesh placement.

Runs on the virtual 8-device CPU mesh; on real hardware the same helpers
lay dp across DCN and keep tp on ICI (parallel/multihost.py)."""

import numpy as np

import jax

from clarabel_tpu import NonnegativeConeT, SecondOrderConeT, SolverStatus
from clarabel_tpu.parallel.batch_impl import BatchSolver
from clarabel_tpu.parallel.multihost import (
    initialize_distributed, make_solver_mesh, mesh_placement_report,
)

from test_batch import make_random_socp


def test_initialize_distributed_noop_single_process():
    # no coordinator configured -> clean no-op
    assert initialize_distributed() is False


def test_make_solver_mesh_shapes():
    mesh = make_solver_mesh(dp=4, tp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (4, 2)
    mesh1 = make_solver_mesh(tp=1)
    assert mesh1.devices.shape == (len(jax.devices()), 1)
    report = mesh_placement_report(mesh)
    assert "dp" in report and "tp" in report

    import pytest

    with pytest.raises(ValueError):
        make_solver_mesh(dp=16, tp=2)


def test_dp_axis_of_2d_mesh_shards_batch():
    """BatchSolver over the dp axis of a (dp, tp) mesh: results must match
    the unsharded solver exactly (tp axis replicates)."""
    rng = np.random.default_rng(5)
    B, n = 8, 5
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    probs = [make_random_socp(rng, n) for _ in range(B)]
    P = np.stack([p[0] for p in probs])
    q = np.stack([p[1] for p in probs])
    A = np.stack([p[2] for p in probs])
    b = np.stack([p[3] for p in probs])

    out_ref = BatchSolver(cones, n).solve(P, q, A, b)

    mesh = make_solver_mesh(dp=4, tp=2)
    out_dp = BatchSolver(cones, n, mesh=mesh).solve(P, q, A, b)

    assert np.array_equal(out_dp.status, out_ref.status)
    assert np.all(out_dp.status == int(SolverStatus.SOLVED))
    assert np.allclose(out_dp.x, out_ref.x, atol=1e-9)
