"""Data-parallel sharded batch solving over a device mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from clarabel_tpu import NonnegativeConeT, SecondOrderConeT, Settings, SolverStatus
from clarabel_tpu.parallel.batch_impl import BatchSolver

from test_batch import make_random_socp


def test_dp_sharded_batch_matches_unsharded():
    rng = np.random.default_rng(11)
    B, n = 16, 5
    cones = [NonnegativeConeT(n), SecondOrderConeT(n + 1)]
    probs = [make_random_socp(rng, n) for _ in range(B)]
    P = np.stack([p[0] for p in probs])
    q = np.stack([p[1] for p in probs])
    A = np.stack([p[2] for p in probs])
    b = np.stack([p[3] for p in probs])

    out_ref = BatchSolver(cones, n).solve(P, q, A, b)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
    out_dp = BatchSolver(cones, n, mesh=mesh).solve(P, q, A, b)

    assert np.array_equal(out_dp.status, out_ref.status)
    assert np.allclose(out_dp.x, out_ref.x, atol=1e-9)
    assert np.allclose(out_dp.obj_val, out_ref.obj_val, atol=1e-9)
