"""Chunked execution: time limits and checkpoint/resume."""

import os
import tempfile

import numpy as np
import pytest

from clarabel_tpu import Solver, Settings, SolverStatus

from fixtures import basic_qp_data


def test_time_limited_solve_matches_fused():
    P, q, A, b, cones = basic_qp_data()
    sol_ref = Solver(P, q, A, b, cones).solve()
    sol_tl = Solver(P, q, A, b, cones, Settings(time_limit=600.0)).solve()
    assert sol_tl.status == SolverStatus.SOLVED
    assert np.linalg.norm(sol_tl.x - sol_ref.x) < 1e-10


def test_tiny_time_limit_reports_max_time_or_almost():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, Settings(time_limit=1e-12))
    # force minuscule chunks so the limit triggers before convergence
    import time as _time

    t0 = _time.perf_counter()
    out = s._solve_chunked(t0, chunk_iters=1)
    out = {k: np.asarray(v) for k, v in out.items()}
    status = SolverStatus(int(out["status"]))
    assert status in (
        SolverStatus.MAX_TIME,
        SolverStatus.ALMOST_SOLVED,  # if one chunk was already enough
        SolverStatus.SOLVED,
    )


def test_checkpoint_resume():
    P, q, A, b, cones = basic_qp_data()
    s = Solver(P, q, A, b, cones, Settings(time_limit=600.0))

    # run a few iterations chunked, checkpoint, then resume to optimality
    import time as _time
    import jax.numpy as jnp

    data, carry = s._prepare_fn(s._P_full, s._q, s._A, s._b)
    carry = s._chunk_fn(data, carry, jnp.asarray(3, jnp.int32))
    assert int(carry.iters) == 3
    s._last_carry = carry

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        path = f.name
    try:
        s.save_checkpoint(path)
        sol = s.resume_from_checkpoint(path)
        assert sol.status == SolverStatus.SOLVED
        ref = Solver(P, q, A, b, cones).solve()
        assert np.linalg.norm(sol.x - ref.x) < 1e-8
    finally:
        os.unlink(path)
