"""SOC dimension bucketing: padded heterogeneous groups must give
identical solutions to exact-shape groups."""

import numpy as np
import pytest

from clarabel_tpu import Settings, SolverStatus, NonnegativeConeT, SecondOrderConeT
from clarabel_tpu.cones.api import SupportedCone
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.ipm.loop import build_solve


def hetero_socp(rng, dims=(3, 5, 6, 9)):
    """min ½||x||² + q'x s.t. a stack of SOC constraints of mixed dims."""
    n = 8
    q = rng.standard_normal(n)
    P = np.eye(n)
    rows = []
    bs = []
    cones = []
    for d in dims:
        C = rng.standard_normal((d, n)) / np.sqrt(n)
        C[0] = 0.0
        rows.append(-C)
        bvec = np.zeros(d)
        bvec[0] = rng.uniform(1.0, 2.0)
        bs.append(bvec)
        cones.append(SecondOrderConeT(d))
    A = np.vstack(rows)
    b = np.concatenate(bs)
    return P, q, A, b, cones


def _solve_with_layout(layout, P, q, A, b):
    import jax

    fn = jax.jit(build_solve(layout, Settings(), P.shape[0], p_nonzero=True))
    out = fn(P, q, A, b)
    return {k: np.asarray(v) for k, v in out.items()}


def test_bucketed_matches_exact():
    rng = np.random.default_rng(0)
    P, q, A, b, cones = hetero_socp(rng)

    exact = ConeLayout(cones, soc_bucketing=False)
    bucketed = ConeLayout(cones, soc_bucketing=True)
    assert len(exact.groups) == 4
    assert len(bucketed.groups) < 4
    assert any(g.true_dims is not None for g in bucketed.groups.values())

    out_e = _solve_with_layout(exact, P, q, A, b)
    out_b = _solve_with_layout(bucketed, P, q, A, b)
    assert int(out_e["status"]) == int(SolverStatus.SOLVED)
    assert int(out_b["status"]) == int(SolverStatus.SOLVED)
    assert np.allclose(out_e["x"], out_b["x"], atol=1e-9)
    assert abs(out_e["obj_val"] - out_b["obj_val"]) < 1e-9


def test_bucketed_condensed_backend():
    rng = np.random.default_rng(1)
    P, q, A, b, cones = hetero_socp(rng, dims=(3, 4, 7))
    layout = ConeLayout(cones, soc_bucketing=True)
    import jax

    fn = jax.jit(build_solve(
        layout, Settings(kkt_backend="condensed"), P.shape[0], p_nonzero=True
    ))
    out = {k: np.asarray(v) for k, v in fn(P, q, A, b).items()}
    assert int(out["status"]) == int(SolverStatus.SOLVED)
    assert float(out["r_prim"]) < 1e-8
