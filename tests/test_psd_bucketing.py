"""PSD clique-size bucketing: cones of mixed sides padded into a few
bucket groups (pad blocks pinned to the identity) must give identical
solutions to exact-shape groups.

This is the PSD analogue of SOC dim bucketing, built for the
chordal-decomposition output whose dozens of distinct clique sizes
otherwise each dispatch their own gather/chol/eig/scatter chain per IPM
iteration (the measured bottleneck on the max-cut nv=500 BASELINE
config — docs/PERF.md).  Reference role: the composite cone iterates
heterogeneous PSD cones directly (coneops_compositecone.jl); grouping
is a TPU-side batching concern with no reference counterpart.
"""

import numpy as np

from clarabel_tpu import (
    NonnegativeConeT, PSDTriangleConeT, Settings, SolverStatus, ZeroConeT,
)
from clarabel_tpu.cones.layout import ConeLayout, _psd_buckets
from clarabel_tpu.ipm.loop import build_solve


def _tri(k):
    return k * (k + 1) // 2


def hetero_sdp(rng, sides=(2, 3, 4, 5, 6)):
    """min q'x + ½||x||² s.t. svec blocks C_i - B_i x ∈ PSD(side_i)."""
    n = 6
    q = rng.standard_normal(n)
    P = np.eye(n)
    rows, bs, cones = [], [], []
    for k in sides:
        t = _tri(k)
        Bm = rng.standard_normal((t, n)) * 0.2
        rows.append(Bm)
        # b = svec of a well-conditioned SPD matrix => strictly feasible
        M = rng.standard_normal((k, k)) * 0.3
        S = M @ M.T + np.eye(k) * (2.0 + rng.uniform())
        sv = []
        for col in range(k):
            for row in range(col + 1):
                v = S[row, col]
                sv.append(v if row == col else v * np.sqrt(2.0))
        bs.append(np.asarray(sv))
        cones.append(PSDTriangleConeT(k))
    A = np.vstack(rows)
    b = np.concatenate(bs)
    return P, q, A, b, cones


def _solve_with_layout(layout, P, q, A, b, settings=None):
    import jax

    fn = jax.jit(build_solve(layout, settings or Settings(), P.shape[0],
                             p_nonzero=True))
    out = fn(P, q, A, b)
    return {k: np.asarray(v) for k, v in out.items()}


def test_bucket_partition():
    by_n = {k: [None] * c for k, c in
            {2: 8, 3: 5, 4: 2, 5: 1, 7: 3, 9: 1, 12: 1}.items()}
    buckets = _psd_buckets(by_n)
    assert len(buckets) <= 4
    covered = sorted(s for sizes in buckets.values() for s in sizes)
    assert covered == sorted(by_n)
    for bside, sizes in buckets.items():
        assert bside == max(sizes)


def test_bucketed_matches_exact():
    rng = np.random.default_rng(0)
    P, q, A, b, cones = hetero_sdp(rng)

    exact = ConeLayout(cones, psd_bucketing=False)
    bucketed = ConeLayout(cones, psd_bucketing=True)
    assert sum(g.kind == "psd" for g in exact.groups.values()) == 5
    assert sum(g.kind == "psd" for g in bucketed.groups.values()) <= 4
    assert any(g.true_dims is not None for g in bucketed.groups.values())
    assert exact.key != bucketed.key  # distinct compiled programs

    out_e = _solve_with_layout(exact, P, q, A, b)
    out_b = _solve_with_layout(bucketed, P, q, A, b)
    assert int(out_e["status"]) == int(SolverStatus.SOLVED)
    assert int(out_b["status"]) == int(SolverStatus.SOLVED)
    assert np.allclose(out_e["x"], out_b["x"], atol=1e-8)
    assert abs(out_e["obj_val"] - out_b["obj_val"]) < 1e-8
    # iteration counts may differ slightly: padded cones run their eigs
    # at the bucket size, a different algorithm (e.g. LAPACK vs the
    # closed-form n<=3 path) whose roundoff perturbs the step lengths;
    # the per-op agreement is ~1e-11 (same class as SOC bucketing)


def test_bucketed_mixed_with_other_cones():
    rng = np.random.default_rng(3)
    P, q, A, b, cones = hetero_sdp(rng, sides=(2, 2, 3, 5))
    n = P.shape[0]
    # append an equality row and a nonnegativity block
    A = np.vstack([np.ones((1, n)), A, np.eye(n)])
    b = np.concatenate([[1.0], b, np.full(n, 5.0)])
    cones = [ZeroConeT(1)] + cones + [NonnegativeConeT(n)]

    out_e = _solve_with_layout(ConeLayout(cones, psd_bucketing=False),
                               P, q, A, b)
    out_b = _solve_with_layout(ConeLayout(cones, psd_bucketing=True),
                               P, q, A, b)
    assert int(out_e["status"]) == int(SolverStatus.SOLVED)
    assert int(out_b["status"]) == int(SolverStatus.SOLVED)
    assert np.allclose(out_e["x"], out_b["x"], atol=1e-8)


def test_bucketed_condensed_backend():
    rng = np.random.default_rng(1)
    P, q, A, b, cones = hetero_sdp(rng, sides=(2, 3, 3, 4))
    layout = ConeLayout(cones, psd_bucketing=True)
    out = _solve_with_layout(layout, P, q, A, b,
                             Settings(kkt_backend="condensed"))
    assert int(out["status"]) == int(SolverStatus.SOLVED)
    assert float(out["r_prim"]) < 1e-8


def test_auto_threshold():
    """Bucketing turns on automatically above 4 distinct sides."""
    few = [PSDTriangleConeT(k) for k in (2, 3, 4)]
    many = [PSDTriangleConeT(k) for k in (2, 3, 4, 5, 6, 7)]
    assert all(g.true_dims is None
               for g in ConeLayout(few).groups.values())
    lay = ConeLayout(many)
    assert sum(g.kind == "psd" for g in lay.groups.values()) <= 4
