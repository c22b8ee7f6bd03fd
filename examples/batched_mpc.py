"""Batched scenario solving: thousands of small SOCPs in one device call."""

import numpy as np
import clarabel_tpu as ct

rng = np.random.default_rng(0)
B, n = 512, 6
cones = [ct.NonnegativeConeT(n), ct.SecondOrderConeT(n + 1)]

Ps, qs, As, bs = [], [], [], []
for _ in range(B):
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    Ps.append(F @ F.T + 0.5 * np.eye(n))
    qs.append(rng.standard_normal(n))
    As.append(np.vstack([np.eye(n), np.zeros((1, n)), -np.eye(n)]))
    bs.append(np.concatenate([rng.uniform(0.5, 1.5, n),
                              [rng.uniform(1.0, 2.0)], np.zeros(n)]))

bsolver = ct.BatchSolver(cones, n)
out = bsolver.solve(np.stack(Ps), np.stack(qs), np.stack(As), np.stack(bs))
print(f"solved {np.sum(out.status == 1)}/{B} scenarios, "
      f"mean iterations {out.iterations.mean():.1f}, "
      f"worst residual {out.r_prim.max():.1e}")
