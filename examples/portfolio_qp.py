"""Markowitz portfolio optimization.

    min  ½ x'Σx − γ μ'x    s.t.  1'x = 1,  x ≥ 0
"""

import numpy as np
import clarabel_tpu as ct

rng = np.random.default_rng(0)
n = 50
F = rng.standard_normal((n, n // 5))
Sigma = F @ F.T / n + 0.01 * np.eye(n)
mu = rng.uniform(0.0, 0.12, n)

pb = (
    ct.modeling.ProblemBuilder(n)
    .minimize(P=Sigma, q=-mu)
    .add_equality(np.ones((1, n)), [1.0])
    .add_bound_box(lb=0.0)
)
sol = pb.solve(ct.Settings(verbose=True))
print("\nweights (top 5):", np.sort(sol.x)[-5:][::-1])
