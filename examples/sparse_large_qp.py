"""Large sparse structured QP through the sparse data mode."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import clarabel_tpu as ct
from benchmarks.configs import large_banded_qp_sparse

P, q, A, b, cones = large_banded_qp_sparse(grid=1000)   # N = 7000
solver = ct.Solver(P, q, A, b, cones)
print("sparse mode:", solver._sparse_mode,
      "| block-arrow plan:", solver.linear_solver_info())
sol = solver.solve()
print(sol)
