"""Batched instance solving: vmap the entire IPM over problem batches.

The reference has no analogue — its only parallelism is a threaded Pardiso
factorization (reference: src/settings.jl:108-110).  On TPU, thousands of
same-structure instances are solved simultaneously by vmapping the whole
IPM loop; per-instance convergence lives in each instance's own carry
(`status`), and `lax.while_loop` over the batch runs until every instance
terminates (converged instances no-op via their status gates).
"""

from typing import Optional, Sequence

import numpy as np

from .batch_impl import BatchSolver  # re-export
