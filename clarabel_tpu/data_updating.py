"""In-place problem data updating for warm re-solves.

Mirrors the reference's `update_data!/update_P!/update_q!/update_A!/update_b!`
API (reference: src/data_updating.jl:26-147) with the same guard rails:
updates are disallowed while the presolver or chordal decomposition is
active (reference: src/data_updating.jl:149-167).

Deviations from the reference, by design:
* the internal representation is dense, so matrix updates take a full
  matrix or (rows, cols, values) triplets instead of CSC nzval vectors;
* equilibration is recomputed in-graph on the next solve (the reference
  re-applies frozen scalings to the new values, src/data_updating.jl:169-247;
  recomputing is numerically at least as good and costs a few fused
  device passes);
* the compiled solve function is structure-cached, so a warm re-solve
  never re-compiles or re-runs symbolic setup.
"""

from typing import Optional, Tuple, Union

import numpy as np


def _check_update_allowed(solver):
    """reference: src/data_updating.jl:149-158"""
    if solver.presolver is not None:
        raise ValueError("Data updates not allowed if presolver is active.")
    if getattr(solver, "chordal_info", None) is not None:
        raise ValueError(
            "Data updates not allowed if chordal decomposition is active."
        )
    if getattr(solver, "_sparse_mode", False):
        raise ValueError(
            "Data updates not supported in sparse data mode yet."
        )


def update_P(solver, data) -> None:
    """Overwrite P. `data` may be an (n, n) matrix (triu used), a
    (rows, cols, values) triplet tuple, or None."""
    if data is None:
        return
    _check_update_allowed(solver)
    from .api import _symmetrize_triu, _to_dense

    if isinstance(data, tuple) and len(data) == 3:
        rows, cols, vals = data
        P = np.triu(solver._P_full).copy()
        for i, j, v in zip(rows, cols, vals):
            if i > j:
                raise ValueError("P updates must index the upper triangle")
            P[i, j] = v
        solver._P_full = _symmetrize_triu(P)
    else:
        M = _to_dense(data).astype(np.float64)
        if M.shape != (solver.n, solver.n):
            raise ValueError("Input must match dimension of original data.")
        solver._P_full = _symmetrize_triu(M)


def update_q(solver, data) -> None:
    if data is None:
        return
    _check_update_allowed(solver)
    if isinstance(data, tuple) and len(data) == 2:
        idx, vals = data
        q = solver._q.copy()
        q[np.asarray(idx)] = vals
        solver._q = q
    else:
        v = np.asarray(data, dtype=np.float64).ravel()
        if v.shape[0] == 0:
            return
        if v.shape[0] != solver.n:
            raise ValueError("Input must match length of original data.")
        solver._q = v.copy()


def update_A(solver, data) -> None:
    if data is None:
        return
    _check_update_allowed(solver)
    from .api import _to_dense

    if isinstance(data, tuple) and len(data) == 3:
        rows, cols, vals = data
        A = solver._A.copy()
        A[np.asarray(rows), np.asarray(cols)] = vals
        solver._A = A
    else:
        M = _to_dense(data).astype(np.float64)
        if M.shape != (solver.m, solver.n):
            raise ValueError("Input must match dimension of original data.")
        solver._A = M.copy()


def update_b(solver, data) -> None:
    if data is None:
        return
    _check_update_allowed(solver)
    if isinstance(data, tuple) and len(data) == 2:
        idx, vals = data
        b = solver._b.copy()
        b[np.asarray(idx)] = vals
        solver._b = b
    else:
        v = np.asarray(data, dtype=np.float64).ravel()
        if v.shape[0] == 0:
            return
        if v.shape[0] != solver.m:
            raise ValueError("Input must match length of original data.")
        solver._b = v.copy()


def update_data(solver, P=None, q=None, A=None, b=None) -> None:
    """reference: src/data_updating.jl:26-40"""
    update_P(solver, P)
    update_q(solver, q)
    update_A(solver, A)
    update_b(solver, b)
