"""Polymorphic matrix operations: dense arrays or static-pattern COO.

The solver core is written against these helpers so the same jitted IPM
works on dense data (small/medium problems — MXU matmuls) and on sparse
data (large problems — the pattern is static, fixed at trace time, and
the values ride through segment-sum matvecs).  This mirrors the
reference's split between dense and CSC code paths, with the symbolic
structure resolved on the host (reference: src/utils/csc_assembly.jl).
"""

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class SparseCOO(NamedTuple):
    """Static-pattern COO matrix: vals traced, pattern static.

    rows/cols are int32 arrays (traced but constant), shape carried via
    the aux fields (weak static: stored as 1-element arrays is
    unnecessary — shape comes from the companion `SparseMeta`)."""
    vals: jnp.ndarray
    rows: jnp.ndarray
    cols: jnp.ndarray
    nrows_arr: jnp.ndarray  # shape marker: jnp.zeros(nrows) — static shape carrier
    ncols_arr: jnp.ndarray


def make_sparse_coo(M_scipy) -> SparseCOO:
    import scipy.sparse as sp

    M = sp.coo_matrix(M_scipy)
    return SparseCOO(
        vals=jnp.asarray(M.data, jnp.float64),
        rows=jnp.asarray(M.row, jnp.int32),
        cols=jnp.asarray(M.col, jnp.int32),
        nrows_arr=jnp.zeros((M.shape[0],), jnp.int8),
        ncols_arr=jnp.zeros((M.shape[1],), jnp.int8),
    )


def is_sparse(M) -> bool:
    return isinstance(M, SparseCOO)


def nrows(M) -> int:
    return M.nrows_arr.shape[0] if is_sparse(M) else M.shape[0]


def ncols(M) -> int:
    return M.ncols_arr.shape[0] if is_sparse(M) else M.shape[1]


def mv(M, x):
    """M @ x for x of shape (n,) or (n, k)."""
    if not is_sparse(M):
        from . import smallops as so

        return so.mv(M, x)
    m = nrows(M)
    prod = M.vals[:, None] * x[M.cols] if x.ndim == 2 else M.vals * x[M.cols]
    return jax.ops.segment_sum(prod, M.rows, num_segments=m)


def rmv(M, x):
    """Mᵀ @ x."""
    if not is_sparse(M):
        from . import smallops as so

        return so.rmv(M, x)
    n = ncols(M)
    prod = M.vals[:, None] * x[M.rows] if x.ndim == 2 else M.vals * x[M.rows]
    return jax.ops.segment_sum(prod, M.cols, num_segments=n)


def col_abs_max(M):
    if not is_sparse(M):
        return jnp.max(jnp.abs(M), axis=0, initial=0.0)
    return jnp.maximum(
        jax.ops.segment_max(jnp.abs(M.vals), M.cols, num_segments=ncols(M)),
        0.0,
    )  # empty columns: segment_max fills -inf; clamp to 0


def row_abs_max(M):
    if not is_sparse(M):
        return jnp.max(jnp.abs(M), axis=1, initial=0.0)
    return jnp.maximum(
        jax.ops.segment_max(jnp.abs(M.vals), M.rows, num_segments=nrows(M)),
        0.0,
    )


def mean_col_abs_max(M):
    return jnp.mean(col_abs_max(M))


def scale_lr(M, l, r):
    """diag(l) M diag(r); either may be None."""
    if not is_sparse(M):
        out = M
        if l is not None:
            out = l[:, None] * out
        if r is not None:
            out = out * r[None, :]
        return out
    vals = M.vals
    if l is not None:
        vals = vals * l[M.rows]
    if r is not None:
        vals = vals * r[M.cols]
    return M._replace(vals=vals)


def scalar_mul(M, c):
    if not is_sparse(M):
        return M * c
    return M._replace(vals=M.vals * c)
