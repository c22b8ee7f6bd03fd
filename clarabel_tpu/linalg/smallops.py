"""Small-contraction linear algebra that avoids TPU's f64 dot_general.

XLA lowers float64 `dot_general` on TPU to an emulation path with a large
fixed cost (~3.6 ms per call on v5e regardless of how tiny the operands
are), while float64 *elementwise* ops run near full VPU throughput.  For
the contraction sizes that dominate this solver's hot loops (cone dims,
small-instance KKT systems, refinement matvecs — K of order 10), writing
the contraction as an unrolled sum of broadcasts is 40-70x faster and is
exactly what a vmapped batch needs: every term stays an elementwise op
over the batch lanes.

Every helper here takes single-instance shapes and is vmap-safe (pure
indexing + broadcasting + adds).  All of them fall back to the native
XLA op when the contraction dimension exceeds `UNROLL_MAX_K` or the dtype
is not float64 (f32/bf16 dots use the MXU and are already fast).

Measured on TPU v5e (batch 4096 in the minor axis, f64):
  einsum ijb,jkb->ikb (6x6)      3643 us        <- dot_general
  unrolled sum over j (6 terms)    83 us        <- this module
"""

import math
import operator
from functools import reduce

import jax.numpy as jnp

UNROLL_MAX_K = 64


def _unroll(K: int, *arrs) -> bool:
    """Static trace-time decision: unroll iff f64 and small contraction."""
    return K <= UNROLL_MAX_K and all(a.dtype == jnp.float64 for a in arrs)


def vdot(x, y):
    """xᵀy as an elementwise multiply + reduce (never dot_general)."""
    return jnp.sum(x * y)


def mv(A, x):
    """A @ x for A: (m, K), x: (K,) or (K, r)."""
    K = A.shape[1]
    if K == 0:
        shape = (A.shape[0],) if x.ndim == 1 else (A.shape[0], x.shape[1])
        return jnp.zeros(shape, A.dtype)
    if not _unroll(K, A, x):
        return A @ x
    if x.ndim == 1:
        terms = [A[:, j] * x[j] for j in range(K)]
    else:
        terms = [A[:, j, None] * x[j, :] for j in range(K)]
    return reduce(operator.add, terms)


def rmv(A, x):
    """Aᵀ @ x for A: (K, n), x: (K,) or (K, r)."""
    K = A.shape[0]
    if K == 0:
        shape = (A.shape[1],) if x.ndim == 1 else (A.shape[1], x.shape[1])
        return jnp.zeros(shape, A.dtype)
    if not _unroll(K, A, x):
        return A.T @ x
    if x.ndim == 1:
        terms = [A[j, :] * x[j] for j in range(K)]
    else:
        terms = [A[j, :, None] * x[j, :] for j in range(K)]
    return reduce(operator.add, terms)


def mm(A, B):
    """A @ B for A: (m, K), B: (K, n)."""
    K = A.shape[1]
    if K == 0:
        return jnp.zeros((A.shape[0], B.shape[1]), A.dtype)
    if not _unroll(K, A, B):
        return A @ B
    terms = [A[:, j, None] * B[j, None, :] for j in range(K)]
    return reduce(operator.add, terms)


def chol3_solve(H, B):
    """Batched 3×3 SPD solve via unrolled Cholesky + substitution —
    elementwise only (TPU's LuDecomposition expander has no f64 path, and
    `jnp.linalg.solve` would hit it).  Mirrors the reference's explicit
    3×3 Cholesky (reference: src/utils/mathutils.jl:427-466).

    H: (..., 3, 3) symmetric positive definite; B: (..., 3) or (..., 3, k).
    """
    vec_in = B.ndim == H.ndim - 1
    if vec_in:
        B = B[..., None]
    l11 = jnp.sqrt(H[..., 0, 0])
    l21 = H[..., 1, 0] / l11
    l31 = H[..., 2, 0] / l11
    l22 = jnp.sqrt(H[..., 1, 1] - l21 * l21)
    l32 = (H[..., 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(H[..., 2, 2] - l31 * l31 - l32 * l32)

    l11 = l11[..., None]
    l21 = l21[..., None]
    l31 = l31[..., None]
    l22 = l22[..., None]
    l32 = l32[..., None]
    l33 = l33[..., None]
    # forward: L y = B
    y1 = B[..., 0, :] / l11
    y2 = (B[..., 1, :] - l21 * y1) / l22
    y3 = (B[..., 2, :] - l31 * y1 - l32 * y2) / l33
    # back: Lᵀ x = y
    x3 = y3 / l33
    x2 = (y2 - l32 * x3) / l22
    x1 = (y1 - l21 * x2 - l31 * x3) / l11
    X = jnp.stack([x1, x2, x3], axis=-2)
    return X[..., 0] if vec_in else X


def chol_small(S, max_n: int = 32):
    """Cholesky of a small SPD matrix by unrolled rank-1 (outer-product)
    elimination — no dot_general, no `jnp.linalg.cholesky` lowering.

    Returns L with S = L Lᵀ; NaNs propagate on indefinite input exactly
    like the native op (callers check finiteness).  Falls back to the
    native op above `max_n` or off f64.
    """
    n = S.shape[0]
    if n > max_n or S.dtype != jnp.float64:
        return jnp.linalg.cholesky(S)
    idx = jnp.arange(n)
    M = S
    cols = []
    for j in range(n):
        d = jnp.sqrt(M[j, j])
        col = jnp.where(idx >= j, M[:, j] / d, 0.0)
        cols.append(col)
        M = M - col[:, None] * col[None, :]
    return jnp.stack(cols, axis=1)


def chol_blocked_unrolled(S, nb: int = 128):
    """Blocked right-looking Cholesky with trace-time-unrolled panels —
    NO `jnp.linalg.cholesky` and no `lax.while_loop` anywhere.

    Why: XLA's cholesky lowering keeps its internal column loops as
    HLO `while` ops when it sits inside an outer `lax.while_loop` (the
    IPM loop); each of the ~n inner trips then pays per-trip sequencing
    overhead — measured 32 ms per n=502 f64 factorization inside the
    loop vs 0.09 ms standalone (where XLA unrolls it).  Unrolling the
    panel elimination at trace time gives the compiler straight-line
    code: ~n fused rank-1 ops (~6 µs each in-loop) plus one trailing
    f64 matmul per panel.

    Panels are (n−k0)×nb; the trailing Schur update S22 −= L21·L21ᵀ is a
    single matmul riding the emulated-f64 dot path (fast: ~1 ms for
    502³).  NaNs propagate on indefinite input exactly like the native
    op.  Works for any dtype; vmap-safe (pure indexing/broadcast ops).
    """
    n = S.shape[-1]
    L = jnp.zeros_like(S)
    for k0 in range(0, n, nb):
        k1 = min(k0 + nb, n)
        w = k1 - k0
        panel = S[..., k0:, k0:k1]              # (..., n-k0, w)
        cols = []
        for j in range(w):
            d = jnp.sqrt(panel[..., j, j])
            col = panel[..., :, j] / d[..., None]
            col = col.at[..., :j].set(0.0)
            panel = panel - col[..., :, None] * col[..., None, :w]
            cols.append(col)
        Lpan = jnp.stack(cols, axis=-1)         # (..., n-k0, w)
        L = L.at[..., k0:, k0:k1].set(Lpan)
        if k1 < n:
            L21 = Lpan[..., w:, :]
            S = S.at[..., k1:, k1:].add(
                -L21 @ jnp.swapaxes(L21, -1, -2)
            )
    return L


def solve_lower_small(L, b):
    """Forward substitution L x = b, unrolled (backward stable, unlike an
    explicit inverse).  b: (n,) or (n, r).  Caller gates size/dtype."""
    n = L.shape[0]
    xs = []
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = acc - L[i, j] * xs[j]
        xs.append(acc / L[i, i])
    return jnp.stack(xs, axis=0)


def solve_upper_from_lower_small(L, b):
    """Back substitution Lᵀ x = b with L lower triangular, unrolled."""
    n = L.shape[0]
    xs = [None] * n
    for i in reversed(range(n)):
        acc = b[i]
        for j in range(i + 1, n):
            acc = acc - L[j, i] * xs[j]
        xs[i] = acc / L[i, i]
    return jnp.stack(xs, axis=0)


def solve_lower_corrected(L, Linv, b):
    """L x = b via the explicit inverse plus one residual-correction pass:
    x ≈ Linv b; x += Linv (b − L x).  The correction recovers the backward
    stability an explicit-inverse apply loses, at the cost of two extra
    unrolled matvecs — still far cheaper than a triangular-solve lowering."""
    x = mv(Linv, b)
    r = b - mv(L, x)
    return x + mv(Linv, r)


def solve_upper_from_lower_corrected(L, Linv, b):
    """Lᵀ x = b via Linvᵀ with one residual correction."""
    x = rmv(Linv, b)
    r = b - rmv(L, x)
    return x + rmv(Linv, r)


def inv_lower_small(L):
    """Explicit inverse of a (general, nonsingular-diagonal) lower
    triangular matrix via the nilpotent Neumann product identity, with
    the log-depth matmuls unrolled through `mm`.

    L = Lu·D with Lu unit lower (columns scaled by d); then
    Lu⁻¹ = Π_j (I + N^(2^j)) with N = I − Lu, and L⁻¹ = D⁻¹·Lu⁻¹.
    """
    n = L.shape[-1]
    d = jnp.diagonal(L)
    Lu = L / d[None, :]
    N = jnp.eye(n, dtype=L.dtype) - Lu
    inv = jnp.eye(n, dtype=L.dtype) + N
    power = N
    steps = max(0, math.ceil(math.log2(n)) - 1) if n > 1 else 0
    for _ in range(steps):
        power = mm(power, power)
        inv = inv + mm(inv, power)
    return inv / d[:, None]
