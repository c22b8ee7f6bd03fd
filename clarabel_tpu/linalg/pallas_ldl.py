"""Pallas TPU kernel: fused batched LDLᵀ factorization + unit-L inversion.

The batched-IPM hot spot is factoring thousands of small KKT matrices per
iteration.  The JAX fori_loop version launches N sequential batched
matvecs through HBM; this kernel instead:

* lays the batch on the minor (lane) dimension — operands are (N, N, BL)
  blocks with BL = 128 instances riding the VPU lanes, so every scalar
  operation of the elimination is a full-width vector op;
* runs the entire factorization *and* the unit-lower inverse accumulation
  in VMEM with the column loop fully unrolled (N is small and static);
* applies QDLDL-style per-pivot dynamic regularization in-register.

Output is (L⁻¹, d) so downstream KKT solves are two matmuls + a diagonal
scale (see linalg.ldl.ldl_solve_via_inverse).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BATCH = 128


def _ldl_inv_kernel(signs_ref, k_ref, linv_ref, d_ref, *, n, dyn_eps,
                    dyn_delta, dynamic_enable):
    """One program handles LANE_BATCH instances: refs are
    k_ref (n, n, BL), linv_ref (n, n, BL), d_ref (n, BL).

    All updates are full-shape masked tensor ops (no indexed scatters —
    those do not lower on TPU); the mask arithmetic guarantees only the
    trailing submatrix changes at each elimination step."""
    K = k_ref[:]                       # (n, n, BL)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)       # (n, 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1))
    M = jnp.where(eye[:, :, None], 1.0, 0.0).astype(K.dtype)    # -> L^{-1}

    d_cols = []
    for j in range(n):
        pivot = K[j, j, :]             # (BL,)
        if dynamic_enable:
            sj = signs_ref[j, 0]
            pivot = jnp.where(sj * pivot < dyn_eps, sj * dyn_delta, pivot)
        d_cols.append(pivot)
        pivot_safe = jnp.where(pivot != 0, pivot, 1.0)
        # masked column of L: rows strictly below the pivot
        below = (rows > j)                                      # (n, 1)
        col = jnp.where(below, K[:, j, :] / pivot_safe[None, :], 0.0)
        # trailing update: outer product of the masked column only
        # touches entries (i > j, k > j); row/column j stay intact
        K = K - col[:, None, :] * (pivot_safe[None, :] * col)[None, :, :]
        # inverse accumulation: M[i,:] -= col[i] * M[j,:]  for i > j
        M = M - col[:, None, :] * M[j][None, :, :]

    linv_ref[:] = M
    d_ref[:] = jnp.stack(d_cols, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("dyn_eps", "dyn_delta", "dynamic_enable", "interpret"),
)
def batched_ldl_inverse(K, signs, dyn_eps=1e-13, dyn_delta=2e-7,
                        dynamic_enable=True, interpret=False):
    """Batched LDL + L⁻¹ for K of shape (B, n, n).

    Returns (Linv, d, ok): Linv (B, n, n), d (B, n).
    B must be a multiple of LANE_BATCH (callers pad).
    """
    B, n, _ = K.shape
    assert B % LANE_BATCH == 0
    nb = B // LANE_BATCH
    dtype = K.dtype

    # batch-minor layout: (n, n, B)
    Kt = jnp.transpose(K, (1, 2, 0))

    kernel = functools.partial(
        _ldl_inv_kernel, n=n, dyn_eps=dyn_eps, dyn_delta=dyn_delta,
        dynamic_enable=dynamic_enable,
    )
    linv_t, d_t = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # signs, whole array
            pl.BlockSpec((n, n, LANE_BATCH), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, n, LANE_BATCH), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE_BATCH), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, B), dtype),
            jax.ShapeDtypeStruct((n, B), dtype),
        ],
        interpret=interpret,
    )(signs.astype(dtype).reshape(n, 1), Kt)

    Linv = jnp.transpose(linv_t, (2, 0, 1))
    d = jnp.transpose(d_t, (1, 0))
    ok = jnp.logical_and(
        jnp.all(jnp.isfinite(d), axis=-1), jnp.all(d != 0, axis=-1)
    )
    return Linv, d, ok


def make_factor_inverse(signs, dyn_eps, dyn_delta, dynamic_enable,
                        interpret=False):
    """Returns factor_inverse(K) -> (Linv, d, ok) for a SINGLE (n, n) K,
    with a custom vmap rule that routes batched calls to the lane-batched
    Pallas kernel.  Under `jax.vmap` (the batched solver) the whole batch
    hits one fused kernel; unbatched calls use the plain JAX path."""
    from .ldl import ldl_factor, invert_unit_lower

    signs = np.asarray(signs)

    @jax.custom_batching.custom_vmap
    def factor_inverse(K):
        L, d, ok = ldl_factor(
            K, jnp.asarray(signs, K.dtype), dyn_eps, dyn_delta,
            dynamic_enable,
        )
        return invert_unit_lower(L), d, ok

    @factor_inverse.def_vmap
    def _batched_rule(axis_size, in_batched, K):
        (k_batched,) = in_batched
        assert k_batched
        B = K.shape[0]
        pad = (-B) % LANE_BATCH
        if pad:
            eye = jnp.broadcast_to(
                jnp.eye(K.shape[-1], dtype=K.dtype),
                (pad, K.shape[-1], K.shape[-1]),
            )
            Kp = jnp.concatenate([K, eye], axis=0)
        else:
            Kp = K
        Linv, d, ok = batched_ldl_inverse(
            Kp, jnp.asarray(signs, K.dtype), dyn_eps=dyn_eps,
            dyn_delta=dyn_delta, dynamic_enable=dynamic_enable,
            interpret=interpret,
        )
        out = (Linv[:B], d[:B], ok[:B])
        return out, (True, True, True)

    return factor_inverse
