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
    # identity built from FULL-SHAPE 3D iotas: a 2D mask broadcast along
    # the lane axis fails Mosaic relayout, and a weak-f64 constant (x64
    # mode) fails its bitwidth<=32 layout check
    i0 = jax.lax.broadcasted_iota(jnp.int32, K.shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    M = jnp.where(i0 == i1, jnp.ones_like(K),
                  jnp.zeros_like(K))                            # -> L^{-1}

    d_cols = []
    for j in range(n):
        pivot = K[j, j, :]             # (BL,)
        if dynamic_enable:
            sj = signs_ref[j, 0]
            pivot = jnp.where(sj * pivot < dyn_eps, sj * dyn_delta, pivot)
        d_cols.append(pivot)
        # typed constants only: bare python literals trace as weak f64
        # under x64 and Mosaic rejects 64-bit values
        pivot_safe = jnp.where(pivot != 0, pivot, jnp.ones_like(pivot))
        # masked column of L: rows strictly below the pivot
        below = (rows > j)                                      # (n, 1)
        colv = K[:, j, :] / pivot_safe[None, :]
        col = jnp.where(below, colv, jnp.zeros_like(colv))
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
    # trace the kernel with x64 DISABLED: under x64 the BlockSpec index
    # maps trace their integer results as i64, which Mosaic cannot
    # legalize ("failed to legalize operation 'func.return'").  All
    # kernel arrays are explicitly f32, so the scope changes nothing else.
    with jax.enable_x64(False):
        linv_t, d_t = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # signs, whole
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


_FACTOR_INVERSE_CACHE = {}


def make_factor_inverse(signs, dyn_eps, dyn_delta, dynamic_enable,
                        interpret=False):
    """Returns factor_inverse(K) -> (Linv, d, ok) for a SINGLE (n, n) K,
    implemented as a JAX primitive whose BATCHING RULE routes to the
    lane-batched Pallas kernel: under `jax.vmap` (the batched solver) the
    whole batch hits one fused kernel, while unbatched calls lower to the
    plain JAX factorization.

    A primitive (not jax.custom_batching.custom_vmap) because custom_vmap
    fails with `consts_batched` assertions when the call sits inside a
    `lax.cond` branch under vmap — exactly where the IPM loop puts its
    status-gated factorizations."""
    from .ldl import ldl_factor, invert_unit_lower

    signs = np.asarray(signs, np.float64)
    key = (signs.tobytes(), len(signs), float(dyn_eps), float(dyn_delta),
           bool(dynamic_enable), bool(interpret))
    if key in _FACTOR_INVERSE_CACHE:
        return _FACTOR_INVERSE_CACHE[key]

    from jax import core as jcore
    from jax.interpreters import batching, mlir

    try:
        Primitive = jcore.Primitive
    except AttributeError:  # newer jax
        from jax.extend.core import Primitive

    prim = Primitive(f"clarabel_ldl_inv_{len(_FACTOR_INVERSE_CACHE)}")
    prim.multiple_results = True

    def _single(K):
        L, d, ok = ldl_factor(
            K, jnp.asarray(signs, K.dtype), dyn_eps, dyn_delta,
            dynamic_enable,
        )
        return invert_unit_lower(L), d, ok

    def _abstract(Kav):
        n = Kav.shape[-1]
        lead = Kav.shape[:-2]
        return (
            jcore.ShapedArray(Kav.shape, Kav.dtype),
            jcore.ShapedArray(lead + (n,), Kav.dtype),
            jcore.ShapedArray(lead, jnp.bool_),
        )

    prim.def_abstract_eval(_abstract)
    prim.def_impl(lambda K: tuple(_single(K)))
    mlir.register_lowering(
        prim, mlir.lower_fun(_single, multiple_results=True)
    )

    def _batch_rule(args, dims):
        (K,) = args
        (bd,) = dims
        K = jnp.moveaxis(K, bd, 0)
        lead = K.shape[:-2]
        n = K.shape[-1]
        Kf = K.reshape((-1, n, n))  # collapse nested batch axes
        B = Kf.shape[0]
        pad = (-B) % LANE_BATCH
        if pad:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype),
                                   (pad, n, n))
            Kf = jnp.concatenate([Kf, eye], axis=0)
        Linv, d, ok = batched_ldl_inverse(
            Kf, jnp.asarray(signs, K.dtype), dyn_eps=dyn_eps,
            dyn_delta=dyn_delta, dynamic_enable=dynamic_enable,
            interpret=interpret,
        )
        out = (
            Linv[:B].reshape(lead + (n, n)),
            d[:B].reshape(lead + (n,)),
            ok[:B].reshape(lead),
        )
        return out, (0, 0, 0)

    batching.primitive_batchers[prim] = _batch_rule

    def factor_inverse(K):
        return tuple(prim.bind(K))

    _FACTOR_INVERSE_CACHE[key] = factor_inverse
    return factor_inverse
