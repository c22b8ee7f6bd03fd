"""Sherman–Morrison–Woodbury correction for rank-2 SOC Hs terms.

Large SOCs in sparse data mode assemble only their diagonal η²I into the
KKT (cones/ops.py: hs_flat_values with soc_rank2_min_dim); the remaining
±rank-1 terms  K = K₀ + U S U'  are applied around the factored K₀:

    K⁻¹ = K₀⁻¹ − K₀⁻¹U (S⁻¹ + U'K₀⁻¹U)⁻¹ U'K₀⁻¹

with a dense 2k×2k capacitance system (k = rank-2 SOC count) factored
once per IPM iteration.  This plays the role of the reference's sparse
SOC expansion (reference: cone_types.jl:65-117, directldl_datamaps.jl:
8-79) without changing the KKT dimension: static shapes, one batched
multi-RHS solve for K₀⁻¹U, and a small MXU-friendly dense solve per
apply.  SMW's conditional stability is restored by the iterative
refinement loop, which runs against the TRUE KKT operator (mul_Hs uses
the exact rank structure of the SOC at O(d) cost).
"""

import jax.numpy as jnp

from ..linalg.ldl import ldl_factor, ldl_solve
from ..linalg import smallops as so


def wrap_apply_smw(apply0, U, signs, settings):
    """Wrap a K₀-inverse apply with the U S U' correction.

    Returns (apply, ok): apply supports (N,) and (N, k) right-hand
    sides; ok flags a finite capacitance factorization."""
    sgn = jnp.asarray(signs, U.dtype)
    Z = apply0(U)                                   # (N, 2k)
    C = jnp.diag(1.0 / sgn) + so.mm(U.T, Z)         # S⁻¹ + U'K₀⁻¹U
    Lc, dc, okc = ldl_factor(
        C, sgn,
        dyn_eps=settings.dynamic_regularization_eps,
        dyn_delta=settings.dynamic_regularization_delta,
        dynamic_enable=settings.dynamic_regularization_enable,
    )

    def apply(rhs):
        vec_in = rhs.ndim == 1
        R = rhs[:, None] if vec_in else rhs
        y = apply0(R)                               # (N, r)
        t = so.mm(U.T, y)                           # (2k, r)
        c = ldl_solve(Lc, dc, t)
        out = y - so.mm(Z, c)
        return out[:, 0] if vec_in else out

    return apply, okc
