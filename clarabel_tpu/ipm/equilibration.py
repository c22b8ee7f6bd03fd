"""Ruiz equilibration of the problem data, fully in-graph.

Mirrors the reference's fixed-trip-count Ruiz loop over the KKT block
[P Aᵀ; A 0] with min/max scaling clips and separate cost scaling
(reference: src/problemdata.jl:133-221), followed by cone rectification
forcing scalar scaling on cones that cannot be scaled elementwise
(reference: coneops_compositecone.jl:28-47).

Dense formulation: column inf-norms become masked abs-max reductions, so
the whole procedure is ~10 fused elementwise/reduction passes on the VPU.
"""

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..cones.layout import ConeLayout
from ..cones import ops as cone_ops
from ..linalg import matops


class Equilibration(NamedTuple):
    d: jnp.ndarray      # (n,) variable scaling
    e: jnp.ndarray      # (m,) constraint scaling
    dinv: jnp.ndarray
    einv: jnp.ndarray
    c: jnp.ndarray      # () cost scaling


def ruiz_equilibrate(layout: ConeLayout, settings, P, A, q, b):
    """Equilibrate (P, A, q, b) in place; returns scaled data + scalings."""
    n = q.shape[0]
    m = b.shape[0]
    dtype = q.dtype

    d0 = jnp.ones((n,), dtype)
    e0 = jnp.ones((m,), dtype)
    c0 = jnp.asarray(1.0, dtype)

    if not settings.equilibrate_enable:
        return P, A, q, b, Equilibration(d0, e0, d0, e0, c0)

    smin = settings.equilibrate_min_scaling
    smax = settings.equilibrate_max_scaling

    def ruiz_iter(_, carry):
        P, A, q, b, d, e, c = carry
        # column inf-norms of the KKT block [P Aᵀ; A 0]
        # (reference: src/utils/mathutils.jl:129-141 kkt_col_norms!)
        dwork = jnp.maximum(matops.col_abs_max(P), matops.col_abs_max(A))
        ework = matops.row_abs_max(A)
        dwork = jnp.where(dwork == 0, 1.0, dwork)
        ework = jnp.where(ework == 0, 1.0, ework)
        dwork = 1.0 / jnp.sqrt(dwork)
        ework = 1.0 / jnp.sqrt(ework)
        # bound the cumulative scaling
        dwork = jnp.clip(dwork, smin / d, smax / d)
        ework = jnp.clip(ework, smin / e, smax / e)

        # scale data: P <- D P D, A <- E A D, q <- D q, b <- E b
        P = matops.scale_lr(P, dwork, dwork)
        A = matops.scale_lr(A, ework, dwork)
        q = q * dwork
        b = b * ework
        d = d * dwork
        e = e * ework

        # cost scaling (reference: problemdata.jl:185-201)
        mean_col_norm_P = matops.mean_col_abs_max(P)
        inf_norm_q = jnp.max(jnp.abs(q)) if n > 0 else jnp.asarray(0.0, dtype)
        do_cost = jnp.logical_and(mean_col_norm_P != 0, inf_norm_q != 0)
        scale_cost = jnp.maximum(inf_norm_q, mean_col_norm_P)
        ctmp = jnp.where(
            do_cost,
            jnp.clip(1.0 / jnp.where(scale_cost != 0, scale_cost, 1.0),
                     smin / c, smax / c),
            1.0,
        )
        P = matops.scalar_mul(P, ctmp)
        q = q * ctmp
        c = c * ctmp
        return P, A, q, b, d, e, c

    P, A, q, b, d, e, c = lax.fori_loop(
        0, settings.equilibrate_max_iter, ruiz_iter, (P, A, q, b, d0, e0, c0)
    )

    # cone rectification: scalar scaling on SOC/PSD/exp/pow cones
    delta, changed = cone_ops.rectify_equilibration(layout, e)
    if changed:
        A = matops.scale_lr(A, delta, None)
        b = b * delta
        e = e * delta

    return P, A, q, b, Equilibration(d, e, 1.0 / d, 1.0 / e, c)
