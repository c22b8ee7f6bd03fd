"""Distributed block-arrow KKT factorization via Schur complements.

The reference's only path to parallel factorization is a multithreaded
Pardiso backend (reference: src/settings.jl:108-110,
ext/directldl_pardiso.jl).  The TPU-native counterpart shards a block-arrow
quasidefinite system

    K = [ D_1                 B_1 ]
        [      D_2            B_2 ]
        [           ...       ... ]
        [ B_1ᵀ B_2ᵀ  ...       C  ]

across a `tp` mesh axis: each device LDL-factors its diagonal blocks D_i
and forms the local Schur contribution B_iᵀ D_i⁻¹ B_i; one `psum` over ICI
reduces the dense Schur complement S = C − Σ B_iᵀ D_i⁻¹ B_i, which every
device factors redundantly (it is small and dense — MXU-friendly).  Solves
need one more `psum` for the reduced right-hand side.

Block-arrow structure is exactly what chordal decomposition emits (many
clique-sized diagonal blocks coupled through overlap/coupling variables),
and what multi-scenario / MPC problems produce naturally.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..linalg.ldl import ldl_factor, ldl_solve


class BlockArrowFactor(NamedTuple):
    L_blocks: jnp.ndarray    # (p_local, nb, nb) unit-lower factors
    d_blocks: jnp.ndarray    # (p_local, nb)
    DinvB: jnp.ndarray       # (p_local, nb, nt)  D_i^{-1} B_i
    L_schur: jnp.ndarray     # (nt, nt)
    d_schur: jnp.ndarray     # (nt,)
    ok: jnp.ndarray


def _factor_local(D_blocks, B_blocks, C, signs_blk, signs_tail, axis_name):
    """Factor the local diagonal blocks + psum the Schur complement.
    Runs inside shard_map; D_blocks: (p_local, nb, nb)."""
    Lb, db, okb = jax.vmap(
        lambda Kb: ldl_factor(Kb, signs_blk)
    )(D_blocks)
    DinvB = jax.vmap(ldl_solve)(Lb, db, B_blocks)         # (p_l, nb, nt)
    S_local = jnp.einsum("pij,pik->jk", B_blocks, DinvB)   # Σ_local B'D⁻¹B
    S = C - jax.lax.psum(S_local, axis_name)
    Ls, ds, oks = ldl_factor(S, signs_tail)
    ok = jnp.logical_and(jnp.all(okb), oks)
    return BlockArrowFactor(Lb, db, DinvB, Ls, ds, ok)


def _solve_local(fac: BlockArrowFactor, B_blocks, rhs_blocks, rhs_tail,
                 axis_name):
    """Solve K [x; y] = [rhs_blocks; rhs_tail] given the factorization.
    rhs_blocks: (p_local, nb); rhs_tail: (nt,) replicated."""
    u = jax.vmap(ldl_solve)(fac.L_blocks, fac.d_blocks, rhs_blocks)
    red_local = jnp.einsum("pij,pi->j", B_blocks, u)
    red = rhs_tail - jax.lax.psum(red_local, axis_name)
    y = ldl_solve(fac.L_schur, fac.d_schur, red)           # tail solution
    x = u - jnp.einsum("pij,j->pi", fac.DinvB, y)
    return x, y


class BlockArrowKKT:
    """Multi-device block-arrow KKT solver.

    p diagonal blocks of size nb, tail of size nt; blocks shard over the
    mesh's `tp` axis.  p must be divisible by the axis size.
    """

    def __init__(self, mesh: Mesh, p: int, nb: int, nt: int,
                 signs_blk=None, signs_tail=None, axis: str = "tp"):
        self.mesh = mesh
        self.axis = axis
        self.p, self.nb, self.nt = p, nb, nt
        ntp = mesh.shape[axis]
        assert p % ntp == 0, "block count must divide the tp axis size"

        signs_blk = (np.ones(nb) if signs_blk is None else signs_blk)
        signs_tail = (np.ones(nt) if signs_tail is None else signs_tail)
        sb = jnp.asarray(signs_blk, jnp.float64)
        st = jnp.asarray(signs_tail, jnp.float64)

        blk = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())

        factor_sm = jax.shard_map(
            partial(_factor_local, axis_name=axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), P()),
            out_specs=BlockArrowFactor(
                P(axis), P(axis), P(axis), P(), P(), P()
            ),
            check_vma=False,
        )
        solve_sm = jax.shard_map(
            partial(_solve_local, axis_name=axis),
            mesh=mesh,
            in_specs=(
                BlockArrowFactor(P(axis), P(axis), P(axis), P(), P(), P()),
                P(axis), P(axis), P(),
            ),
            out_specs=(P(axis), P()),
            check_vma=False,
        )

        self._factor = jax.jit(
            lambda D, B, C: factor_sm(D, B, C, sb, st)
        )
        self._solve = jax.jit(solve_sm)
        self._blk_sharding = blk
        self._rep_sharding = rep

    def factor(self, D_blocks, B_blocks, C):
        """D_blocks: (p, nb, nb); B_blocks: (p, nb, nt); C: (nt, nt)."""
        D = jax.device_put(jnp.asarray(D_blocks), self._blk_sharding)
        B = jax.device_put(jnp.asarray(B_blocks), self._blk_sharding)
        Cr = jax.device_put(jnp.asarray(C), self._rep_sharding)
        self._B = B
        self._fac = self._factor(D, B, Cr)
        return bool(self._fac.ok)

    def solve(self, rhs_blocks, rhs_tail):
        rb = jax.device_put(jnp.asarray(rhs_blocks), self._blk_sharding)
        rt = jax.device_put(jnp.asarray(rhs_tail), self._rep_sharding)
        x, y = self._solve(self._fac, self._B, rb, rt)
        if jax.process_count() > 1:
            # multi-process arrays are not host-convertible here; callers
            # read their addressable shards (see benchmarks/multihost_dryrun)
            return x, y
        return np.asarray(x), np.asarray(y)
