"""The homogeneous-embedding IPM core as a single jitted fixed-shape loop.

This is the TPU-native re-design of the reference's `solve!` main loop
(reference: src/solver.jl:189-380): the whole iteration — residuals,
termination metrics, Nesterov–Todd scaling, dense KKT factor, Mehrotra
predictor-corrector solves, cone step-length searches, strategy
checkpointing — is one `lax.while_loop` body with no host round-trips.
Data-dependent control flow (strategy downgrades, failures, termination)
becomes integer/boolean state selected with `jnp.where`, so the program is
a single XLA computation that also `vmap`s cleanly over instance batches.

Variable set: (x, z, s, τ, κ) with residuals
    rx = −Aᵀz − Px − qτ
    rz = s + Ax − bτ
    rτ = qᵀx + bᵀz + κ + xᵀPx/τ        (reference: src/residuals.jl:1-37)
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..cones.layout import ConeLayout
from ..cones import ops as cone_ops
from ..kkt import dense as kkt
from ..linalg import matops
from ..linalg import smallops as so
from ..statuscodes import SolverStatus
from .equilibration import ruiz_equilibrate, Equilibration

# scaling strategy codes (reference: src/types.jl:73-76)
PRIMAL_DUAL = 0
DUAL = 1

_BIG = 1e30  # large-but-finite in both f32 and f64


class Residuals(NamedTuple):
    rx: jnp.ndarray
    rz: jnp.ndarray
    rtau: jnp.ndarray
    rx_inf: jnp.ndarray
    rz_inf: jnp.ndarray
    Px: jnp.ndarray
    dot_qx: jnp.ndarray
    dot_bz: jnp.ndarray
    dot_sz: jnp.ndarray
    dot_xPx: jnp.ndarray


class Info(NamedTuple):
    cost_primal: jnp.ndarray
    cost_dual: jnp.ndarray
    res_primal: jnp.ndarray
    res_dual: jnp.ndarray
    res_primal_inf: jnp.ndarray
    res_dual_inf: jnp.ndarray
    gap_abs: jnp.ndarray
    gap_rel: jnp.ndarray
    ktratio: jnp.ndarray


class Carry(NamedTuple):
    # current iterate
    x: jnp.ndarray
    z: jnp.ndarray
    s: jnp.ndarray
    tau: jnp.ndarray
    kappa: jnp.ndarray
    # previous iterate (rollback for insufficient progress,
    # reference: src/solver.jl:346-347, src/info.jl:123-153)
    px: jnp.ndarray
    pz: jnp.ndarray
    ps: jnp.ndarray
    ptau: jnp.ndarray
    pkappa: jnp.ndarray
    # previous-iterate info scalars
    prev_res_primal: jnp.ndarray
    prev_res_dual: jnp.ndarray
    prev_gap_abs: jnp.ndarray
    prev_gap_rel: jnp.ndarray
    # most recent iteration scalars
    mu: jnp.ndarray
    alpha: jnp.ndarray
    sigma: jnp.ndarray
    # counters / state machine
    iters: jnp.ndarray     # int32
    status: jnp.ndarray    # int32
    scaling: jnp.ndarray   # int32


def compute_residuals(P, q, A, b, x, z, s, tau, kappa) -> Residuals:
    """reference: src/residuals.jl:1-37"""
    qx = so.vdot(q, x)
    bz = so.vdot(b, z)
    sz = so.vdot(s, z)
    Px = matops.mv(P, x)
    xPx = so.vdot(x, Px)
    rx_inf = -matops.rmv(A, z)
    rz_inf = s + matops.mv(A, x)
    rx = rx_inf - Px - q * tau
    rz = rz_inf - b * tau
    rtau = qx + bz + kappa + xPx / tau
    return Residuals(rx, rz, rtau, rx_inf, rz_inf, Px, qx, bz, sz, xPx)


def _norm2_scaled(w, v):
    return jnp.linalg.norm(w * v)


def compute_info(res: Residuals, x, z, s, tau, kappa,
                 equil: Equilibration, normq, normb) -> Info:
    """Equilibration-corrected convergence metrics.
    reference: src/info.jl:1-63"""
    tinv = 1.0 / tau
    cinv = 1.0 / equil.c
    d, dinv, e, einv = equil.d, equil.dinv, equil.e, equil.einv

    xPx_half = res.dot_xPx * tinv * tinv / 2.0
    cost_primal = (res.dot_qx * tinv + xPx_half) * cinv
    cost_dual = (-res.dot_bz * tinv - xPx_half) * cinv

    normx = _norm2_scaled(d, x)
    normz = _norm2_scaled(e, z) * cinv
    norms = _norm2_scaled(einv, s)

    res_primal_inf = (_norm2_scaled(dinv, res.rx_inf) * cinv) / jnp.maximum(1.0, normz)
    res_dual_inf = jnp.maximum(
        _norm2_scaled(dinv, res.Px) / jnp.maximum(1.0, normx),
        _norm2_scaled(einv, res.rz_inf) / jnp.maximum(1.0, normx + norms),
    )

    normx = normx * tinv
    normz = normz * tinv
    norms = norms * tinv

    res_primal = (
        _norm2_scaled(einv, res.rz) * tinv / jnp.maximum(1.0, normb + normx + norms)
    )
    res_dual = (
        _norm2_scaled(dinv, res.rx) * tinv * cinv
        / jnp.maximum(1.0, normq + normx + normz)
    )

    gap_abs = jnp.abs(cost_primal - cost_dual)
    gap_rel = gap_abs / jnp.maximum(
        1.0, jnp.minimum(jnp.abs(cost_primal), jnp.abs(cost_dual))
    )
    ktratio = kappa * tinv
    return Info(cost_primal, cost_dual, res_primal, res_dual,
                res_primal_inf, res_dual_inf, gap_abs, gap_rel, ktratio)


def check_convergence(info: Info, res: Residuals, tols) -> jnp.ndarray:
    """Returns a status code (UNSOLVED if not converged).
    reference: src/info.jl:274-331"""
    (tol_gap_abs, tol_gap_rel, tol_feas,
     tol_infeas_abs, tol_infeas_rel, tol_ktratio,
     solved_st, pinf_st, dinf_st) = tols

    is_solved = jnp.logical_and(
        jnp.logical_or(info.gap_abs < tol_gap_abs, info.gap_rel < tol_gap_rel),
        jnp.logical_and(info.res_primal < tol_feas, info.res_dual < tol_feas),
    )
    solved = jnp.logical_and(info.ktratio <= 1.0, is_solved)

    kt_big = info.ktratio > 1000.0 / tol_ktratio
    pinf = jnp.logical_and(
        res.dot_bz < -tol_infeas_abs,
        info.res_primal_inf < -tol_infeas_rel * res.dot_bz,
    )
    dinf = jnp.logical_and(
        res.dot_qx < -tol_infeas_abs,
        info.res_dual_inf < -tol_infeas_rel * res.dot_qx,
    )

    status = jnp.where(
        solved,
        solved_st,
        jnp.where(
            jnp.logical_and(kt_big, pinf),
            pinf_st,
            jnp.where(jnp.logical_and(kt_big, dinf), dinf_st,
                      int(SolverStatus.UNSOLVED)),
        ),
    )
    return status.astype(jnp.int32)


def build_solve(layout: ConeLayout, settings, n: int, p_nonzero: bool,
                structure=None, assembly=None, kkt_backend=None,
                mesh=None, tp_axis="tp"):
    """Build the end-to-end jitted solve function for a fixed problem
    structure (cone layout + dimensions).

    Returns solve(P, q, A, b) -> solution dict.  P must be the FULL
    symmetric cost matrix (the reference consumes triu-only;
    see src/solver.jl docstring).  `structure` is a BlockArrowPlan for
    the "blockarrow" KKT backend.  `mesh` (with a `tp_axis` axis) shards
    the block-arrow factorization across devices — the multi-device
    counterpart of the reference's parallel Pardiso factorization
    (reference: ext/directldl_pardiso.jl); the plan's block count must be
    padded to a multiple of the axis size (structure.pad_plan_blocks).
    """
    m = layout.m
    dtype = np.dtype(settings.dtype)
    degree = layout.degree
    signs = jnp.asarray(
        np.concatenate([np.ones(n), -np.ones(m)]).astype(dtype)
    )
    # generalized power cones only support dual scaling
    # (reference: coneops_genpowcone.jl:21)
    allows_pd = not any(g.kind == "genpow" for g in layout.groups.values())
    if kkt_backend is None:
        kkt_backend = settings.kkt_backend
    if kkt_backend == "megakernel":
        # the fused-kernel backend only exists for BatchSolver (it is a
        # whole-solve Pallas kernel, not a KKT factorization); falling
        # through to a different backend silently would hand the user
        # something other than what they selected
        raise ValueError(
            "kkt_backend='megakernel' is a BatchSolver backend "
            "(parallel.batch_impl.BatchSolver); the single-instance "
            "Solver supports ldl/condensed/blockarrow/multifrontal/auto"
        )
    if settings.factor_dtype is None:
        # resolve the factorization precision: on TPU the multifrontal
        # backend defaults to f32 fronts (they ride the MXU; f64
        # dot_general on TPU pays a ~3.6 ms flat emulation cost per call)
        # with f64 iterative refinement recovering full accuracy —
        # measured 7.5x on a 60x60 grid QP at unchanged iteration counts.
        # Everything else factors at the solve dtype; refinement-off or
        # mixed-precision runs keep the solve dtype.
        import jax

        is_mf = kkt_backend == "multifrontal"
        if assembly is not None:
            from ..kkt.assembly_maps_nd import NestedAssemblyMaps

            is_mf = isinstance(assembly, NestedAssemblyMaps)
        # zero cones put ~(-static_eps) pivots on the KKT diagonal; their
        # Schur growth overflows f32 fronts (measured NaN on AUG2DC-scale
        # equality QPs).  PSD-cone Hs blocks fail the same way (chordal
        # max-cut: NUMERICAL_ERROR at iteration 1 with f32 fronts, solved
        # with f64 — measured on both CPU and v5e).  The f32 default
        # therefore requires a layout of only nn/soc/exp/pow cones.
        has_zero = any(g.kind in ("zero", "psd")
                       for g in layout.groups.values())
        fd = settings.dtype
        if (is_mf
                and not has_zero
                and settings.dtype == "float64"
                and settings.iterative_refinement_enable
                and not settings.mixed_precision
                and jax.default_backend() not in ("cpu",)):
            fd = "float32"
        settings = settings.replace(factor_dtype=fd)
    if settings.dense_ldl_diag_order is None:
        # auto: descending-|diag| elimination order for the dense LDL —
        # only for zero/nn/soc layouts.  Nonsymmetric-cone Hs blocks
        # (exp/pow/genpow BFGS-class Hessians) and PSD skron blocks have
        # dominant off-diagonals, where diagonal magnitude is a poor
        # pivoting guide (measured: an exp-cone CBF instance degrades
        # from SOLVED/7e-10 to ALMOST/4e-8 under diag order).  SOC Hs is
        # eta^2(2ww'-J): diagonally dominant enough, and the big-SOC
        # P=0 class is exactly what the reorder fixes (kkt/dense.py).
        safe = all(g.kind in ("zero", "nn", "soc")
                   for g in layout.groups.values())
        settings = settings.replace(dense_ldl_diag_order=safe)
    scaling0 = PRIMAL_DUAL if allows_pd else DUAL
    is_symmetric = layout.is_symmetric
    eps_T = float(np.finfo(dtype).eps)

    def shift_to_cone_interior(vec, pd):
        """reference: src/variables.jl:180-208"""
        mm, pm = cone_ops.margins(layout, vec, pd)
        # a non-finite margin (e.g. an eig failure) must force a shift,
        # never silently skip it: `NaN <= 0` is False, and an unshifted
        # non-interior start makes the zero-residual initial point pass
        # the convergence check as a fake SOLVED
        mm = jnp.where(jnp.isfinite(mm), mm, -1.0)
        pm = jnp.where(jnp.isfinite(pm), pm, 0.0)
        if degree > 0:
            target = jnp.maximum(1.0, 0.1 * pm / degree)
        else:
            target = jnp.asarray(1.0, vec.dtype)
        amt1 = jnp.where(mm <= 0, -mm, 0.0)
        amt2 = jnp.where(
            mm <= 0, target, jnp.where(mm < target, target - mm, 0.0)
        )
        vec = cone_ops.scaled_unit_shift(layout, vec, amt1, pd)
        vec = cone_ops.scaled_unit_shift(layout, vec, amt2, pd)
        return vec

    def make_kkt(P, A, state, factor_dtype):
        """Statically-selected KKT backend: factor at the given state and
        return (ok, solve_xz, solve_xz2).  Used by both the initial-point
        solve (identity scaling) and the per-iteration step."""
        if assembly is not None:
            # sparse data: map-based assembly, no dense K/Hs
            from ..kkt import blockarrow as kkt_ba
            from ..kkt.assembly_maps_nd import NestedAssemblyMaps

            srk = getattr(assembly, "soc_rank2_min_dim", None)
            hs_vals = cone_ops.hs_flat_values(
                layout, state, dtype, soc_rank2_min_dim=srk
            )
            kkt_mv = kkt_ba.make_kkt_matvec(P, A, layout, state)
            plan = assembly.plan

            if isinstance(assembly, NestedAssemblyMaps):
                from ..kkt import assembly_maps_nd as kkt_amnd
                from ..kkt import multifrontal as kkt_mf

                fac = kkt_amnd.factor_from_nested_maps(
                    assembly, P.vals, A.vals, hs_vals, settings,
                    factor_dtype,
                )

                def solve_xz(bx, bz):
                    return kkt_mf.kkt_solve_xz_multifrontal(
                        fac, plan, kkt_mv, bx, bz, settings
                    )

                def solve_xz2(bx1, bz1, bx2, bz2):
                    return kkt_mf.kkt_solve_xz2_multifrontal(
                        fac, plan, kkt_mv, bx1, bz1, bx2, bz2, settings
                    )

                return fac.ok, solve_xz, solve_xz2

            from ..kkt import assembly_maps as kkt_am

            fac = kkt_am.factor_from_maps(
                assembly, P.vals, A.vals, hs_vals, settings, factor_dtype,
                mesh=mesh, tp_axis=tp_axis,
            )
            ok_factor = fac.ok

            apply_fn = lambda r: kkt_ba._ba_apply(
                fac, plan, r, mesh=mesh, tp_axis=tp_axis
            )
            if srk is not None:
                # rank-2 SOC terms applied as an SMW correction around K₀
                from ..kkt.socrank import wrap_apply_smw

                U, usigns = cone_ops.soc_rank2_uv(
                    layout, state, n, dtype, soc_rank2_min_dim=srk
                )
                if U is not None:
                    apply_fn, ok_smw = wrap_apply_smw(
                        apply_fn, U, usigns, settings
                    )
                    ok_factor = jnp.logical_and(ok_factor, ok_smw)

            from ..kkt.refine import solve_refined

            def solve_xz(bx, bz):
                sol, ok = solve_refined(
                    apply_fn, kkt_mv, jnp.concatenate([bx, bz]), settings
                )
                return sol[:n], sol[n:], ok

            def solve_xz2(bx1, bz1, bx2, bz2):
                rhs = jnp.stack([jnp.concatenate([bx1, bz1]),
                                 jnp.concatenate([bx2, bz2])], axis=1)
                sol, ok = solve_refined(apply_fn, kkt_mv, rhs, settings)
                return sol[:n, 0], sol[n:, 0], sol[:n, 1], sol[n:, 1], ok

            return ok_factor, solve_xz, solve_xz2

        if kkt_backend == "multifrontal" and structure is not None:
            from ..structure_nd import NestedPlan
            from ..kkt import multifrontal as kkt_mf
            from ..kkt import blockarrow as kkt_ba

            assert isinstance(structure, NestedPlan)
            Hs = cone_ops.hs_dense(layout, state, dtype)
            fac = kkt_mf.assemble_and_factor_multifrontal(
                P, A, Hs, structure, signs, settings, factor_dtype
            )
            kkt_mv = kkt_ba.make_kkt_matvec(P, A, layout, state)

            def solve_xz(bx, bz):
                return kkt_mf.kkt_solve_xz_multifrontal(
                    fac, structure, kkt_mv, bx, bz, settings
                )

            def solve_xz2(bx1, bz1, bx2, bz2):
                return kkt_mf.kkt_solve_xz2_multifrontal(
                    fac, structure, kkt_mv, bx1, bz1, bx2, bz2, settings
                )

            return fac.ok, solve_xz, solve_xz2

        if kkt_backend == "blockarrow" and structure is not None:
            Hs = cone_ops.hs_dense(layout, state, dtype)
            from ..kkt import blockarrow as kkt_ba

            fac = kkt_ba.assemble_and_factor_blockarrow(
                P, A, Hs, structure, signs, settings, factor_dtype,
                mesh=mesh, tp_axis=tp_axis,
            )
            kkt_mv = kkt_ba.make_kkt_matvec(P, A, layout, state)

            def solve_xz(bx, bz):
                return kkt_ba.kkt_solve_xz_blockarrow(
                    fac, structure, kkt_mv, bx, bz, settings,
                    mesh=mesh, tp_axis=tp_axis,
                )

            def solve_xz2(bx1, bz1, bx2, bz2):
                return kkt_ba.kkt_solve_xz2_blockarrow(
                    fac, structure, kkt_mv, bx1, bz1, bx2, bz2, settings,
                    mesh=mesh, tp_axis=tp_axis,
                )

            return fac.ok, solve_xz, solve_xz2

        if kkt_backend == "condensed":
            from ..kkt import condensed as kkt_cond
            from ..kkt import blockarrow as kkt_ba

            fac, _ = kkt_cond.assemble_and_factor_condensed(
                P, A, layout, state, signs, settings, factor_dtype
            )
            kkt_mv = kkt_ba.make_kkt_matvec(P, A, layout, state)

            def solve_xz(bx, bz):
                return kkt_cond.kkt_solve_xz_condensed(
                    fac, layout, state, kkt_mv, bx, bz, settings
                )

            def solve_xz2(bx1, bz1, bx2, bz2):
                return kkt_cond.kkt_solve_xz2_condensed(
                    fac, layout, state, kkt_mv, bx1, bz1, bx2, bz2, settings
                )

            return fac.ok, solve_xz, solve_xz2

        Hs = cone_ops.hs_dense(layout, state, dtype)
        fac = kkt.assemble_and_factor(
            P, A, Hs, signs, settings, factor_dtype=factor_dtype
        )

        def solve_xz(bx, bz):
            return kkt.kkt_solve_xz(fac, bx, bz, settings)

        def solve_xz2(bx1, bz1, bx2, bz2):
            return kkt.kkt_solve_xz2(fac, bx1, bz1, bx2, bz2, settings)

        return fac.ok, solve_xz, solve_xz2

    def default_start(P, q, A, b):
        """reference: src/solver.jl:383-404, src/kktsystem.jl:95-132"""
        zero_n = jnp.zeros((n,), dtype)
        zero_m = jnp.zeros((m,), dtype)
        if is_symmetric:
            state0 = cone_ops.set_identity_scaling(layout, dtype)
            _, solve_xz, _ = make_kkt(P, A, state0, settings.factor_dtype)
            if p_nonzero:
                # QP initialization
                x0, z0, _ = solve_xz(-q, b)
                s0 = -z0
            else:
                # LP initialization
                x0, ms, _ = solve_xz(zero_n, b)
                s0 = -ms
                _, z0, _ = solve_xz(-q, zero_m)
            s0 = shift_to_cone_interior(s0, "primal")
            z0 = shift_to_cone_interior(z0, "dual")
        else:
            z0, s0 = cone_ops.unit_initialization(layout, dtype)
            x0 = zero_n
        one = jnp.asarray(1.0, dtype)
        return x0, z0, s0, one, one

    def calc_step_length(dz, ds, dtau, dkappa, z, s, tau, kappa,
                         state, steptype, scaling):
        """reference: src/variables.jl:14-43 + solver_get_step_length"""
        a_tau = jnp.where(dtau < 0, -tau / jnp.where(dtau < 0, dtau, -1.0), _BIG)
        a_kappa = jnp.where(dkappa < 0, -kappa / jnp.where(dkappa < 0, dkappa, -1.0), _BIG)
        amax = jnp.minimum(jnp.minimum(a_tau, a_kappa), 1.0)
        alpha = cone_ops.step_length(layout, state, dz, ds, z, s, amax, settings)
        if steptype == "combined":
            alpha = alpha * settings.max_step_fraction
        return alpha

    def barrier_fn(x, z, s, tau, kappa, dz, ds, dtau, dkappa, state, alpha):
        """reference: src/variables.jl:46-72"""
        central_coef = degree + 1
        cur_tau = tau + alpha * dtau
        cur_kappa = kappa + alpha * dkappa
        sz = so.vdot(z + alpha * dz, s + alpha * ds)
        mu = (sz + cur_tau * cur_kappa) / central_coef
        barrier = (
            central_coef * cone_ops._logsafe(mu)
            - cone_ops._logsafe(cur_tau)
            - cone_ops._logsafe(cur_kappa)
        )
        barrier = barrier + cone_ops.compute_barrier(layout, state, z, s, dz, ds, alpha)
        return barrier

    def backtrack_to_barrier(x, z, s, tau, kappa, dz, ds, dtau, dkappa,
                             state, alpha_init):
        """Backtracking line search on barrier < 1 for asymmetric duals.
        reference: src/solver.jl:424-442"""
        step = settings.linesearch_backtrack_step

        def body(carry):
            j, alpha, done = carry
            barrier = barrier_fn(x, z, s, tau, kappa, dz, ds, dtau, dkappa,
                                 state, alpha)
            good = barrier < 1.0
            alpha = jnp.where(good, alpha, alpha * step)
            return (j + 1, alpha, good)

        def cond(carry):
            j, alpha, done = carry
            return jnp.logical_and(j < settings.linesearch_max_iter,
                                   jnp.logical_not(done))

        _, alpha, _ = lax.while_loop(
            cond, body, (jnp.asarray(0), alpha_init, jnp.asarray(False))
        )
        return alpha

    def prepare(P, q, A, b):
        """Equilibration + initial point; returns (data, initial carry)."""
        if not matops.is_sparse(P):
            P = jnp.asarray(P, dtype)
        if not matops.is_sparse(A):
            A = jnp.asarray(A, dtype)
        q = jnp.asarray(q, dtype)
        b = jnp.asarray(b, dtype)

        # -- equilibration (reference: src/problemdata.jl:133-221)
        P, A, q, b, equil = ruiz_equilibrate(layout, settings, P, A, q, b)
        normq = jnp.max(jnp.abs(equil.dinv * q), initial=0.0) / equil.c
        normb = jnp.max(jnp.abs(equil.einv * b), initial=0.0)

        # -- initial point
        x0, z0, s0, tau0, kappa0 = default_start(P, q, A, b)

        fzero = jnp.asarray(0.0, dtype)
        carry0 = Carry(
            x=x0, z=z0, s=s0, tau=tau0, kappa=kappa0,
            px=x0, pz=z0, ps=s0, ptau=tau0, pkappa=kappa0,
            prev_res_primal=jnp.asarray(_BIG, dtype),
            prev_res_dual=jnp.asarray(_BIG, dtype),
            prev_gap_abs=jnp.asarray(_BIG, dtype),
            prev_gap_rel=jnp.asarray(_BIG, dtype),
            mu=jnp.asarray(_BIG, dtype),
            alpha=fzero, sigma=jnp.asarray(1.0, dtype),
            iters=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(int(SolverStatus.UNSOLVED), jnp.int32),
            scaling=jnp.asarray(scaling0, jnp.int32),
        )
        return (P, q, A, b, equil, normq, normb), carry0

    def run_phases(data, carry0, iter_cap):
        """Run the IPM loop(s) until termination or carry.iters >= iter_cap
        (a traced scalar, so chunked calls do not recompile)."""
        P, q, A, b, equil, normq, normb = data

        full_tols = (
            settings.tol_gap_abs, settings.tol_gap_rel, settings.tol_feas,
            settings.tol_infeas_abs, settings.tol_infeas_rel,
            settings.tol_ktratio,
            int(SolverStatus.SOLVED), int(SolverStatus.PRIMAL_INFEASIBLE),
            int(SolverStatus.DUAL_INFEASIBLE),
        )

        def loop_cond(carry: Carry):
            return jnp.logical_and(
                carry.status == int(SolverStatus.UNSOLVED),
                carry.iters < iter_cap,
            )

        def make_loop_body(factor_dtype):
            return lambda carry: loop_body(carry, factor_dtype)

        def loop_body(carry: Carry, factor_dtype) -> Carry:
            x, z, s, tau, kappa = carry.x, carry.z, carry.s, carry.tau, carry.kappa

            # -------- top-of-loop: residuals, info, termination --------
            res = compute_residuals(P, q, A, b, x, z, s, tau, kappa)
            mu = (res.dot_sz + tau * kappa) / (degree + 1)
            info = compute_info(res, x, z, s, tau, kappa, equil, normq, normb)

            if settings.verbose:
                from ..info_print import debug_print_iteration

                debug_print_iteration(carry.iters, info, mu, carry.alpha)

            status = check_convergence(info, res, full_tols)

            # poor progress checks (reference: src/info.jl:79-104)
            going_backwards = jnp.logical_or(
                info.res_dual > carry.prev_res_dual,
                info.res_primal > carry.prev_res_primal,
            )
            # relaxed variant for the high-tolerance branch: improvement
            # below (1 - stall_detection_ratio) per iteration counts as
            # stalled (TPU float-float floor; docs/DEVIATIONS.md #11)
            stall_ratio = settings.stall_detection_ratio
            stagnating = jnp.logical_or(
                info.res_dual > stall_ratio * carry.prev_res_dual,
                info.res_primal > stall_ratio * carry.prev_res_primal,
            )
            after_first = jnp.logical_and(
                status == int(SolverStatus.UNSOLVED), carry.iters > 1
            )
            cond_progress = jnp.logical_and(after_first, going_backwards)
            cond_stall = jnp.logical_and(after_first, stagnating)
            poor_hi = jnp.logical_and(
                info.ktratio < 100.0 * eps_T,
                jnp.logical_or(
                    carry.prev_gap_abs < settings.tol_gap_abs,
                    carry.prev_gap_rel < settings.tol_gap_rel,
                ),
            )
            diverging = jnp.logical_and(
                info.ktratio < 1.0,
                jnp.logical_or(
                    jnp.logical_and(
                        info.res_dual > 100.0 * settings.tol_feas,
                        info.res_dual > 100.0 * carry.prev_res_dual,
                    ),
                    jnp.logical_and(
                        info.res_primal > 100.0 * settings.tol_feas,
                        info.res_primal > 100.0 * carry.prev_res_primal,
                    ),
                ),
            )
            insuff = jnp.logical_or(
                jnp.logical_and(cond_stall, poor_hi),
                jnp.logical_and(cond_progress, diverging),
            )
            status = jnp.where(
                insuff, int(SolverStatus.INSUFFICIENT_PROGRESS), status
            ).astype(jnp.int32)

            # iteration limit (reference: src/info.jl:109-116)
            status = jnp.where(
                jnp.logical_and(status == int(SolverStatus.UNSOLVED),
                                carry.iters >= settings.max_iter),
                int(SolverStatus.MAX_ITERATIONS),
                status,
            ).astype(jnp.int32)

            # insufficient-progress strategy checkpoint
            # (reference: src/solver.jl:453-472): roll back to the previous
            # iterate; if asymmetric and PrimalDual, downgrade and continue.
            is_insuff = status == int(SolverStatus.INSUFFICIENT_PROGRESS)
            can_downgrade_ip = jnp.logical_and(
                (not is_symmetric) and allows_pd,
                carry.scaling == PRIMAL_DUAL,
            )
            restore = is_insuff
            x = jnp.where(restore, carry.px, x)
            z = jnp.where(restore, carry.pz, z)
            s = jnp.where(restore, carry.ps, s)
            tau = jnp.where(restore, carry.ptau, tau)
            kappa = jnp.where(restore, carry.pkappa, kappa)
            downgraded_ip = jnp.logical_and(is_insuff, can_downgrade_ip)
            status = jnp.where(
                downgraded_ip, int(SolverStatus.UNSOLVED), status
            ).astype(jnp.int32)
            scaling = jnp.where(downgraded_ip, DUAL, carry.scaling).astype(jnp.int32)

            done_or_restart = jnp.logical_or(
                status != int(SolverStatus.UNSOLVED), downgraded_ip
            )

            def skip_step(_):
                return carry._replace(
                    x=x, z=z, s=s, tau=tau, kappa=kappa,
                    mu=mu, status=status, scaling=scaling,
                )

            # -------- phase B: scaling, KKT, predictor-corrector --------
            def do_step(_):
                state, ok_scale = cone_ops.update_scaling(
                    layout, None, s, z, mu, scaling
                )
                iters = carry.iters + 1

                ok_factor, solve_xz, solve_xz2 = make_kkt(
                    P, A, state, factor_dtype
                )
                ok_kkt = jnp.logical_and(ok_factor, ok_scale)

                # fused multi-RHS solve: constant part [-q; b] -> (x2, z2)
                # (reference: src/kktsystem.jl:80-92) together with the
                # affine step's inner solve (both RHS are factor-time known)
                aff_ds = cone_ops.affine_ds(layout, state, s)
                x2, z2, x1a, z1a, ok1 = solve_xz2(-q, b, res.rx, s - res.rz)
                ok_kkt = jnp.logical_and(ok_kkt, ok1)

                def tau_recovery(x1, z1, ds_const, rhs_tau, rhs_kappa):
                    """Stage 2+3 of the 3-stage solve: two-solve τ
                    recovery.  reference: src/kktsystem.jl:135-215"""
                    xi = x / tau
                    tau_num = (
                        rhs_tau - rhs_kappa / tau
                        + so.vdot(q, x1) + so.vdot(b, z1)
                        + 2.0 * so.vdot(xi, matops.mv(P, x1))
                    )
                    xi_m_x2 = xi - x2
                    tau_den = (
                        kappa / tau - so.vdot(q, x2) - so.vdot(b, z2)
                        + so.vdot(xi_m_x2, matops.mv(P, xi_m_x2))
                        - so.vdot(x2, matops.mv(P, x2))
                    )
                    dtau = tau_num / tau_den
                    dx = x1 + dtau * x2
                    dz = z1 + dtau * z2
                    ds = -(cone_ops.mul_Hs(layout, state, dz) + ds_const)
                    dkappa = -(rhs_kappa + kappa * dtau) / tau
                    return dx, dz, ds, dtau, dkappa

                def kkt_solve(rhs_x, rhs_z, rhs_s, rhs_tau, rhs_kappa):
                    """Combined-step solve (RHS depends on affine results)."""
                    ds_const = cone_ops.ds_from_dz_offset(
                        layout, state, rhs_s, z
                    )
                    x1, z1, okA = solve_xz(rhs_x, ds_const - rhs_z)
                    out = tau_recovery(x1, z1, ds_const, rhs_tau, rhs_kappa)
                    return (*out, okA)

                # affine step (reference: src/variables.jl:107-121);
                # ds_const = s in the affine case
                dxa, dza, dsa, dtaua, dkappaa = tau_recovery(
                    x1a, z1a, s, res.rtau, tau * kappa
                )

                alpha_aff = calc_step_length(
                    dza, dsa, dtaua, dkappaa, z, s, tau, kappa, state,
                    "affine", scaling
                )
                sigma = (1.0 - alpha_aff) ** 3

                # reduced Mehrotra correction on iteration 1
                # (reference: src/solver.jl:305-314)
                m_corr = jnp.where(iters > 1, 1.0, alpha_aff)

                # combined step rhs (reference: src/variables.jl:124-162)
                sigma_mu = sigma * mu
                shift = cone_ops.combined_ds_shift(
                    layout, state, m_corr * dza, dsa, sigma_mu, z
                )
                comb_s = aff_ds + shift
                comb_x = (1.0 - sigma) * res.rx
                comb_z = (1.0 - sigma) * res.rz
                comb_tau = (1.0 - sigma) * res.rtau
                comb_kappa = (
                    -sigma_mu + m_corr * dtaua * dkappaa + tau * kappa
                )

                dx, dz, ds, dtau, dkappa, ok3 = kkt_solve(
                    comb_x, comb_z, comb_s, comb_tau, comb_kappa
                )
                ok_kkt = jnp.logical_and(ok_kkt, ok3)

                # numerical-error checkpoint (reference: src/solver.jl:475-489)
                can_downgrade = jnp.logical_and(
                    (not is_symmetric) and allows_pd, scaling == PRIMAL_DUAL
                )
                kkt_fail = jnp.logical_not(ok_kkt)
                new_scaling = jnp.where(
                    jnp.logical_and(kkt_fail, can_downgrade), DUAL, scaling
                ).astype(jnp.int32)
                fail_status = jnp.where(
                    jnp.logical_and(kkt_fail, jnp.logical_not(can_downgrade)),
                    int(SolverStatus.NUMERICAL_ERROR),
                    int(SolverStatus.UNSOLVED),
                ).astype(jnp.int32)

                # final step length
                alpha = calc_step_length(
                    dz, ds, dtau, dkappa, z, s, tau, kappa, state,
                    "combined", scaling
                )
                if (not is_symmetric):
                    # extra barrier backtrack for asymmetric dual scaling
                    # (reference: src/solver.jl:416-419)
                    alpha_bt = backtrack_to_barrier(
                        x, z, s, tau, kappa, dz, ds, dtau, dkappa, state, alpha
                    )
                    alpha = jnp.where(scaling == DUAL, alpha_bt, alpha)

                # small-step checkpoint (reference: src/solver.jl:492-505)
                small_switch = jnp.logical_and(
                    can_downgrade, alpha < settings.min_switch_step_length
                )
                small_terminate = jnp.logical_and(
                    jnp.logical_not(small_switch),
                    alpha <= max(0.0, settings.min_terminate_step_length),
                )
                new_scaling = jnp.where(
                    jnp.logical_and(jnp.logical_not(kkt_fail), small_switch),
                    DUAL, new_scaling,
                ).astype(jnp.int32)
                fail_status = jnp.where(
                    jnp.logical_and(
                        fail_status == int(SolverStatus.UNSOLVED),
                        jnp.logical_and(jnp.logical_not(kkt_fail),
                                        small_terminate),
                    ),
                    int(SolverStatus.INSUFFICIENT_PROGRESS),
                    fail_status,
                ).astype(jnp.int32)

                take_step = jnp.logical_and(
                    jnp.logical_not(kkt_fail),
                    jnp.logical_and(jnp.logical_not(small_switch),
                                    jnp.logical_not(small_terminate)),
                )
                alpha_eff = jnp.where(take_step, alpha, 0.0)

                # save previous iterate before stepping
                # (reference: src/solver.jl:346-349)
                nx = jnp.where(take_step, x + alpha_eff * dx, x)
                nz = jnp.where(take_step, z + alpha_eff * dz, z)
                ns = jnp.where(take_step, s + alpha_eff * ds, s)
                ntau = jnp.where(take_step, tau + alpha_eff * dtau, tau)
                nkappa = jnp.where(take_step, kappa + alpha_eff * dkappa, kappa)

                return Carry(
                    x=nx, z=nz, s=ns, tau=ntau, kappa=nkappa,
                    px=jnp.where(take_step, x, carry.px),
                    pz=jnp.where(take_step, z, carry.pz),
                    ps=jnp.where(take_step, s, carry.ps),
                    ptau=jnp.where(take_step, tau, carry.ptau),
                    pkappa=jnp.where(take_step, kappa, carry.pkappa),
                    prev_res_primal=jnp.where(
                        take_step, info.res_primal, carry.prev_res_primal),
                    prev_res_dual=jnp.where(
                        take_step, info.res_dual, carry.prev_res_dual),
                    prev_gap_abs=jnp.where(
                        take_step, info.gap_abs, carry.prev_gap_abs),
                    prev_gap_rel=jnp.where(
                        take_step, info.gap_rel, carry.prev_gap_rel),
                    mu=mu, alpha=alpha_eff, sigma=sigma,
                    iters=iters, status=fail_status, scaling=new_scaling,
                )

            return lax.cond(done_or_restart, skip_step, do_step, None)

        if getattr(settings, "mixed_precision", False):
            # two-phase precision schedule: factor in f32 while the barrier
            # parameter is large (native MXU speed), hand off to the
            # full-precision factorization for the final sharpening
            # iterations where cond(KKT) ~ 1/μ² exceeds f32 range.
            mu_switch = settings.mixed_precision_mu_switch

            def phase1_cond(carry: Carry):
                return jnp.logical_and(
                    loop_cond(carry), carry.mu > mu_switch
                )

            mid = lax.while_loop(
                phase1_cond, make_loop_body("float32"), carry0
            )
            final = lax.while_loop(
                loop_cond, make_loop_body(settings.factor_dtype), mid
            )
        else:
            final = lax.while_loop(
                loop_cond, make_loop_body(settings.factor_dtype), carry0
            )
        return final

    def finalize(data, final):
        """Post-processing: almost-checks, unscaling, certificates."""
        P, q, A, b, equil, normq, normb = data

        # ---- post-processing (reference: src/solver.jl:366-370) ----
        res = compute_residuals(P, q, A, b, final.x, final.z, final.s,
                                final.tau, final.kappa)
        info = compute_info(res, final.x, final.z, final.s, final.tau,
                            final.kappa, equil, normq, normb)

        # "almost" convergence checks at reduced tolerances
        # (reference: src/info.jl:198-214, 252-271)
        reduced_tols = (
            settings.reduced_tol_gap_abs, settings.reduced_tol_gap_rel,
            settings.reduced_tol_feas, settings.reduced_tol_infeas_abs,
            settings.reduced_tol_infeas_rel, settings.reduced_tol_ktratio,
            int(SolverStatus.ALMOST_SOLVED),
            int(SolverStatus.ALMOST_PRIMAL_INFEASIBLE),
            int(SolverStatus.ALMOST_DUAL_INFEASIBLE),
        )
        errored = jnp.logical_or(
            jnp.logical_or(
                final.status == int(SolverStatus.NUMERICAL_ERROR),
                final.status == int(SolverStatus.INSUFFICIENT_PROGRESS),
            ),
            jnp.logical_or(
                final.status == int(SolverStatus.MAX_ITERATIONS),
                final.status == int(SolverStatus.MAX_TIME),
            ),
        )
        almost_status = check_convergence(info, res, reduced_tols)
        status = jnp.where(
            jnp.logical_and(errored,
                            almost_status != int(SolverStatus.UNSOLVED)),
            almost_status,
            final.status,
        ).astype(jnp.int32)

        # unscale variables (reference: src/variables.jl:247-275)
        is_infeasible = jnp.logical_or(
            jnp.logical_or(
                status == int(SolverStatus.PRIMAL_INFEASIBLE),
                status == int(SolverStatus.DUAL_INFEASIBLE),
            ),
            jnp.logical_or(
                status == int(SolverStatus.ALMOST_PRIMAL_INFEASIBLE),
                status == int(SolverStatus.ALMOST_DUAL_INFEASIBLE),
            ),
        )
        scaleinv = jnp.where(is_infeasible, 1.0 / final.kappa, 1.0 / final.tau)
        cinv = 1.0 / equil.c
        x_out = final.x * equil.d * scaleinv
        z_out = final.z * equil.e * (scaleinv * cinv)
        s_out = final.s * equil.einv * scaleinv

        nan = jnp.asarray(np.nan, dtype)
        obj_val = jnp.where(is_infeasible, nan, info.cost_primal)
        obj_val_dual = jnp.where(is_infeasible, nan, info.cost_dual)

        return {
            "x": x_out,
            "z": z_out,
            "s": s_out,
            "status": status,
            "obj_val": obj_val,
            "obj_val_dual": obj_val_dual,
            "iterations": final.iters,
            "r_prim": info.res_primal,
            "r_dual": info.res_dual,
            "gap_abs": info.gap_abs,
            "gap_rel": info.gap_rel,
            "mu": final.mu,
            "step_length": final.alpha,
            "sigma": final.sigma,
            "ktratio": info.ktratio,
            "tau": final.tau * scaleinv,
            "kappa": final.kappa * scaleinv,
        }

    def solve(P, q, A, b):
        data, carry0 = prepare(P, q, A, b)
        final = run_phases(data, carry0, jnp.asarray(2**30, jnp.int32))
        return finalize(data, final)

    # device timing probes (print_timers phase breakdown): each is a
    # separately-jittable slice of one IPM iteration at a given state
    def probe_scaling(data, carry):
        """Cone scaling-state update only."""
        state, ok = cone_ops.update_scaling(
            layout, None, carry.s, carry.z, carry.mu, carry.scaling
        )
        return state, ok

    def probe_step(data, carry):
        """Scaling + KKT factor + the fused 2-RHS solve (the per-iteration
        linear-algebra hot path)."""
        P, q, A, b, equil, normq, normb = data
        state, _ = cone_ops.update_scaling(
            layout, None, carry.s, carry.z, carry.mu, carry.scaling
        )
        ok, _, solve_xz2 = make_kkt(P, A, state, settings.factor_dtype)
        res = compute_residuals(P, q, A, b, carry.x, carry.z, carry.s,
                                carry.tau, carry.kappa)
        x2, z2, x1, z1, ok1 = solve_xz2(-q, b, res.rx, carry.s - res.rz)
        return x2, z2, x1, z1, jnp.logical_and(ok, ok1)

    # chunked-execution handles (checkpoint/resume, host-side time limits)
    solve.prepare = prepare
    solve.run_phases = run_phases
    solve.finalize = finalize
    solve.probe_scaling = probe_scaling
    solve.probe_step = probe_step
    return solve
