"""CVXPY solver interface for clarabel_tpu.

The Python-ecosystem analogue of the reference's MOI wrapper (reference:
src/MOI_wrapper/MOI_wrapper.jl) — it adapts a modeling tool's conic
standard form onto the native `Solver` API.  CVXPY's conic form

    min  cᵀx   s.t.  Ax + s = b,  s ∈ K

is already this solver's geometry (the reference flips constraint signs
the same way, MOI_wrapper.jl:625-673), so `apply` is a direct cone-order
mapping and `invert` a status/value repack.

Usage (requires cvxpy ≥ 1.3, optional dependency):

    import cvxpy as cp
    from clarabel_tpu.interop.cvxpy_interface import ClarabelTPU
    prob.solve(solver=ClarabelTPU())

Cones supported: zero, nonnegative, SOC, PSD (scaled triangle — CVXPY's
svec convention matches the reference's √2 off-diagonal scaling),
exponential, 3-d power, and n-d power (PowConeND → generalized power
cone, mirroring the reference's MOI GenPowerCone extension).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only when cvxpy is installed
    import cvxpy.settings as cvx_s
    from cvxpy.constraints import (
        ExpCone, NonNeg, PowCone3D, PSD, SOC, Zero,
    )
    try:
        from cvxpy.constraints import PowConeND
    except ImportError:  # older cvxpy
        PowConeND = None
    from cvxpy.reductions.solution import Solution, failure_solution
    from cvxpy.reductions.solvers.conic_solvers.conic_solver import (
        ConicSolver, dims_to_solver_dict,
    )

    _HAVE_CVXPY = True
except ImportError:  # pragma: no cover
    _HAVE_CVXPY = False

    class ConicSolver:  # type: ignore[no-redef]
        """Import-time stand-in so this module can be imported (and the
        class introspected) without cvxpy installed."""

        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)


def _status_map(status):
    from ..statuscodes import SolverStatus

    s = cvx_s
    return {
        SolverStatus.SOLVED: s.OPTIMAL,
        SolverStatus.ALMOST_SOLVED: s.OPTIMAL_INACCURATE,
        SolverStatus.PRIMAL_INFEASIBLE: s.INFEASIBLE,
        SolverStatus.ALMOST_PRIMAL_INFEASIBLE: s.INFEASIBLE_INACCURATE,
        SolverStatus.DUAL_INFEASIBLE: s.UNBOUNDED,
        SolverStatus.ALMOST_DUAL_INFEASIBLE: s.UNBOUNDED_INACCURATE,
        SolverStatus.MAX_ITERATIONS: s.USER_LIMIT,
        SolverStatus.MAX_TIME: s.USER_LIMIT,
    }.get(status, s.SOLVER_ERROR)


class ClarabelTPU(ConicSolver):
    """CVXPY conic solver backed by clarabel_tpu.

    Pass an *instance* to `problem.solve(solver=ClarabelTPU())` (CVXPY's
    custom-solver mechanism), optionally with Settings overrides:
    `ClarabelTPU(settings=Settings(max_iter=50))` or keyword overrides
    forwarded to Settings.
    """

    MIP_CAPABLE = False
    REQUIRES_CONSTR = True

    if _HAVE_CVXPY:
        SUPPORTED_CONSTRAINTS = [Zero, NonNeg, SOC, PSD, ExpCone,
                                 PowCone3D]
        if PowConeND is not None:
            SUPPORTED_CONSTRAINTS.append(PowConeND)

    def __init__(self, settings=None, **kwargs):
        if not _HAVE_CVXPY:
            raise ImportError(
                "cvxpy is not installed; the ClarabelTPU CVXPY interface "
                "requires it (pip install cvxpy)"
            )
        self._settings = settings
        self._overrides = kwargs

    # -- cvxpy Solver protocol -------------------------------------------
    def name(self):
        return "CLARABEL_TPU"

    def import_solver(self):
        import clarabel_tpu  # noqa: F401

    def supports_quad_obj(self) -> bool:
        # native quadratic objectives — no epigraph reformulation needed
        # (the reference advertises the same through MOI, README.md:50-57)
        return True

    def apply(self, problem):
        return super().apply(problem)

    def solve_via_data(self, data, warm_start, verbose, solver_opts,
                       solver_cache=None):
        import clarabel_tpu as ct

        A = data[cvx_s.A]
        b = data[cvx_s.B]
        c = data[cvx_s.C]
        n = c.shape[0]
        P = data.get(cvx_s.P, None)
        cone_dims = dims_to_solver_dict(data["dims"])

        cones = []
        if cone_dims["z"]:
            cones.append(ct.ZeroConeT(cone_dims["z"]))
        if cone_dims["l"]:
            cones.append(ct.NonnegativeConeT(cone_dims["l"]))
        for dim in cone_dims["q"]:
            cones.append(ct.SecondOrderConeT(dim))
        for dim in cone_dims["s"]:
            cones.append(ct.PSDTriangleConeT(dim))
        for _ in range(cone_dims["ep"]):
            cones.append(ct.ExponentialConeT())
        for alpha in cone_dims["p3d"]:
            cones.append(ct.PowerConeT(alpha))
        # n-dimensional power cones (cvxpy PowConeND -> generalized power
        # cone; the reference ships the analogous MOI extension,
        # reference: src/MOI_wrapper/MOI_extensions.jl:12-26)
        for alpha in cone_dims.get("pnd", []):
            alpha = np.asarray(alpha, dtype=np.float64).ravel()
            cones.append(ct.GenPowerConeT(alpha, 1))

        settings = self._settings if self._settings is not None else ct.Settings()
        import dataclasses

        opts = dict(self._overrides)
        opts.update(solver_opts or {})
        opts.setdefault("verbose", bool(verbose))
        valid = {f.name for f in dataclasses.fields(ct.Settings)}
        opts = {k: v for k, v in opts.items() if k in valid}
        settings = dataclasses.replace(settings, **opts)

        solver = ct.Solver(
            P if P is not None else np.zeros((n, n)),
            np.asarray(c, dtype=np.float64),
            A, np.asarray(b, dtype=np.float64), cones, settings,
        )
        return solver.solve()

    def invert(self, solution, inverse_data):
        status = _status_map(solution.status)
        attr = {
            cvx_s.SOLVE_TIME: solution.solve_time,
            cvx_s.NUM_ITERS: solution.iterations,
            cvx_s.EXTRA_STATS: solution,
        }
        if status in (cvx_s.OPTIMAL, cvx_s.OPTIMAL_INACCURATE,
                      cvx_s.USER_LIMIT):
            primal_val = solution.obj_val
            opt_val = primal_val + inverse_data[cvx_s.OFFSET]
            primal_vars = {
                inverse_data[self.VAR_ID]: np.asarray(solution.x)
            }
            dual_vars = {
                inverse_data[self.DUAL_VAR_ID]: np.asarray(solution.z)
            }
            return Solution(status, opt_val, primal_vars, dual_vars, attr)
        return failure_solution(status, attr)
