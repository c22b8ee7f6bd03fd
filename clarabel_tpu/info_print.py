"""Console reporting: banner, problem configuration, iteration rows, footer.

Mirrors the reference's verbose output (reference: src/info_print.jl):
banner + cone census + settings summary before the solve, a per-iteration
status row during it, and a footer after.  Because the iteration loop is a
single jitted device computation, the per-iteration rows are emitted with
`jax.debug.print` from inside the loop body.
"""

def print_banner():
    from . import __version__

    print("-------------------------------------------------------------")
    print(f"           clarabel_tpu v{__version__}  -  TPU-native conic IPM")
    print("                (c) clarabel_tpu developers")
    print("-------------------------------------------------------------")


def print_configuration(solver):
    layout = solver.layout
    print(f"problem:\n  variables     = {solver.n}")
    print(f"  constraints   = {solver.m}")
    counts = layout.type_counts()
    print("  cones (total) = " + str(len(layout.cones)))
    for name, cnt in sorted(counts.items()):
        print(f"    : {name} = {cnt}")
    s = solver.settings
    print(
        f"settings:\n  dtype = {s.dtype}, "
        f"factor dtype = {s.factor_dtype or 'auto'}\n"
        f"  max iter = {s.max_iter}, tol_gap = {s.tol_gap_abs:g}, "
        f"tol_feas = {s.tol_feas:g}\n"
        f"  static reg = {s.static_regularization_enable} "
        f"({s.static_regularization_constant:g}), "
        f"dynamic reg = {s.dynamic_regularization_enable} "
        f"({s.dynamic_regularization_eps:g}, {s.dynamic_regularization_delta:g})\n"
        f"  iter refine = {s.iterative_refinement_enable} "
        f"(reltol {s.iterative_refinement_reltol:g}), "
        f"equilibrate = {s.equilibrate_enable} "
        f"({s.equilibrate_max_iter} iters)"
    )
    if solver.presolver is not None:
        print(
            f"presolve: reduced rows {solver.presolver.m_full} -> "
            f"{solver.presolver.m_reduced}"
        )
    if getattr(solver, "chordal_info", None) is not None:
        npat = len(solver.chordal_info.spatterns)
        print(f"chordal decomposition: {npat} PSD cone(s) decomposed")


def print_status_header():
    print(
        "iter    pcost        dcost       gap       pres      dres      "
        "k/t        μ       step"
    )
    print(
        "-----------------------------------------------------------------"
        "-----------------------"
    )


def debug_print_iteration(iters, info, mu, alpha):
    """Per-iteration row from inside the jitted loop."""
    import jax

    jax.debug.print(
        "{i:4d}  {pc: .4e}  {dc: .4e}  {ga:.2e}  {pr:.2e}  {dr:.2e}  "
        "{kt:.2e}  {mu:.2e}  {st:.2e}",
        i=iters, pc=info.cost_primal, dc=info.cost_dual, ga=info.gap_rel,
        pr=info.res_primal, dr=info.res_dual, kt=info.ktratio, mu=mu,
        st=alpha,
    )


def print_footer(solution):
    from .statuscodes import status_string

    print("-------------------------------------------------------------")
    print(
        f"terminated with status: {status_string(solution.status)}\n"
        f"solve time = {solution.solve_time:.3e}s, "
        f"iterations = {solution.iterations}, "
        f"objective = {solution.obj_val:.9g}"
    )
