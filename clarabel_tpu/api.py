"""Native solver API: Solver / setup / solve.

Mirrors the reference's user-facing API (`Solver(P,q,A,b,cones[,settings])`,
`setup!`, `solve!`, `get_solution`, `get_info`; reference:
src/solver.jl:5-29,75,189,532-534) with a host-side orchestration class
around a single jitted device computation.  Setup lowers the problem into a
static plan (cone layout, dimensions, presolve maps); solve dispatches one
XLA computation that runs the entire IPM on-chip.
"""

import dataclasses
import time
from typing import Optional, Sequence

import numpy as np
import scipy.sparse as sp

from .settings import Settings
from .statuscodes import SolverStatus, status_string
from .cones.api import SupportedCone, nvars, cones_collapse
from .cones.layout import ConeLayout
from .ipm.loop import build_solve
from . import presolver as presolve_mod


@dataclasses.dataclass
class DefaultSolution:
    """reference: src/types.jl:279-311"""
    x: np.ndarray
    z: np.ndarray
    s: np.ndarray
    status: SolverStatus
    obj_val: float
    obj_val_dual: float
    solve_time: float
    iterations: int
    r_prim: float
    r_dual: float

    def __repr__(self):
        return (
            f">>> clarabel_tpu - Results\nStatus: {status_string(self.status)}\n"
            f"Iterations: {self.iterations}\nObjective: {self.obj_val:#.4g}\n"
            f"Solve time: {self.solve_time:.3e}s"
        )


@dataclasses.dataclass
class DefaultInfo:
    """Scalar iteration metrics (reference: src/types.jl:198-251)."""
    mu: float = np.nan
    sigma: float = np.nan
    step_length: float = np.nan
    iterations: int = 0
    cost_primal: float = np.nan
    cost_dual: float = np.nan
    res_primal: float = np.nan
    res_dual: float = np.nan
    gap_abs: float = np.nan
    gap_rel: float = np.nan
    ktratio: float = np.nan
    solve_time: float = 0.0
    status: SolverStatus = SolverStatus.UNSOLVED


def _to_dense(M) -> np.ndarray:
    if sp.issparse(M):
        return np.asarray(M.todense())
    return np.asarray(M)


def _symmetrize_triu(P: np.ndarray) -> np.ndarray:
    """The API consumes only the upper-triangular part of P (matching the
    reference, src/solver.jl:48) and works with the full symmetric matrix
    internally."""
    U = np.triu(P)
    return U + U.T - np.diag(np.diag(U))


# compiled-solver cache keyed by problem structure.  Bounded LRU: a
# long-lived process creating many distinct structures would otherwise
# accumulate compiled executables without limit (each holds device
# buffers for its constants).  Re-setup of an evicted structure only
# pays a re-trace; XLA's own compilation cache still avoids recompiles.
_SOLVE_CACHE: "dict" = {}
_SOLVE_CACHE_MAX = 64


def _solve_cache_put(key, value):
    if key in _SOLVE_CACHE:
        _SOLVE_CACHE.pop(key)
    elif len(_SOLVE_CACHE) >= _SOLVE_CACHE_MAX:
        _SOLVE_CACHE.pop(next(iter(_SOLVE_CACHE)))
    _SOLVE_CACHE[key] = value


def _solve_cache_get(key):
    value = _SOLVE_CACHE.get(key)
    if value is not None:  # refresh LRU order
        _SOLVE_CACHE.pop(key)
        _SOLVE_CACHE[key] = value
    return value


class Solver:
    """Conic interior-point solver.

        solver = Solver(P, q, A, b, cones, settings)
        solution = solver.solve()

    solves  min ½x'Px + q'x  s.t. Ax + s = b, s ∈ K.
    """

    def __init__(self, P=None, q=None, A=None, b=None,
                 cones: Optional[Sequence[SupportedCone]] = None,
                 settings: Optional[Settings] = None, mesh=None, **kwargs):
        self.settings = settings if settings is not None else Settings()
        if kwargs:
            self.settings = dataclasses.replace(self.settings, **kwargs)
        self.solution: Optional[DefaultSolution] = None
        self.info = DefaultInfo()
        self._setup_done = False
        self._first_solve_time = None
        # multi-device factorization: a jax.sharding.Mesh with a `tp` axis
        # shards the block-arrow KKT factorization across devices (the
        # counterpart of the reference's parallel Pardiso backend,
        # reference: ext/directldl_pardiso.jl, src/settings.jl:108-110)
        self.mesh = mesh
        self._tp_axis = None
        if mesh is not None:
            self._tp_axis = ("tp" if "tp" in mesh.axis_names
                             else mesh.axis_names[0])
        if P is not None:
            self.setup(P, q, A, b, cones)

    # ------------------------------------------------------------------
    def _setup_sparse(self, P, q, A, b, cones, t0,
                      preprocessed: bool = False) -> bool:
        """Sparse-data setup: COO P/A end-to-end with map-based
        block-arrow KKT assembly.  Returns False (caller falls back to
        the dense path) when no usable structure is found.

        `preprocessed=True` skips presolve/chordal state resets (used when
        re-entering after the dense path already applied them, e.g. on
        chordal-decomposed output)."""
        from .linalg.matops import make_sparse_coo
        from .structure import analyze_block_arrow
        from .kkt.assembly_maps import build_assembly_maps
        from . import get_infinity

        P = sp.csr_matrix(P).astype(np.float64)
        A = sp.csr_matrix(A).astype(np.float64)
        if self.settings.input_sparse_dropzeros:
            # drop stored explicit zeros so they don't enter the KKT
            # pattern (reference: src/problemdata.jl dropzeros! under
            # input_sparse_dropzeros; disables data updating)
            P.eliminate_zeros()
            A.eliminate_zeros()
        n, m = q.shape[0], b.shape[0]
        if A.shape != (m, n) or P.shape != (n, n):
            raise ValueError("dimension mismatch")
        if sum(nvars(c) for c in cones) != m:
            raise ValueError(
                "Constraint dimensions inconsistent with size of cones"
            )

        if not preprocessed:
            cones = cones_collapse(list(cones))
            infinity = get_infinity()
            b = np.minimum(b, infinity)

            self.presolver = None
            if self.settings.presolve_enable:
                pres = presolve_mod.try_presolve(A, b, cones, infinity)
                if pres is not None:
                    self.presolver = pres
                    A = A[pres.keep_logical]
                    b = b[pres.keep_logical]
                    cones = pres.reduced_cones
                    m = b.shape[0]

            # chordal decomposition runs on the dense path; its output may
            # re-enter here with preprocessed=True
            self.chordal_info = None
            self._n_orig = n

        P_sym = (sp.triu(P) + sp.triu(P, 1).T).tocoo()
        A_coo = sp.coo_matrix(A)
        layout = ConeLayout(cones)
        if layout.m != m:
            raise ValueError("cone dimensions do not match constraint count")

        P_pat = ((P_sym.row, P_sym.col), (n, n))
        A_pat = ((A_coo.row, A_coo.col), (m, n))
        from .structure_nd import analyze_nested_dissection
        from .kkt.assembly_maps_nd import build_nested_assembly_maps

        # large SOCs use the rank-2 Hs representation (diag-only assembly
        # + SMW correction, kkt/socrank.py) so sparse mode never
        # materializes O(d²) Hs entries per cone; their rows also stay
        # singletons in the structure graph instead of one huge supernode
        from .cones.ops import SOC_RANK2_MIN_DIM

        srk = SOC_RANK2_MIN_DIM if any(
            g.kind in ("soc", "genpow") and g.width >= SOC_RANK2_MIN_DIM
            for g in layout.groups.values()
        ) else None

        requested = self.settings.kkt_backend
        ba_plan = nd_plan = None
        if self.mesh is not None:
            # multi-device: the sharded factorization is block-arrow only
            ba_plan = analyze_block_arrow(P_pat, A_pat, layout,
                                          soc_rank2_min_dim=srk)
            if ba_plan is None:
                raise ValueError(
                    "multi-device solve (mesh=...) requires block-arrow "
                    "structure in the KKT pattern; none was found"
                )
            from .structure import pad_plan_blocks

            ba_plan = pad_plan_blocks(
                ba_plan, self.mesh.shape[self._tp_axis]
            )
        elif requested != "multifrontal":
            ba_plan = analyze_block_arrow(P_pat, A_pat, layout,
                                          soc_rank2_min_dim=srk)
        if requested != "blockarrow" and self.mesh is None and srk is None:
            # the SMW rank-2 path is implemented on the block-arrow
            # backend; skip nested dissection when large SOCs are present
            nd_plan = analyze_nested_dissection(P_pat, A_pat, layout)
        # pick the structurally cheaper factorization (grids/meshes have
        # large single-level separators: multilevel wins there)
        if ba_plan is not None and nd_plan is not None:
            if nd_plan.flop_estimate() < ba_plan.flop_estimate():
                ba_plan = None
            else:
                nd_plan = None
        if self.mesh is None and srk is None and ba_plan is not None \
                and n + m <= 4096 and (
            ba_plan.flop_estimate() > 0.5 * (n + m) ** 3 / 3.0
        ):
            # the "structure" doesn't beat a dense factorization by a
            # useful margin and the problem is small enough to represent
            # densely: let the dense path pick condensed/ldl instead
            ba_plan = None
        if ba_plan is not None:
            plan = ba_plan
            maps = build_assembly_maps(
                (P_sym.row, P_sym.col), (A_coo.row, A_coo.col), layout,
                plan, soc_rank2_min_dim=srk,
            )
        elif nd_plan is not None:
            plan = nd_plan
            maps = build_nested_assembly_maps(
                (P_sym.row, P_sym.col), (A_coo.row, A_coo.col), layout,
                plan,
            )
        else:
            return False

        self._P_full = P_sym.tocsr()
        self._q, self._A, self._b = q, A, b
        self.n, self.m = n, m
        self.cones = list(cones)
        self.layout = layout
        self._p_nonzero = P_sym.nnz > 0
        self._structure = plan
        self._backend = ("blockarrow" if ba_plan is not None
                         else "multifrontal")
        self._sparse_mode = True
        self._data_args = (
            make_sparse_coo(P_sym), q, make_sparse_coo(A_coo), b,
        )

        # sparse warm-update state: the symmetric-P COO / A COO entry
        # order is frozen at setup; data updates rewrite only the value
        # arrays (reference: src/data_updating.jl nzval writes into KKT
        # via index maps; here the map is COO-data-order alignment)
        from .data_updating import SparseUpdateMaps

        self._sparse_maps = SparseUpdateMaps.build(P_sym, A_coo, n)

        cache_key = (layout.key, n, self._p_nonzero, "sparse",
                     dataclasses.astuple(self.settings), maps.key,
                     self.mesh, self._tp_axis)
        cached = _solve_cache_get(cache_key)
        if cached is None:
            import jax

            base = build_solve(layout, self.settings, n, self._p_nonzero,
                               structure=plan, assembly=maps,
                               mesh=self.mesh,
                               tp_axis=self._tp_axis or "tp")
            cached = (
                jax.jit(base), jax.jit(base.prepare),
                jax.jit(base.run_phases), jax.jit(base.finalize), base,
            )
            _solve_cache_put(cache_key, cached)
        (self._solve_fn, self._prepare_fn, self._chunk_fn,
         self._finalize_fn, self._base_fn) = cached

        self._setup_time = time.perf_counter() - t0
        self._setup_done = True
        return True

    def setup(self, P, q, A, b, cones: Sequence[SupportedCone]):
        """reference: src/solver.jl:89-153"""
        t0 = time.perf_counter()
        from . import get_infinity

        q = np.asarray(q, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()

        # sparse data mode: keep scipy-sparse inputs in COO form
        # end-to-end (map-based structured KKT assembly; no dense N² data)
        want_sparse = self.settings.sparse_data
        if want_sparse is None:
            # big SOC/genpow cones route through the sparse low-rank
            # (diag + SMW) path even for dense inputs: the augmented
            # system with the exact low-rank Hs is much better
            # conditioned than the condensed normal equations (measured:
            # dim-121-SOC robust-LS solves in 8 iters to 1e-11 vs
            # stalling ALMOST at 9e-7 after 23), and the dense LDL
            # suffers pivot growth on this class
            from .cones.api import SecondOrderConeT, GenPowerConeT
            from .cones.ops import SOC_RANK2_MIN_DIM

            has_big_lowrank = cones is not None and any(
                isinstance(c, (SecondOrderConeT, GenPowerConeT))
                and nvars(c) >= SOC_RANK2_MIN_DIM
                for c in cones
            )
            if has_big_lowrank and not sp.issparse(A):
                # only take the COO-scatter assembly pipeline when the
                # data is actually sparse: pushing a dense A through the
                # per-nonzero maps makes XLA's scatter compilation
                # explode (measured: >10 min compile on a dense-F
                # robust-LS m=800 that condensed solves in ~2 s), and
                # condensed handles dense big-SOC problems well
                Ad = np.asarray(A)
                nz = np.count_nonzero(Ad)
                has_big_lowrank = nz <= 0.10 * Ad.size
            want_sparse = has_big_lowrank or (
                sp.issparse(A)
                and q.shape[0] + b.shape[0] > 2000
            )
        if want_sparse:
            done = self._setup_sparse(P, q, A, b, cones, t0)
            if done:
                return self
            # fall through to the dense path when no structure was found

        P = _to_dense(P).astype(np.float64)
        A = _to_dense(A).astype(np.float64)

        # dimension checks (reference: src/solver.jl:157-169)
        n, m = q.shape[0], b.shape[0]
        if A.shape != (m, n):
            raise ValueError("A and b or q have incompatible dimensions")
        if P.shape != (n, n):
            raise ValueError("P is not n-by-n")
        pdim = sum(nvars(c) for c in cones)
        if pdim != m:
            raise ValueError(
                "Constraint dimensions inconsistent with size of cones"
            )

        # cone collapsing (reference: cone_api.jl:96-153)
        cones = cones_collapse(list(cones))

        # cap b at +infinity (reference: src/problemdata.jl:~60 b=min(b,INF))
        infinity = get_infinity()
        b = np.minimum(b, infinity)

        # presolve (reference: src/presolver.jl)
        self.presolver = None
        if self.settings.presolve_enable:
            pres = presolve_mod.try_presolve(A, b, cones, infinity)
            if pres is not None:
                self.presolver = pres
                A, b = presolve_mod.presolve_reduce(pres, A, b)
                cones = pres.reduced_cones
                m = b.shape[0]

        # chordal decomposition of sparse PSD cones
        # (reference: src/chordal/, applied inside DefaultProblemData ctor)
        self.chordal_info = None
        self._n_orig = n
        P_sym0 = _symmetrize_triu(P)
        from .chordal import try_chordal_decomposition

        chordal = try_chordal_decomposition(
            P_sym0, q, A, b, list(cones), self.settings
        )
        if chordal is not None:
            self.chordal_info, P_sym0, q, A, b, cones = chordal
            P = P_sym0
            n, m = A.shape[1], A.shape[0]
            # a large decomposed problem (many clique-sized cones +
            # overlap columns) is usually sparse: try the sparse pipeline
            # on the transformed data
            if n + m > 2000:
                chordal_info = self.chordal_info
                n_orig = self._n_orig
                if self._setup_sparse(P_sym0, q, A, b, list(cones), t0,
                                      preprocessed=True):
                    self.chordal_info = chordal_info
                    self._n_orig = n_orig
                    return self

        self._P_full = P_sym0
        self._q = q
        self._A = A
        self._b = b
        self.n, self.m = n, m
        self._sparse_mode = False
        self._data_args = None  # filled below (dense arrays)
        self.cones = list(cones)
        self.layout = ConeLayout(self.cones)
        if self.layout.m != m:
            raise ValueError("cone dimensions do not match constraint count")
        p_nonzero = bool(np.any(self._P_full != 0))
        self._p_nonzero = p_nonzero

        # block-arrow structure detection (host-side, pattern-based):
        # explicit "blockarrow", or "auto" probes for structure on
        # larger problems and uses it when a good separator exists
        self._structure = None
        backend = self.settings.kkt_backend
        if self.mesh is not None:
            from .structure import analyze_block_arrow, pad_plan_blocks

            plan = analyze_block_arrow(
                self._P_full != 0, self._A != 0, self.layout
            )
            if plan is None:
                raise ValueError(
                    "multi-device solve (mesh=...) requires block-arrow "
                    "structure in the KKT pattern; none was found"
                )
            self._structure = pad_plan_blocks(
                plan, self.mesh.shape[self._tp_axis]
            )
            backend = "blockarrow"
        elif backend == "blockarrow" or (
            backend == "auto" and n + m > 1024
        ):
            from .structure import analyze_block_arrow

            self._structure = analyze_block_arrow(
                self._P_full != 0, self._A != 0, self.layout
            )
        if backend == "multifrontal" or (backend == "auto" and n + m > 1024):
            # multilevel nested dissection: wins when the single-level
            # separator is large (grids/meshes); compared by flop estimate
            from .structure_nd import analyze_nested_dissection

            nd_plan = analyze_nested_dissection(
                self._P_full != 0, self._A != 0, self.layout
            )
            if nd_plan is not None and (
                self._structure is None
                or nd_plan.flop_estimate()
                < self._structure.flop_estimate()
            ):
                self._structure = nd_plan
        if backend == "auto":
            # pick the cheapest factorization by flop estimate: a detected
            # structure plan must beat dense by 2x to be worth the extra
            # indexing machinery, and for large tall zero-cone-free
            # problems the condensed (normal-equations) backend eliminates
            # the conic block analytically (robust-LS m=2000/n=500:
            # condensed 1.8s vs blocked-LDL 12.7s vs a *useless*
            # block-arrow "structure" at 15.8s measured)
            from .structure_nd import NestedPlan

            N = n + m
            dense_flops = N ** 3 / 3.0
            st_flops = (self._structure.flop_estimate()
                        if self._structure is not None else float("inf"))
            # condensed also when a big SOC is present: its dense Hs
            # block breaks the unpermuted dense LDL's pivot growth when
            # P contributes no diagonal (measured: NUMERICAL_ERROR at
            # iteration 1 on a dim-241-SOC robust-LS; condensed's
            # closed-form Hs⁻¹ + refinement solves it to 1e-8)
            from .cones.ops import SOC_RANK2_MIN_DIM

            big_soc = any(
                g.kind == "soc" and g.width >= SOC_RANK2_MIN_DIM
                for g in self.layout.groups.values()
            )
            # zero cones no longer gate condensed: equality rows enter
            # the normal equations through mul_Hs_inv's 1/eps diagonal
            # with refinement against the true KKT (same convention the
            # fused megakernel uses); measured exact-match solutions on
            # the cvxqp/aug2d classes and 1.8x over dense LDL on TPU
            # (round 3)
            tall = (m >= 2.5 * n and m >= 250) or big_soc
            cond_flops = (2.0 * m * n * n + n ** 3 / 3.0) if tall \
                else float("inf")
            if st_flops <= min(0.5 * dense_flops, cond_flops):
                backend = ("multifrontal"
                           if isinstance(self._structure, NestedPlan)
                           else "blockarrow")
            elif tall:
                backend = "condensed"
                self._structure = None
            else:
                backend = "ldl"
                self._structure = None
        self._backend = backend

        cache_key = (self.layout.key, n, p_nonzero, backend,
                     dataclasses.astuple(self.settings),
                     None if self._structure is None else self._structure.key,
                     self.mesh, self._tp_axis)
        cached = _solve_cache_get(cache_key)
        if cached is None:
            import jax

            base = build_solve(self.layout, self.settings, n, p_nonzero,
                               structure=self._structure,
                               kkt_backend=backend,
                               mesh=self.mesh,
                               tp_axis=self._tp_axis or "tp")
            cached = (
                jax.jit(base),
                jax.jit(base.prepare),
                jax.jit(base.run_phases),
                jax.jit(base.finalize), base,
            )
            _solve_cache_put(cache_key, cached)
        (self._solve_fn, self._prepare_fn, self._chunk_fn,
         self._finalize_fn, self._base_fn) = cached

        self._setup_time = time.perf_counter() - t0
        self._setup_done = True
        self._dev_args = None   # device-resident warm-solve cache
        return self

    # ------------------------------------------------------------------
    def solve(self) -> DefaultSolution:
        """reference: src/solver.jl:189-380"""
        if not self._setup_done:
            raise RuntimeError("call setup() before solve()")
        if self.settings.verbose:
            from . import info_print

            info_print.print_banner()
            info_print.print_configuration(self)
            info_print.print_status_header()
        t0 = time.perf_counter()
        args = (self._data_args if self._data_args is not None
                else (self._P_full, self._q, self._A, self._b))
        if np.isfinite(self.settings.time_limit):
            out = self._solve_chunked(t0)
        elif self.settings.timing:
            out = self._solve_timed(args)
        else:
            # warm re-solves reuse device-resident problem data: the
            # H2D transfer of unchanged arrays costs a full tunnel
            # latency floor per solve (~30 ms — the entire gap on
            # 0-iteration warm solves like AUG2D, docs/PERF.md);
            # update_data invalidates the cache (data_updating.py).
            import jax as _jax

            if getattr(self, "_dev_args", None) is None:
                try:
                    self._dev_args = tuple(
                        _jax.device_put(a) for a in args)
                except (TypeError, ValueError):
                    self._dev_args = args  # scipy-sparse: leave host
            out = self._solve_fn(*self._dev_args)
        # ONE batched fetch: per-field np.asarray pays a full
        # host<->device round trip each (~2-20 ms over the TPU tunnel
        # x ~18 fields; measured 439 ms total on a 0-iteration solve)
        import jax

        out = jax.device_get(out)
        solve_time = time.perf_counter() - t0
        if self._first_solve_time is None:
            self._first_solve_time = solve_time
        return self._package_solution(out, solve_time)

    def _package_solution(self, out, solve_time) -> DefaultSolution:
        status = SolverStatus(int(out["status"]))
        x = out["x"]
        z, s = out["z"], out["s"]

        # reverse chordal decomposition (reference: src/solution.jl:31-36)
        if self.chordal_info is not None:
            from .chordal.decomp import decomp_reverse

            x, z, s = decomp_reverse(
                self.chordal_info, x, z, s, self.cones, self.settings
            )

        # reverse presolve (reference: src/presolver.jl:85-107)
        if self.presolver is not None:
            z, s = presolve_mod.presolve_reverse(self.presolver, z, s)

        self.solution = DefaultSolution(
            x=x, z=z, s=s, status=status,
            obj_val=float(out["obj_val"]),
            obj_val_dual=float(out["obj_val_dual"]),
            solve_time=solve_time,
            iterations=int(out["iterations"]),
            r_prim=float(out["r_prim"]),
            r_dual=float(out["r_dual"]),
        )
        self.info = DefaultInfo(
            mu=float(out["mu"]), sigma=float(out["sigma"]),
            step_length=float(out["step_length"]),
            iterations=int(out["iterations"]),
            cost_primal=float(out["obj_val"]),
            cost_dual=float(out["obj_val_dual"]),
            res_primal=float(out["r_prim"]), res_dual=float(out["r_dual"]),
            gap_abs=float(out["gap_abs"]), gap_rel=float(out["gap_rel"]),
            ktratio=float(out["ktratio"]),
            solve_time=solve_time, status=status,
        )
        if self.settings.verbose:
            from . import info_print

            info_print.print_footer(self.solution)
        return self.solution

    # ------------------------------------------------------------------
    def _solve_chunked(self, t0, chunk_iters: int = 25,
                       checkpoint_cb=None, carry=None):
        """Chunked execution: run the jitted loop `chunk_iters` IPM
        iterations at a time, enforcing the wall-clock time limit between
        chunks (reference checks solve_time per iteration,
        src/info.jl:109-116) and optionally checkpointing the IPM state.
        """
        import jax.numpy as jnp

        args = (self._data_args if self._data_args is not None
                else (self._P_full, self._q, self._A, self._b))
        data, carry0 = self._prepare_fn(*args)
        if carry is None:
            carry = carry0
        while True:
            cap = jnp.asarray(int(carry.iters) + chunk_iters, jnp.int32)
            carry = self._chunk_fn(data, carry, cap)
            if checkpoint_cb is not None:
                checkpoint_cb(carry)
            if int(carry.status) != int(SolverStatus.UNSOLVED):
                break
            if time.perf_counter() - t0 > self.settings.time_limit:
                carry = carry._replace(
                    status=jnp.asarray(int(SolverStatus.MAX_TIME), jnp.int32)
                )
                break
        self._last_carry = carry
        return self._finalize_fn(data, carry)

    def save_checkpoint(self, path: str):
        """Serialize the most recent IPM state (from a chunked solve)."""
        if getattr(self, "_last_carry", None) is None:
            raise RuntimeError("no IPM state available; run a chunked solve")
        import jax

        arrs = jax.device_get(self._last_carry._asdict())
        np.savez(path, **arrs)

    def resume_from_checkpoint(self, path: str) -> DefaultSolution:
        """Continue a solve from a saved IPM state."""
        from .ipm.loop import Carry

        with np.load(path) as f:
            carry = Carry(**{k: f[k] for k in f.files})
        t0 = time.perf_counter()
        out = self._solve_chunked(t0, carry=carry)
        # ONE batched fetch: per-field np.asarray pays a full
        # host<->device round trip each (~2-20 ms over the TPU tunnel
        # x ~18 fields; measured 439 ms total on a 0-iteration solve)
        import jax

        out = jax.device_get(out)
        return self._package_solution(out, time.perf_counter() - t0)

    def get_solution(self) -> Optional[DefaultSolution]:
        return self.solution

    def get_info(self) -> DefaultInfo:
        return self.info

    # data updating for warm re-solves (reference: src/data_updating.jl)
    def update_data(self, P=None, q=None, A=None, b=None):
        from . import data_updating as du

        du.update_data(self, P, q, A, b)

    def update_P(self, P):
        from . import data_updating as du

        du.update_P(self, P)

    def update_q(self, q):
        from . import data_updating as du

        du.update_q(self, q)

    def update_A(self, A):
        from . import data_updating as du

        du.update_A(self, A)

    def update_b(self, b):
        from . import data_updating as du

        du.update_b(self, b)

    def is_data_update_allowed(self) -> bool:
        from .data_updating import _check_update_allowed

        try:
            _check_update_allowed(self)
            return True
        except ValueError:
            return False

    def linear_solver_info(self) -> dict:
        """Backend description (reference: LinearSolverInfo, src/types.jl;
        nnz(L) becomes the dense factor size)."""
        N = self.n + self.m
        backend = self.settings.kkt_backend
        if backend == "auto":
            backend = "ldl"
        variant = (
            "blocked" if (backend == "ldl" and N > 512) else "unblocked"
        )
        return {
            "backend": backend,
            "variant": variant,
            "kkt_dim": N,
            "factor_nnz": N * (N + 1) // 2 if backend == "ldl" else
            self.n * (self.n + 1) // 2,
            "factor_dtype": self.settings.factor_dtype or "auto",
            "mixed_precision": self.settings.mixed_precision,
        }

    def profile_trace(self, log_dir: str):
        """Context manager capturing a device profile of solves inside it
        (the TPU counterpart of the reference's TimerOutputs tree;
        inspect with TensorBoard / xprof)."""
        import jax

        return jax.profiler.trace(log_dir)

    def _solve_timed(self, args):
        """Staged execution with sync-point timing: prepare (equilibration
        + initial point), the IPM loop, finalize — the same jitted stages
        the chunked path uses, so results are identical to the fused
        program's."""
        import jax
        import jax.numpy as jnp

        t0 = time.perf_counter()
        data, carry0 = self._prepare_fn(*args)
        jax.block_until_ready(carry0)
        t1 = time.perf_counter()
        final = self._chunk_fn(data, carry0, jnp.asarray(2**30, jnp.int32))
        jax.block_until_ready(final)
        t2 = time.perf_counter()
        out = self._finalize_fn(data, final)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        self._timers = {
            "prepare": t1 - t0,
            "loop": t2 - t1,
            "finalize": t3 - t2,
            "iterations": int(final.iters),
        }
        self._timed_state = (data, final)
        return out

    def _probe_phase_times(self):
        """Device-time the per-iteration sub-phases at the final IPM state
        (warm-compiled, best of 3)."""
        import jax

        data, carry = self._timed_state
        probes = {
            "cone scaling update": jax.jit(self._base_fn.probe_scaling),
            "scaling + KKT factor + 2-RHS solve":
                jax.jit(self._base_fn.probe_step),
        }
        times = {}
        for name, fn in probes.items():
            jax.block_until_ready(fn(data, carry))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(data, carry))
                best = min(best, time.perf_counter() - t0)
            times[name] = best
        return times

    def print_timers(self):
        """Phase timing tree (reference: print_timers, src/solver.jl:534,
        TimerOutputs tree src/types.jl:362-372).  With
        Settings(timing=True), solves run as staged dispatches and the
        tree shows measured per-phase times plus device probes of the
        per-iteration hot path; otherwise only host-visible totals."""
        print(f"setup:                        {self._setup_time:10.4f} s")
        if self._first_solve_time is not None:
            print(f"solve (first, incl. compile): "
                  f"{self._first_solve_time:10.4f} s")
        if self.solution is not None:
            print(f"solve (last):                 "
                  f"{self.solution.solve_time:10.4f} s")
        timers = getattr(self, "_timers", None)
        if timers is None:
            print("  (enable Settings(timing=True) for the phase tree)")
            return
        iters = max(1, timers["iterations"])
        print(f"  ├ prepare (equilibration + initial point): "
              f"{timers['prepare']:.4f} s")
        print(f"  ├ IPM loop ({timers['iterations']} iterations): "
              f"{timers['loop']:.4f} s  "
              f"({timers['loop'] / iters * 1e3:.2f} ms/iter)")
        if getattr(self, "_timed_state", None) is not None:
            for name, t in self._probe_phase_times().items():
                print(f"  │   ├ {name}: {t * 1e3:.2f} ms")
        print(f"  └ finalize (unscale + certificates): "
              f"{timers['finalize']:.4f} s")
