"""BatchSolver: solve thousands of same-structure conic programs at once.

Design: `build_solve` produces a pure function of the data arrays
(P, q, A, b) for a fixed cone layout; `jax.vmap` of that function IS the
batched solver.  Under vmap, the IPM `lax.while_loop` executes until every
instance has terminated; instances that finish early pass through the
status-gated no-op branch of the loop body, which is exactly the
"convergence masking" strategy (BASELINE.md batched-SOCP config).
"""

import dataclasses
import time
from typing import Optional, Sequence

import numpy as np

from ..settings import Settings
from ..statuscodes import SolverStatus
from ..cones.api import SupportedCone, cones_collapse
from ..cones.layout import ConeLayout
from ..ipm.loop import build_solve


class BatchSolution:
    """Batched solve result.  x/status/obj_val/iterations are eager
    numpy; z/s/r_prim/r_dual may be LAZY (megakernel backend): they stay
    on device until first accessed, because over the TPU tunnel they
    are ~5x the eager fields' bytes and most callers never read them
    (ipm/megakernel.LazyOutputs)."""

    def __init__(self, out, solve_time: float):
        self._out = out
        self.x = np.asarray(out["x"])
        self.status = np.asarray(out["status"])
        self.obj_val = np.asarray(out["obj_val"])
        self.iterations = np.asarray(out["iterations"])
        self.solve_time = solve_time

    @property
    def z(self) -> np.ndarray:
        return np.asarray(self._out["z"])

    @property
    def s(self) -> np.ndarray:
        return np.asarray(self._out["s"])

    @property
    def r_prim(self) -> np.ndarray:
        return np.asarray(self._out["r_prim"])

    @property
    def r_dual(self) -> np.ndarray:
        return np.asarray(self._out["r_dual"])

    @property
    def all_solved(self) -> bool:
        return bool(np.all(self.status == int(SolverStatus.SOLVED)))


def _next_pow2(k: int) -> int:
    return 1 << max(0, (k - 1)).bit_length()


def _symmetrize_triu(P):
    """(B, n, n) per-instance P_sym = triu(P,1) + triu(P,1)' + diag(P):
    accepts either full-symmetric or upper-triangular input."""
    U = np.triu(P, 1)
    eye = np.eye(P.shape[-1])
    diag = np.diagonal(P, axis1=-2, axis2=-1)
    return U + np.swapaxes(U, -1, -2) + diag[..., None, :] * eye


class BatchSolver:
    """Batched solver over instances sharing one cone layout.

        bs = BatchSolver(cones, n, settings)
        sol = bs.solve(P, q, A, b)     # leading batch axis on every array
    """

    def __init__(self, cones: Sequence[SupportedCone], n: int,
                 settings: Optional[Settings] = None, mesh=None,
                 p_nonzero: bool = True, rescue: Optional[str] = None,
                 rescue_settings: Optional[Settings] = None):
        """`rescue`: optional second pass over lanes that did not reach
        SOLVED — "cpu" re-solves them on the host CPU (native f64: TPU
        f64 is ~2^-49 float-float emulation, and on marginal instances
        the last half-digit of KKT accuracy is out of reach on-chip),
        "same" re-solves on the same device with full-f64 settings.
        Only the failed lanes pay the slow path, so the batch meets the
        reference's "all instances converged to 1e-8" acceptance at a
        few-percent wall cost (BASELINE.md)."""
        import jax

        self.settings = settings if settings is not None else Settings()
        self.cones = cones_collapse(list(cones))
        self.layout = ConeLayout(self.cones)
        self.n = n
        self.m = self.layout.m
        self._mesh = mesh
        self._rescue = rescue
        self._rescue_fn = None
        self._rescue_device = None

        # batched workloads: "auto" resolves to the fused megakernel on
        # TPU when the layout is eligible (measured ~14x the vmapped XLA
        # loop at identical 1e-8 accuracy, round 3), else to the
        # condensed backend — fastest XLA path for vmapped small
        # instances (few large batched ops instead of per-column
        # elimination kernels)
        backend = self.settings.kkt_backend
        if backend == "auto":
            from ..ipm import megakernel as _mk

            if (mesh is None
                    and jax.default_backend() not in ("cpu",)
                    and _mk.eligible(self.layout, self.settings, n)):
                backend = "megakernel"
            elif not any(g.kind == "zero"
                         for g in self.layout.groups.values()):
                backend = "condensed"

        # "megakernel": the whole batched solve as ONE Pallas kernel per
        # 1024-lane block (ipm/megakernel.py) — eliminates the per-op
        # dispatch latency that bounds the vmapped XLA loop.  The rescue
        # pass and the per-lane output schema are identical, so the rest
        # of this class is backend-agnostic.
        self._mega_fn = None
        if backend == "megakernel":
            from ..ipm import megakernel

            if mesh is not None:
                raise ValueError("megakernel does not support mesh=")
            if not megakernel.eligible(self.layout, self.settings, n):
                raise ValueError(
                    "kkt_backend='megakernel' requires a small dense "
                    "zero/nn/soc layout at float64 with at least one "
                    "barrier cone (see ipm.megakernel.eligible)"
                )
            self._mega_fn = megakernel.build_mega_solve(
                self.layout, self.settings, n, p_nonzero=p_nonzero,
            )
            backend = "condensed"  # rescue / fallback path

        solve_one = build_solve(
            self.layout, self.settings, n, p_nonzero=p_nonzero,
            kkt_backend=backend,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_sharding = NamedSharding(mesh, P("dp"))
            self._solve_fn = jax.jit(
                jax.vmap(solve_one),
                in_shardings=(data_sharding,) * 4,
            )
            self._batch_minor = False
        else:
            # batch-minor layout: the instance batch rides the minor
            # (lane) dimension of every array, so the IPM's elementwise
            # ops are fully lane-vectorized (~10% measured gain)
            self._solve_fn = jax.jit(
                jax.vmap(solve_one, in_axes=-1, out_axes=-1)
            )
            self._batch_minor = True

        if rescue is not None:
            want_build = True
            if rescue == "cpu":
                try:
                    self._rescue_device = jax.devices("cpu")[0]
                except RuntimeError:
                    want_build = False  # no CPU platform: skip rescue
            if want_build:
                rs = rescue_settings if rescue_settings is not None else \
                    dataclasses.replace(
                        self.settings, factor_dtype="float64",
                        mixed_precision=False,
                    )
                # rescue CASCADE: the primary (same-backend) pass closes
                # nearly every marginal lane; genuinely hard instances
                # that stall even on native f64 with default settings
                # (measured: 2 of 65536 on the bench distribution) fall
                # through to alternate backend/equilibration configs —
                # each stage only ever sees the lanes the previous
                # stages left, and stages compile lazily on first use.
                rs_ne = dataclasses.replace(rs, equilibrate_enable=False)
                self._rescue_cfgs = [
                    (backend, rs),
                    ("ldl", dataclasses.replace(rs_ne,
                                                kkt_backend="ldl")),
                    ("condensed", dataclasses.replace(
                        rs_ne, kkt_backend="condensed")),
                ]
                self._rescue_built = {}
                self._rescue_pn = p_nonzero

                def rescue_fn(stage):
                    fn = self._rescue_built.get(stage)
                    if fn is None:
                        bk, st_ = self._rescue_cfgs[stage]
                        fn = jax.jit(jax.vmap(build_solve(
                            self.layout, st_, self.n,
                            p_nonzero=self._rescue_pn, kkt_backend=bk)))
                        self._rescue_built[stage] = fn
                    return fn

                self._rescue_fn = rescue_fn

    def _rescue_pass(self, out, P, q, A, b):
        """Re-solve the lanes that did not reach SOLVED with the accurate
        (native-f64 / full-precision) configurations; keep whichever
        result is better per lane.  Lanes are padded to the next power of
        two so repeated rescues reuse a handful of compiled shapes.
        Stages of the cascade run only over the lanes the previous
        stages left unsolved."""
        import jax

        B = out["status"].shape[0]
        for stage in range(len(self._rescue_cfgs)):
            idx = np.nonzero(
                out["status"] != int(SolverStatus.SOLVED))[0]
            if len(idx) == 0:
                return out
            # pad at least to 32 lanes: repeated solves then reuse one
            # compiled rescue shape even as the failed-lane count wiggles
            Bp = min(max(32, _next_pow2(len(idx))), B)
            pad = np.resize(idx, Bp)  # cycle failed lanes to fill
            # the mega path passes P through raw (triu/full-symmetric);
            # symmetrize just the rescued slice — idempotent on
            # symmetric P
            rargs = [np.ascontiguousarray(arr[pad])
                     for arr in (P, q, A, b)]
            rargs[0] = _symmetrize_triu(rargs[0])
            if self._rescue_device is not None:
                rargs = [jax.device_put(a, self._rescue_device)
                         for a in rargs]
            rout = jax.device_get(self._rescue_fn(stage)(*rargs))
            rstat = rout["status"][:len(idx)]
            fixed = rstat == int(SolverStatus.SOLVED)
            take = idx[fixed]
            if len(take):
                sel = np.nonzero(fixed)[0]
                for k in list(out.keys()):
                    if k not in rout:
                        continue  # backend-specific extras
                    merged = np.array(out[k])  # buffers are read-only
                    merged[take] = rout[k][sel]
                    out[k] = merged
                if hasattr(out, "merge_lanes"):
                    # megakernel LazyOutputs: z/s/diagnostics merge at
                    # materialization, so the rescue does not force a
                    # fetch
                    out.merge_lanes(take, sel, rout)
        return out

    def solve(self, P, q, A, b) -> BatchSolution:
        """P: (B,n,n) full/triu symmetric (or None for LP batches);
        q: (B,n); A: (B,m,n); b: (B,m)."""
        if P is None:
            P = np.zeros((np.asarray(q).shape[0], self.n, self.n))
        P = np.asarray(P, np.float64)
        q, A, b = np.asarray(q), np.asarray(A), np.asarray(b)
        t0 = time.perf_counter()
        import jax

        if self._mega_fn is not None:
            # LazyOutputs: eager fields already fetched (one packed
            # transfer); z/s/diagnostics stay on device until read.
            # P passes through RAW: the kernel's triu extraction reads
            # identical values for full-symmetric or upper-triangular
            # input, so the (B, n, n) symmetrization pass (a ~150 MB
            # numpy sweep at B=65536) is skipped on this path; the
            # rescue symmetrizes its own few-lane slice.
            out = self._mega_fn(P, q, A, b)
        elif self._batch_minor:
            P = _symmetrize_triu(P)
            out = self._solve_fn(
                P.transpose(1, 2, 0), q.T, A.transpose(1, 2, 0), b.T
            )
            # one batched device_get: per-array np.asarray fetches pay a
            # full host<->device round trip each
            out = jax.device_get(out)
            out = {k: np.moveaxis(v, -1, 0) for k, v in out.items()}
        else:
            P = _symmetrize_triu(P)
            out = jax.device_get(self._solve_fn(P, q, A, b))

        if self._rescue_fn is not None:
            out = self._rescue_pass(out, P, q, A, b)
        dt = time.perf_counter() - t0
        return BatchSolution(out, dt)
