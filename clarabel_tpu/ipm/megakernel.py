"""The batched IPM as ONE Pallas TPU kernel per 1024-lane block.

Why: the vmapped XLA IPM is latency-bound, not FLOP-bound (docs/PERF.md):
XLA emits hundreds of small fused VPU kernels per iteration, each with
fixed issue overhead, plus the f64 float-float emulation tax on every one.
This module fuses the ENTIRE solve — Ruiz equilibration, the initial-point
solve, the full Mehrotra predictor-corrector loop (residuals, NT scaling,
condensed KKT factor + refined solves, step lengths, termination state
machine), and finalization — into a single `pallas_call`.

Precision schedule (round 3): the loop runs in TWO in-kernel phases.
Phase 1 iterates in plain f32 (one VPU op per arithmetic op) while mu is
large; each lane hands off to phase 2 when mu < settings.megakernel_switch_mu
(or on any f32 stall/failure).  Phase 2 runs the same loop body in
explicit double-float (f32-pair) arithmetic from linalg/df64.py — Mosaic
has no f64 type — and is the only phase that assigns termination
statuses, so every status is certified at ~2^-48 precision.  Because both
phases live inside one kernel, the phase switch costs nothing (the carry
never leaves VMEM) — this is the in-kernel version of the mixed-precision
schedule that measured SLOWER as two XLA programs (docs/PERF.md).

Scope: batches of small problems with nonnegative + second-order cones
only (the BatchSolver regime; see `eligible`).  Semantics mirror
ipm/loop.py formula-for-formula (which in turn cites the reference
src/solver.jl, src/kktsystem.jl, src/cones/*.jl); deviations are the
precision split documented inline (step lengths / convergence norms in
f32, everything cancellation-sensitive in double-float) and the f32
phase (docs/DEVIATIONS.md).

Layout: lanes are instances.  Each per-lane scalar is an (8, 128) f32
array (= one VPU vreg); vectors/matrices carry stacked leading dims, e.g.
x is (n, 8, 128).  A grid step processes 1024 lanes; the in-kernel
`while_loop`s exit as soon as every lane in the block has terminated, so
blocks of easy instances finish early (per-block early exit — the vmapped
XLA loop runs every instance to the slowest lane of the whole batch).
"""

import functools
import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..cones.api import (ExponentialConeT, GenPowerConeT,
                         NonnegativeConeT, PowerConeT,
                         PSDTriangleConeT, SecondOrderConeT, ZeroConeT)
from ..cones.layout import ConeLayout
from ..statuscodes import SolverStatus
from ..linalg.df64 import DF, TF, df, split_f64, join_f64
from ..linalg import df64

S8, L128 = 8, 128
BLOCK = S8 * L128  # 1024 lanes per grid step

_BIG = np.float32(1e30)

UNSOLVED = int(SolverStatus.UNSOLVED)
SOLVED = int(SolverStatus.SOLVED)
PINF = int(SolverStatus.PRIMAL_INFEASIBLE)
DINF = int(SolverStatus.DUAL_INFEASIBLE)
ALMOST_SOLVED = int(SolverStatus.ALMOST_SOLVED)
ALMOST_PINF = int(SolverStatus.ALMOST_PRIMAL_INFEASIBLE)
ALMOST_DINF = int(SolverStatus.ALMOST_DUAL_INFEASIBLE)
MAX_ITERATIONS = int(SolverStatus.MAX_ITERATIONS)
NUMERICAL_ERROR = int(SolverStatus.NUMERICAL_ERROR)
INSUFFICIENT_PROGRESS = int(SolverStatus.INSUFFICIENT_PROGRESS)

# scaling strategy codes (reference: src/types.jl:73-76, ipm/loop.py)
PRIMAL_DUAL = 0
DUAL = 1

# f32-phase handoff rules (beyond the mu switch): a lane leaves phase 1
# for the double-float phase when its f32 step collapses, its mu stops
# contracting, or it exceeds the iteration cap — phase 2 then either
# finishes it or terminates it with the full state machine.
_P1_MIN_STEP = np.float32(0.01)
_P1_STALL_RATIO = np.float32(0.9)
_P1_STALL_FROM_ITER = 5
_P1_CAP = 25

# refinement: passes are accept-masked and run adaptively (a while_loop
# that exits when every lane's residual meets tolerance), capped at
# min(settings.iterative_refinement_max_iter, 4) double-float passes /
# 1 f32 pass; iterative_refinement_enable=False disables them.
_REFINE_CAP_DF = 4
_REFINE_CAP_F32 = 1

# adaptive (while_loop) vs unrolled refinement passes; the env override
# exists for on-hardware A/B profiling (docs/PERF.md)
import os as _os

_ADAPTIVE_REFINE = _os.environ.get("CLARABEL_MEGA_ADAPTIVE_REFINE",
                                   "1") != "0"

# diagnosis-only ablation hook: comma-set of checks whose failure is
# IGNORED ("scale", "chol", "refine") — used to attribute endgame
# NUMERICAL_ERROR terminations to a specific guard; never set in
# production (a genuinely failed factorization then feeds NaNs forward)
_FORCE_OK = frozenset(
    x for x in _os.environ.get("CLARABEL_MEGA_FORCE_OK", "").split(",")
    if x)

# debug bisect hook: 0 = full kernel; 1 = stop after equilibration;
# 2 = after the initial point; 3 = one unrolled df64 body, no while
_DEBUG_STAGE = 0


def _vmem_estimate_bytes(n: int, m: int) -> int:
    """Rough per-block VMEM working-set bound: stacked (8,128) f32 rows
    for the df64 data (P, A, q, b hi+lo), the condensed assembly
    (Hinv*A columns, S columns), and the loop carry + outputs.  Each
    row is 4 KB; the dominant terms are the n*m stacks kept live
    during build_kkt."""
    rows = (
        2 * (n * n + n * m + n + m)   # problem data, hi+lo
        + 2 * n * m                   # HinvA columns
        + 2 * n * n                   # condensed S columns
        + 4 * n * m                   # refinement residual/update stacks
        + 20 * (n + 2 * m)            # carry (x,z,s + prev + outputs)
        + 120                         # per-lane scalars, masks, scratch
    )
    return rows * S8 * L128 * 4


def eligible(layout: ConeLayout, settings, n: int) -> bool:
    """The megakernel covers the BatchSolver regime: small dense problems
    over nonnegative/second-order cones, solved at f64-class precision.

    Refinement inside the kernel honors iterative_refinement_enable and
    caps iterative_refinement_max_iter at 4 double-float passes (they
    run adaptively, so extra passes would be no-ops anyway).  Shapes are
    capped both by n/m bounds and by a VMEM working-set estimate
    (`_vmem_estimate_bytes` <= 12 MB); sizes near the cap compile but
    only the small-shape class is perf-validated on hardware."""
    if settings.dtype != "float64":
        return False
    if settings.verbose or settings.mixed_precision:
        return False
    m = layout.m
    if n < 1 or m < 1 or n > 32 or m > 96 or n * m > 2048:
        return False
    if _vmem_estimate_bytes(n, m) > 12 * 1024 * 1024:
        return False
    n_nonsym = 0
    for c in layout.cones:
        if not isinstance(c, (ZeroConeT, NonnegativeConeT,
                              SecondOrderConeT, ExponentialConeT,
                              PowerConeT, GenPowerConeT,
                              PSDTriangleConeT)):
            return False
        if isinstance(c, SecondOrderConeT) and c.dim < 2:
            return False
        if isinstance(c, (ExponentialConeT, PowerConeT)):
            n_nonsym += 1
        if isinstance(c, GenPowerConeT):
            # unrolled per-row scalar math: bound the width, and charge
            # the wider per-cone state against the nonsym budget
            w_g = len(c.alpha) + c.dim2
            if w_g > 16:
                return False
            n_nonsym += 1 + w_g // 3
        if isinstance(c, PSDTriangleConeT):
            # sides <= 3 have closed-form chol + Jacobi eig in-kernel
            # (round-5 extension; reference
            # coneops_psdtrianglecone.jl:78-143); the R/Rinv/lam state
            # (~2*side^2+side df rows) charges the same budget
            if c.dim > 3:
                return False
            n_nonsym += 1 + (c.dim * c.dim) // 3
    # nonsymmetric segments carry per-cone 3x3 scaling state and
    # log/exp-heavy updates in-kernel; bound their count separately and
    # charge their state (grad + H_dual + Hs + chol factor + z copy,
    # hi+lo) against the VMEM budget
    if n_nonsym > 16:
        return False
    if (_vmem_estimate_bytes(n, m) + n_nonsym * 48 * S8 * L128 * 4
            > 12 * 1024 * 1024):
        return False
    if layout.degree < 1:
        return False   # pure-equality problems: no barrier to follow
    return True


# ---------------------------------------------------------------------------
# value types: DF (double-float, from linalg/df64) and F1 (plain f32)
# with the same interface, so every solver subroutine is written once
# and instantiated per phase via an arithmetic namespace (`ar`).
# ---------------------------------------------------------------------------

def _f1v(x):
    if isinstance(x, F1):
        return x.hi
    if isinstance(x, (int, float, np.floating)):
        return np.float32(x)
    return jnp.asarray(x, jnp.float32)


class F1:
    """A single-f32 value with the DF interface (hi only, lo == 0)."""

    __slots__ = ("hi",)
    __array_priority__ = 1000

    def __init__(self, hi, lo=None):
        self.hi = jnp.asarray(hi, jnp.float32)

    @property
    def lo(self):
        return jnp.zeros_like(self.hi)

    @staticmethod
    def zeros(shape):
        return F1(jnp.zeros(shape, jnp.float32))

    @property
    def shape(self):
        return self.hi.shape

    def __getitem__(self, idx):
        return F1(self.hi[idx])

    def astuple(self):
        return (self.hi,)

    def __neg__(self):
        return F1(-self.hi)

    def __add__(self, other):
        return F1(self.hi + _f1v(other))

    __radd__ = __add__

    def __sub__(self, other):
        return F1(self.hi - _f1v(other))

    def __rsub__(self, other):
        return F1(_f1v(other) - self.hi)

    def __mul__(self, other):
        return F1(self.hi * _f1v(other))

    __rmul__ = __mul__

    def __truediv__(self, other):
        return F1(self.hi / _f1v(other))

    def __rtruediv__(self, other):
        return F1(_f1v(other) / self.hi)

    def __lt__(self, other):
        return self.hi < _f1v(other)

    def __le__(self, other):
        return self.hi <= _f1v(other)

    def __gt__(self, other):
        return self.hi > _f1v(other)

    def __ge__(self, other):
        return self.hi >= _f1v(other)


class _ArDF:
    """Double-float arithmetic namespace (phase 2 / setup / finalize)."""

    V = DF
    is_df = True
    where = staticmethod(df64.where)
    sqrt = staticmethod(df64.sqrt)
    recip = staticmethod(df64.recip)
    dmax = staticmethod(df64.dmax)
    dmin = staticmethod(df64.dmin)
    dabs = staticmethod(df64.dabs)
    zeros = staticmethod(DF.zeros)
    log = staticmethod(df64.log)
    exp = staticmethod(df64.exp)

    @staticmethod
    def lift(x):
        return DF(x)

    @staticmethod
    def make(hi, lo):
        return DF(hi, lo)


class _ArF32:
    """Plain-f32 arithmetic namespace (phase 1)."""

    V = F1
    is_df = False
    zeros = staticmethod(F1.zeros)

    @staticmethod
    def where(mask, a, b):
        return F1(jnp.where(mask, _f1v(a), _f1v(b)))

    @staticmethod
    def sqrt(a):
        h = _f1v(a)
        return F1(jnp.where(h > 0, jnp.sqrt(jnp.maximum(h, 0.0)), 0.0))

    @staticmethod
    def recip(a):
        return F1(1.0 / _f1v(a))

    @staticmethod
    def dmax(a, b):
        return F1(jnp.maximum(_f1v(a), _f1v(b)))

    @staticmethod
    def dmin(a, b):
        return F1(jnp.minimum(_f1v(a), _f1v(b)))

    @staticmethod
    def dabs(a):
        return F1(jnp.abs(_f1v(a)))

    @staticmethod
    def log(a):
        return F1(jnp.log(_f1v(a)))

    @staticmethod
    def exp(a):
        return F1(jnp.exp(_f1v(a)))

    @staticmethod
    def lift(x):
        return F1(x)

    @staticmethod
    def make(hi, lo):
        return F1(hi)


# ---------------------------------------------------------------------------
# stacked helpers: leading structural dims, trailing (8, 128); generic
# over DF / F1 by dispatch on the value type
# ---------------------------------------------------------------------------

def _vcat(parts):
    if isinstance(parts[0], DF):
        return DF(jnp.concatenate([p.hi for p in parts], axis=0),
                  jnp.concatenate([p.lo for p in parts], axis=0))
    return F1(jnp.concatenate([p.hi for p in parts], axis=0))


def _vstack(parts):
    if isinstance(parts[0], DF):
        return DF(jnp.stack([p.hi for p in parts], axis=0),
                  jnp.stack([p.lo for p in parts], axis=0))
    return F1(jnp.stack([p.hi for p in parts], axis=0))


def _vsum0(v):
    """Tree-sum a stacked value over axis 0 -> per-lane scalar."""
    if isinstance(v, F1):
        return F1(_fsum0(v.hi))
    while v.hi.shape[0] > 1:
        k = v.hi.shape[0]
        h = k // 2
        s = v[0:h] + v[h:2 * h]
        if k % 2:
            s = _vcat([s, v[2 * h:]])
        v = s
    return v[0]


def _vdot0(a, b):
    if isinstance(a, F1):
        return F1(_fsum0(a.hi * b.hi))
    return _vsum0(a * b)


def _fred0(arr, op):
    """f32 reduction over axis 0 via a static slice tree (Mosaic-safe)."""
    while arr.shape[0] > 1:
        k = arr.shape[0]
        h = k // 2
        s = op(arr[0:h], arr[h:2 * h])
        if k % 2:
            s = jnp.concatenate([s, arr[2 * h:]], axis=0)
        arr = s
    return arr[0]


def _fmax0(arr):
    return _fred0(arr, jnp.maximum)


def _fmin0(arr):
    return _fred0(arr, jnp.minimum)


def _fsum0(arr):
    return _fred0(arr, jnp.add)


def _fall0(mask):
    """All-true over axis 0 of a bool stack.  Goes through f32 min — a
    bool slice-tree would concat i1 vectors, which Mosaic lowers via an
    unsupported i8->i1 truncation."""
    return _fmin0(mask.astype(jnp.float32)) > 0.5


# ---- stacked triple-float helpers (residual-evaluation path) ----
# TF values carry leading structural dims + trailing (8, 128) like DF;
# used only in the double-float phase's residual accumulations
# (settings.megakernel_tf_residual; see linalg/df64.TF).

def _tfcat(parts):
    return TF(jnp.concatenate([p.hi for p in parts], axis=0),
              jnp.concatenate([p.md for p in parts], axis=0),
              jnp.concatenate([p.lo for p in parts], axis=0))


def _tfstack(parts):
    return TF(jnp.stack([p.hi for p in parts], axis=0),
              jnp.stack([p.md for p in parts], axis=0),
              jnp.stack([p.lo for p in parts], axis=0))


def _tfsum0(t):
    """Tree-sum a stacked TF over axis 0 -> per-lane TF scalar."""
    while t.hi.shape[0] > 1:
        k = t.hi.shape[0]
        h = k // 2
        s = t[0:h] + t[h:2 * h]
        if k % 2:
            s = _tfcat([s, t[2 * h:]])
        t = s
    return t[0]


def _tfdot0(a, b):
    """TF dot of two stacked DF values over axis 0."""
    return _tfsum0(df64.tf_prod(a, b))


def _norm2_f32(arr):
    """Overflow-safe ||.||_2 over axis 0 of an (k, 8, 128) f32 stack."""
    mx = _fmax0(jnp.abs(arr))
    mxs = jnp.where(mx > 0, mx, 1.0)
    r = arr / mxs[None]
    return mx * jnp.sqrt(_fsum0(r * r))


def _any_lane(mask):
    """Any-true over an (8, 128) bool mask, Mosaic-safe (int32 max)."""
    return jnp.max(jnp.where(mask, 1, 0).astype(jnp.int32)) == 1


class LazyOutputs(dict):
    """Solver-output dict whose rarely-read fields (z, s, diagnostic
    scalars) stay ON DEVICE until first accessed.  Over the TPU tunnel
    the lazy block is ~5x the eager block's bytes, and most callers
    (throughput benchmarks, status filters, objective readers) never
    touch it.  Lane merges from a rescue pass are recorded and applied
    at materialization, so a rescue does not force the fetch."""

    def __init__(self, eager: dict, lazy_keys, fetch):
        super().__init__(eager)
        self._lazy_keys = tuple(lazy_keys)
        self._fetch = fetch
        self._pending = []   # (take_idx, sel_idx, rescue_out)

    def _materialize(self):
        if self._fetch is not None:
            rest = self._fetch()
            self._fetch = None
            self.update(rest)
            for take, sel, rout in self._pending:
                for k in self._lazy_keys:
                    if k in rout:
                        merged = np.array(dict.__getitem__(self, k))
                        merged[take] = rout[k][sel]
                        dict.__setitem__(self, k, merged)
            self._pending = []

    def __getitem__(self, k):
        if not dict.__contains__(self, k) and k in self._lazy_keys:
            self._materialize()
        return dict.__getitem__(self, k)

    def merge_lanes(self, take, sel, rout):
        """Defer a rescue merge on the lazy fields (the caller merges
        the eager fields directly)."""
        if self._fetch is None:
            for k in self._lazy_keys:
                if k in rout and dict.__contains__(self, k):
                    merged = np.array(dict.__getitem__(self, k))
                    merged[np.asarray(take)] = rout[k][np.asarray(sel)]
                    dict.__setitem__(self, k, merged)
            return
        self._pending.append((np.asarray(take), np.asarray(sel), rout))


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

class _Dat:
    """Per-phase problem data (ar-typed columns + f32 scaling vectors)."""

    def __init__(self, Pcols, Acols, qe, be, cinv, d_f, e_f,
                 dinv_hi, einv_hi, cinv_hi, normq, normb):
        self.Pcols = Pcols
        self.Acols = Acols
        self.qe = qe
        self.be = be
        self.cinv = cinv
        self.d_f = d_f
        self.e_f = e_f
        self.dinv_hi = dinv_hi
        self.einv_hi = einv_hi
        self.cinv_hi = cinv_hi
        self.normq = normq
        self.normb = normb

    def to_f32(self):
        return _Dat([F1(c.hi) for c in self.Pcols],
                    [F1(c.hi) for c in self.Acols],
                    F1(self.qe.hi), F1(self.be.hi), F1(self.cinv.hi),
                    self.d_f, self.e_f, self.dinv_hi, self.einv_hi,
                    self.cinv_hi, self.normq, self.normb)


def build_mega_solve(layout: ConeLayout, settings, n: int,
                     p_nonzero: bool = True, interpret: bool = False,
                     use_pallas=None):
    """Returns solve(P, q, A, b) over batch-major (B, ...) f64 arrays,
    yielding the same output dict as the vmapped ipm/loop.py solve.

    `use_pallas=None` resolves to True on TPU backends and False
    elsewhere (the same block function then runs as plain XLA — Mosaic
    only targets TPU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    m = layout.m
    degree = layout.degree
    st = settings
    two_phase = bool(getattr(st, "megakernel_two_phase", True))
    has_zero = any(isinstance(c, ZeroConeT) for c in layout.cones)
    has_nonsym = any(isinstance(c, (ExponentialConeT, PowerConeT,
                                    GenPowerConeT))
                     for c in layout.cones)
    # genpow allows dual scaling only; its presence pins the whole
    # composite to the Dual strategy (reference:
    # coneops_genpowcone.jl:21, ipm/loop.py allows_pd)
    allows_pd = not any(isinstance(c, GenPowerConeT)
                        for c in layout.cones)
    if has_zero:
        # zero-cone rows enter the condensed system as 1/eps ~ 1e8
        # (mirroring kkt/condensed.py + cones/ops.mul_Hs_inv): the
        # squared conditioning is fine for double-float refinement but
        # diverges at f32, so the f32 phase is disabled
        two_phase = False
    if has_nonsym:
        # nonsymmetric scalings/corrections are cancellation-sensitive
        # (log/exp chains, 3rd-order terms); run the df phase only
        two_phase = False
    switch_mu = np.float32(getattr(st, "megakernel_switch_mu", 1e-4))
    p1_cap = int(min(_P1_CAP, st.max_iter))
    refine_df = (0 if not st.iterative_refinement_enable
                 else min(int(st.iterative_refinement_max_iter),
                          _REFINE_CAP_DF))
    refine_f32 = (0 if not st.iterative_refinement_enable
                  else _REFINE_CAP_F32)

    # static cone segments (contiguous by ConeLayout construction);
    # seg_alphas carries the pow cone's trace-time-constant exponent
    # (a float) or the genpow cone's (alpha tuple, dim2)
    segs: List[Tuple[str, int, int]] = []
    seg_alphas: List = []
    for cone, (lo, hi) in zip(layout.cones, layout.ranges):
        alpha_c = None
        if isinstance(cone, ZeroConeT):
            kind = "zero"
        elif isinstance(cone, NonnegativeConeT):
            kind = "nn"
        elif isinstance(cone, ExponentialConeT):
            kind = "exp"
        elif isinstance(cone, PowerConeT):
            kind = "pow"
            alpha_c = float(cone.alpha)
        elif isinstance(cone, GenPowerConeT):
            kind = "genpow"
            alpha_c = (tuple(float(a) for a in cone.alpha),
                       int(cone.dim2))
        elif isinstance(cone, PSDTriangleConeT):
            kind = "psd"
            alpha_c = int(cone.dim)   # matrix side (svec width in layout)
        else:
            kind = "soc"
        segs.append((kind, lo, hi))
        seg_alphas.append(alpha_c)

    # ---------------- precision-generic subroutines ----------------

    def make_ops(ar, dat):
        """All solver subroutines instantiated for one arithmetic
        namespace (`ar` = _ArDF or _ArF32) over `dat`'s problem data."""
        Pcols, Acols = dat.Pcols, dat.Acols
        qe, be, cinv = dat.qe, dat.be, dat.cinv

        def seg_slices(v):
            return [(kind, v[lo:hi]) for kind, lo, hi in segs]

        def mv(cols, x):
            """A @ x from a list of n column stacks (m, 8, 128)."""
            acc = cols[0] * x[0]
            for j in range(1, len(cols)):
                acc = acc + cols[j] * x[j]
            return acc

        def rmv(cols, y):
            """A' @ y -> (n, 8, 128) stack."""
            return _vstack([_vdot0(c, y) for c in cols])

        # triple-float accumulation variants (residual evaluation only;
        # settings.megakernel_tf_residual): error-free DFxDF products
        # keep the large terms' cancellation exact to ~2^-72, removing
        # the eps_df*kappa limiting-accuracy wall (linalg/df64.TF)
        use_tf = ar.is_df and bool(
            getattr(st, "megakernel_tf_residual", True))

        def mv_tf(cols, x):
            return df64.tf_sum([df64.tf_prod(cols[j], x[j])
                                for j in range(len(cols))])

        def rmv_tf(cols, y):
            """A' @ y -> list of n per-lane TF scalars."""
            return [_tfdot0(c, y) for c in cols]

        # ---- PSD-triangle cone helpers (sides <= 3) ----------------
        # reference: coneops_psdtrianglecone.jl:78-143,190-254,336-466,
        # mirrored from cones/psd.py in per-lane stacked-scalar form.
        # A cone-side-n matrix is a python n x n list-of-lists of ar
        # per-lane scalars; svec rows follow the column-stacked upper
        # triangle with off-diagonals x sqrt(2) (cones/psd._svec_basis).

        _SR2 = float(np.sqrt(2.0))
        _ISR2 = float(1.0 / np.sqrt(2.0))

        def psd_unpack(vg, np_):
            """svec rows -> symmetric matrix entries."""
            M = [[None] * np_ for _ in range(np_)]
            for j in range(np_):
                for i in range(j + 1):
                    e = vg[j * (j + 1) // 2 + i]
                    if i == j:
                        M[i][j] = e
                    else:
                        M[i][j] = M[j][i] = e * _ISR2
            return M

        def psd_pack(M, np_):
            """Symmetric matrix entries -> svec row list."""
            rows = []
            for j in range(np_):
                for i in range(j + 1):
                    rows.append(M[i][j] if i == j else M[i][j] * _SR2)
            return rows

        def mat_mm(A, B):
            np_ = len(A)
            return [[functools.reduce(
                lambda u, v: u + v,
                [A[i][k] * B[k][j] for k in range(np_)])
                for j in range(np_)] for i in range(np_)]

        def mat_T(A):
            np_ = len(A)
            return [[A[j][i] for j in range(np_)] for i in range(np_)]

        def mat_chol(M):
            """Closed-form lower Cholesky for n <= 3 with clamped
            pivots; returns (L, ok)."""
            np_ = len(M)
            L = [[None] * np_ for _ in range(np_)]
            ok = jnp.ones((S8, L128), bool)
            for j in range(np_):
                acc = M[j][j]
                for k in range(j):
                    acc = acc - L[j][k] * L[j][k]
                ok = jnp.logical_and(ok, acc.hi > 0)
                d = ar.sqrt(ar.dmax(acc, 0.0))
                d = ar.where(d.hi > 0, d, 1.0)
                L[j][j] = d
                idj = ar.recip(d)
                for i in range(j + 1, np_):
                    acc = M[i][j]
                    for k in range(j):
                        acc = acc - L[i][k] * L[j][k]
                    L[i][j] = acc * idj
                for i in range(j):
                    L[i][j] = ar.zeros((S8, L128))
            return L, ok

        def jacobi_svd(A, sweeps=None):
            """One-sided (Hestenes) Jacobi SVD for n <= 3: returns
            (sigma list, U, V) with A = U diag(sigma) V'.  Rotations
            orthogonalize COLUMN PAIRS of A itself, so accuracy
            degrades with kappa(A) -- an eig of A'A would square the
            conditioning and break down at sigma ratios ~1e7 in
            double-float, exactly the NT-scaling endgame regime.
            Branch-free, vectorizes over lanes; ~5 sweeps reach the
            arithmetic's ulp (quadratic convergence)."""
            np_ = len(A)
            one = ar.lift(jnp.ones((S8, L128), jnp.float32))
            if np_ == 1:
                s0 = ar.dabs(A[0][0])
                s0 = ar.where(s0.hi > 0, s0, 1.0)
                sgn0 = ar.where(A[0][0].hi >= 0, one, -one)
                return [s0], [[sgn0]], [[one]]
            if sweeps is None:
                sweeps = 5 if np_ == 3 else 4
            Ac = [[A[i][j] for j in range(np_)] for i in range(np_)]
            V = [[one if i == j else ar.zeros((S8, L128))
                  for j in range(np_)] for i in range(np_)]
            pairs = [(p, q) for q in range(1, np_) for p in range(q)]
            for _ in range(sweeps):
                for (p, q) in pairs:
                    al = _vsum0(_vstack([Ac[i][p] * Ac[i][p]
                                         for i in range(np_)]))
                    be_ = _vsum0(_vstack([Ac[i][q] * Ac[i][q]
                                          for i in range(np_)]))
                    ga = _vsum0(_vstack([Ac[i][p] * Ac[i][q]
                                         for i in range(np_)]))
                    live = jnp.abs(ga.hi) > 0
                    ga_s = ar.where(live, ga, 1.0)
                    zeta = (be_ - al) * ar.recip(ga_s * 2.0)
                    sgn = jnp.where(zeta.hi >= 0, np.float32(1.0),
                                    np.float32(-1.0))
                    t = ar.lift(sgn) * ar.recip(
                        ar.dabs(zeta)
                        + ar.sqrt(zeta * zeta + 1.0))
                    c = ar.recip(ar.sqrt(t * t + 1.0))
                    s_ = t * c
                    c = ar.where(live, c, 1.0)
                    s_ = ar.where(live, s_, ar.zeros((S8, L128)))
                    for i in range(np_):
                        aip, aiq = Ac[i][p], Ac[i][q]
                        Ac[i][p] = c * aip - s_ * aiq
                        Ac[i][q] = s_ * aip + c * aiq
                        vip, viq = V[i][p], V[i][q]
                        V[i][p] = c * vip - s_ * viq
                        V[i][q] = s_ * vip + c * viq
            sig, U = [], [[None] * np_ for _ in range(np_)]
            for j in range(np_):
                sj = ar.sqrt(_vsum0(_vstack(
                    [Ac[i][j] * Ac[i][j] for i in range(np_)])))
                sjc = ar.where(sj.hi > 0, sj, 1.0)
                isj = ar.recip(sjc)
                sig.append(sjc)
                for i in range(np_):
                    U[i][j] = Ac[i][j] * isj
            return sig, U, V

        def psd_eigvals32(Mh):
            """All eigenvalues (list, no order guarantee beyond
            near-diagonal convergence) of a symmetric f32 matrix
            (n <= 3) by values-only cyclic Jacobi.  Trig-free: the
            Smith (1961) closed form needs acos/cos, which Mosaic has
            no TPU lowering for; branch-free rotations vectorize over
            lanes and 4 sweeps reach f32 ulp.  Callers reduce with
            min/sum, so ordering is irrelevant."""
            np_ = len(Mh)
            if np_ == 1:
                return [Mh[0][0]]
            if np_ == 2:
                a, b, d = Mh[0][0], Mh[0][1], Mh[1][1]
                mid = 0.5 * (a + d)
                rad = jnp.sqrt(jnp.square(0.5 * (a - d))
                               + jnp.square(b))
                return [mid - rad, mid + rad]
            A = [[Mh[i2][j2] for j2 in range(3)] for i2 in range(3)]
            for _ in range(4):
                for (p, q2) in ((0, 1), (0, 2), (1, 2)):
                    apq = A[p][q2]
                    live = jnp.abs(apq) > 0
                    apq_s = jnp.where(live, apq, 1.0)
                    theta = (A[q2][q2] - A[p][p]) / (2.0 * apq_s)
                    t = jnp.sign(theta) / (
                        jnp.abs(theta)
                        + jnp.sqrt(theta * theta + 1.0))
                    t = jnp.where(theta == 0, 1.0, t)
                    c = 1.0 / jnp.sqrt(t * t + 1.0)
                    s_ = t * c
                    c = jnp.where(live, c, 1.0)
                    s_ = jnp.where(live, s_, 0.0)
                    app, aqq = A[p][p], A[q2][q2]
                    A[p][p] = (c * c * app - 2.0 * c * s_ * apq
                               + s_ * s_ * aqq)
                    A[q2][q2] = (s_ * s_ * app + 2.0 * c * s_ * apq
                                 + c * c * aqq)
                    A[p][q2] = jnp.zeros((S8, L128), jnp.float32)
                    A[q2][p] = A[p][q2]
                    r = 3 - p - q2
                    arp, arq = A[r][p], A[r][q2]
                    A[r][p] = c * arp - s_ * arq
                    A[p][r] = A[r][p]
                    A[r][q2] = s_ * arp + c * arq
                    A[q2][r] = A[r][q2]
            return [A[0][0], A[1][1], A[2][2]]

        def psd_logdet32(Mh):
            """(logdet, ok) of a symmetric f32 matrix via closed-form
            chol (n <= 3); ok False outside the PD cone."""
            np_ = len(Mh)
            val = jnp.zeros((S8, L128), jnp.float32)
            ok = jnp.ones((S8, L128), bool)
            L = [[None] * np_ for _ in range(np_)]
            for j in range(np_):
                acc = Mh[j][j]
                for k in range(j):
                    acc = acc - L[j][k] * L[j][k]
                ok = jnp.logical_and(ok, acc > 0)
                dj = jnp.sqrt(jnp.maximum(acc, 0.0))
                djs = jnp.where(dj > 0, dj, 1.0)
                val = val + 2.0 * _logsafe32(djs)
                for i in range(j + 1, np_):
                    acc = Mh[i][j]
                    for k in range(j):
                        acc = acc - L[i][k] * L[j][k]
                    L[i][j] = acc / djs
                L[j][j] = djs
            return val, ok

        def psd_unpack32(vhi, np_):
            M = [[None] * np_ for _ in range(np_)]
            for j in range(np_):
                for i in range(j + 1):
                    e = vhi[j * (j + 1) // 2 + i]
                    if i == j:
                        M[i][j] = e
                    else:
                        M[i][j] = M[j][i] = e * np.float32(_ISR2)
            return M

        # ---- nonsymmetric (exp/pow) cone helpers -------------------
        # reference: coneops_expcone.jl, coneops_powcone.jl,
        # coneops_nonsymmetric_common.jl, mirrored from
        # cones/nonsymmetric.py in per-lane stacked-scalar form.
        # Segment values are 3-lists of ar scalars; Hessians are
        # 6-tuples (h11, h12, h13, h22, h23, h33).

        def nslogsafe(x):
            pos = x.hi > 0
            return ar.where(pos, ar.log(ar.where(pos, x, 1.0)),
                            ar.lift(jnp.full((S8, L128), -_BIG)))

        def _logsafe32(x):
            return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)),
                             -_BIG)

        def _wright_omega32(zh):
            """f32 series/asymptotic initialization of ω(z) (reference:
            coneops_expcone.jl:412-468, Santiago thesis alg. 4)."""
            zm1 = zh - 1.0
            w_s = 1.0 + 0.5 * zm1
            p = zm1 * zm1
            w_s = w_s + p * np.float32(1.0 / 16.0)
            p = p * zm1
            w_s = w_s - p * np.float32(1.0 / 192.0)
            p = p * zm1
            w_s = w_s - p * np.float32(1.0 / 3072.0)
            p = p * zm1
            w_s = w_s + p * np.float32(13.0 / 61440.0)
            z_b = jnp.maximum(zh, np.float32(1.0 + np.pi))
            logz = jnp.log(z_b)
            zinv = 1.0 / z_b
            w_b = z_b - logz
            q = logz * zinv
            w_b = w_b + q
            q = q * zinv
            w_b = w_b + q * (logz * 0.5 - 1.0)
            q = q * zinv
            w_b = w_b + q * (logz * logz * np.float32(1.0 / 3.0)
                             - 1.5 * logz + 1.0)
            w0 = jnp.where(zh < np.float32(1.0 + np.pi), w_s, w_b)
            # one f32 Santiago refinement round (enough for the f32
            # barrier check; the ar path refines further below)
            w0 = jnp.maximum(w0, np.float32(1e-10))
            r = zh - w0 - jnp.log(w0)
            wp1 = w0 + 1.0
            t = wp1 * (wp1 + r * np.float32(2.0 / 3.0))
            return w0 * (1.0 + (r / wp1) * (t - 0.5 * r) / (t - r))

        def wright_omega(zv):
            """ω(z) in `ar` arithmetic: f32 start + Santiago refinement
            rounds with the accurate log."""
            w = ar.lift(_wright_omega32(zv.hi))
            for _ in range(2 if ar.is_df else 1):
                r = zv - w - ar.log(w)
                wp1 = w + 1.0
                t = wp1 * (wp1 + r * (2.0 / 3.0))
                w = w * (1.0 + (r / wp1) * (t - r * 0.5) / (t - r))
            return w

        def exp_feas_dual(Z):
            z1, z2, z3 = Z
            ok_sign = jnp.logical_and(z3.hi > 0, z1.hi < 0)
            zsafe = ar.where(z1.hi < 0, z1, -1.0)
            res = z2 - z1 - z1 * nslogsafe(-z3 / zsafe)
            return jnp.logical_and(ok_sign, res.hi > 0)

        def exp_feas_primal(S):
            s1, s2, s3 = S
            ok = jnp.logical_and(s3.hi > 0, s2.hi > 0)
            res = s2 * nslogsafe(s3 / ar.where(s2.hi > 0, s2, 1.0)) - s1
            return jnp.logical_and(ok, res.hi > 0)

        def exp_grad_hess_dual(Z):
            """reference: coneops_expcone.jl:370-399"""
            z1, z2, z3 = Z
            l = nslogsafe(-z3 / z1)
            r = -z1 * l - z1 + z2
            c2 = ar.recip(r)
            g = [c2 * l - ar.recip(z1), -c2, (c2 * z1 - 1.0) / z3]
            rr = r * r
            z1sq = z1 * z1
            H11 = (rr - z1 * r + l * l * z1sq) / (rr * z1sq)
            H12 = -l / rr
            H22 = ar.recip(rr)
            H13 = (z2 - z1) / (rr * z3)
            H23 = -z1 / (rr * z3)
            H33 = (rr - z1 * r + z1sq) / (rr * z3 * z3)
            return g, (H11, H12, H13, H22, H23, H33)

        def exp_grad_primal(S):
            """reference: coneops_expcone.jl:284-297"""
            s1, s2, s3 = S
            w = wright_omega(1.0 - s1 / s2 - nslogsafe(s2 / s3))
            g1 = ar.recip((w - 1.0) * s2)
            g2 = g1 + g1 * nslogsafe(w * s2 / s3) - ar.recip(s2)
            g3 = w / ((1.0 - w) * s3)
            return [g1, g2, g3]

        def pow_phi_dual(Z, a):
            return ar.exp(nslogsafe(Z[0] / a) * (2.0 * a)
                          + nslogsafe(Z[1] / (1.0 - a)) * (2.0 - 2.0 * a))

        def pow_feas_dual(Z, a):
            ok = jnp.logical_and(Z[0].hi > 0, Z[1].hi > 0)
            res = pow_phi_dual(Z, a) - Z[2] * Z[2]
            return jnp.logical_and(ok, res.hi > 0)

        def pow_feas_primal(S, a):
            ok = jnp.logical_and(S[0].hi > 0, S[1].hi > 0)
            res = ar.exp(nslogsafe(S[0]) * (2.0 * a)
                         + nslogsafe(S[1]) * (2.0 - 2.0 * a)) \
                - S[2] * S[2]
            return jnp.logical_and(ok, res.hi > 0)

        def pow_grad_hess_dual(Z, a):
            """reference: coneops_powcone.jl:408-440"""
            z1, z2, z3 = Z
            phi = pow_phi_dual(Z, a)
            psi = phi - z3 * z3
            ipsi = ar.recip(psi)
            g1p = phi * ipsi * (2.0 * a) / z1
            g2p = phi * ipsi * (2.0 - 2.0 * a) / z2
            g3p = z3 * ipsi * (-2.0)
            H11 = (g1p * g1p
                   - phi * ipsi * (2.0 * a * (2.0 * a - 1.0)) / (z1 * z1)
                   + (1.0 - a) / (z1 * z1))
            H12 = g1p * g2p - phi * ipsi * (4.0 * a * (1.0 - a)) / (z1 * z2)
            H22 = (g2p * g2p
                   - phi * ipsi
                   * (2.0 * (1.0 - a) * (1.0 - 2.0 * a)) / (z2 * z2)
                   + a / (z2 * z2))
            H13 = g1p * g3p
            H23 = g2p * g3p
            H33 = g3p * g3p + ipsi * 2.0
            g = [-g1p - (1.0 - a) / z1, -g2p - a / z2, -g3p]
            return g, (H11, H12, H13, H22, H23, H33)

        def _pow_nr32(s1h, s2h, s3h, a):
            """f32 one-sided NR for the pow primal gradient magnitude
            (reference: coneops_powcone.jl:449-478,
            coneops_nonsymmetric_common.jl:170-193).
            Returns (x32, big_mask, abs_safe)."""
            a32 = np.float32(a)
            phi32 = jnp.exp(2.0 * a32 * _logsafe32(s1h)
                            + (2.0 - 2.0 * a32) * _logsafe32(s2h))
            abs_s = jnp.abs(s3h)
            eps32 = np.float32(np.finfo(np.float32).eps)
            big = abs_s > eps32
            absf = jnp.where(big, abs_s, 1.0)
            denom0 = jnp.where(jnp.abs(phi32 - absf * absf) > 0,
                               phi32 - absf * absf, 1.0)
            x032 = -1.0 / absf + (
                2.0 * absf + jnp.sqrt(jnp.maximum(
                    phi32 * phi32 / (absf * absf) + 3.0 * phi32, 0.0))
            ) / denom0
            t0c = (-2.0 * a * math.log(a)
                   - 2.0 * (1.0 - a) * math.log(1.0 - a))

            def f0_32(x):
                t1 = x * x
                t2 = 2.0 * x / absf
                return (2.0 * a32 * _logsafe32(2.0 * a32 * t1
                                               + (1.0 + a32) * t2)
                        + (2.0 - 2.0 * a32)
                        * _logsafe32((2.0 - 2.0 * a32) * t1
                                     + (2.0 - a32) * t2)
                        - _logsafe32(phi32) - _logsafe32(t1 + t2)
                        - 2.0 * _logsafe32(t2) + np.float32(t0c))

            def f1_32(x):
                t1 = x * x
                t2 = 2.0 * x / absf
                return (2.0 * a32 * a32 / (a32 * x + (1.0 + a32) / absf)
                        + (2.0 - 2.0 * a32) * (1.0 - a32)
                        / ((1.0 - a32) * x + (2.0 - a32) / absf)
                        - 2.0 * (x + 1.0 / absf)
                        / jnp.where(t1 + t2 != 0, t1 + t2, 1.0))

            def nr_cond(c):
                i, x, done = c
                return jnp.logical_and(i < 50,
                                       jnp.logical_not(jnp.min(done)))

            def nr_body(c):
                i, x, done = c
                d1 = f1_32(x)
                d1s = jnp.where(d1 != 0, d1, 1.0)
                dx = -f0_32(x) / d1s
                stop = functools.reduce(jnp.logical_or, [
                    dx < eps32,
                    jnp.abs(dx / jnp.where(x != 0, x, 1.0))
                    < np.float32(np.sqrt(np.finfo(np.float32).eps)),
                    jnp.abs(d1) < eps32])
                x = jnp.where(jnp.logical_or(done > 0, stop), x, x + dx)
                return (i + 1,
                        x, jnp.logical_or(done > 0, stop).astype(
                            jnp.float32))

            _, x32, _ = lax.while_loop(
                nr_cond, nr_body,
                (jnp.int32(0), x032,
                 jnp.zeros((S8, L128), jnp.float32)))
            return x32, big, absf

        def pow_grad_primal(S, a):
            """NR-based primal gradient (reference:
            coneops_powcone.jl:288-316,449-478): f32 one-sided NR to
            ~1e-7, then `ar` Newton polish steps (quadratic: two passes
            reach the df ulp)."""
            s1, s2, s3 = S
            s1h, s2h, s3h = s1.hi, s2.hi, s3.hi
            x32, big, absf = _pow_nr32(s1h, s2h, s3h, a)
            t0c = (-2.0 * a * math.log(a)
                   - 2.0 * (1.0 - a) * math.log(1.0 - a))
            x = ar.lift(x32)
            if ar.is_df:
                absd = ar.where(big, ar.dabs(s3), 1.0)
                iabsd = ar.recip(absd)
                for _ in range(2):
                    t1 = x * x
                    t2 = x * iabsd * 2.0
                    f0 = (nslogsafe(t1 * (2.0 * a)
                                    + t2 * (1.0 + a)) * (2.0 * a)
                          + nslogsafe(t1 * (2.0 - 2.0 * a)
                                      + t2 * (2.0 - a))
                          * (2.0 - 2.0 * a)
                          - (nslogsafe(s1) * (2.0 * a)
                             + nslogsafe(s2) * (2.0 - 2.0 * a))
                          - nslogsafe(t1 + t2) - nslogsafe(t2) * 2.0
                          + t0c)
                    f1 = (ar.recip(x * a + iabsd * (1.0 + a))
                          * (2.0 * a * a)
                          + ar.recip(x * (1.0 - a) + iabsd * (2.0 - a))
                          * ((2.0 - 2.0 * a) * (1.0 - a))
                          - (x + iabsd) * 2.0
                          * ar.recip(ar.where((t1 + t2).hi != 0,
                                              t1 + t2, 1.0)))
                    f1s = ar.where(f1.hi != 0, f1, 1.0)
                    x = x - f0 / f1s
            sgn = jnp.where(s3h < 0, np.float32(-1.0), np.float32(1.0))
            g3 = ar.where(big, x * ar.lift(sgn),
                          ar.zeros((S8, L128)))
            g1 = ar.where(big, -(g3 * s3 * a + (1.0 + a)) / s1,
                          ar.lift(np.float32(-(1.0 + a))) / s1)
            g2 = ar.where(big,
                          -(g3 * s3 * (1.0 - a) + (2.0 - a)) / s2,
                          ar.lift(np.float32(-(2.0 - a))) / s2)
            return [g1, g2, g3]

        # ---- generalized power cone (dual-scaling only; reference:
        # coneops_genpowcone.jl, mirrored from cones/nonsymmetric.py
        # _genpow_* in per-lane scalar form; alpha/dim2 are trace-time
        # constants per segment) ----

        def genpow_phi_dual(U, al):
            acc = None
            for j, a in enumerate(al):
                t = nslogsafe(U[j] / a) * (2.0 * a)
                acc = t if acc is None else acc + t
            return ar.exp(acc)

        def genpow_feas_dual(U, V, al):
            ok = functools.reduce(jnp.logical_and,
                                  [u.hi > 0 for u in U])
            res = genpow_phi_dual(U, al)
            for v in V:
                res = res - v * v
            return jnp.logical_and(ok, res.hi > 0)

        def genpow_feas_primal(S1, S2, al):
            ok = functools.reduce(jnp.logical_and,
                                  [s.hi > 0 for s in S1])
            acc = None
            for j, a in enumerate(al):
                t = nslogsafe(S1[j]) * (2.0 * a)
                acc = t if acc is None else acc + t
            res = ar.exp(acc)
            for s2 in S2:
                res = res - s2 * s2
            return jnp.logical_and(ok, res.hi > 0)

        def genpow_state(U, V, al, mu):
            """Dual gradient + the rank-3 Hs data (D, p, q, r)
            (reference: coneops_genpowcone.jl:337-389)."""
            d1 = len(al)
            phi = genpow_phi_dual(U, al)
            norm2w = None
            for v in V:
                t = v * v
                norm2w = t if norm2w is None else norm2w + t
            if norm2w is None:
                norm2w = ar.zeros((S8, L128))
            zeta = phi - norm2w
            feas = functools.reduce(
                jnp.logical_and,
                [u.hi > 0 for u in U] + [zeta.hi > 0])
            zs = ar.where(zeta.hi > 0, zeta, 1.0)
            izeta = ar.recip(zs)
            phiz = phi * izeta
            tau = [ar.recip(U[j]) * (2.0 * al[j]) for j in range(d1)]
            g_head = [-tau[j] * phiz - (1.0 - al[j]) / U[j]
                      for j in range(d1)]
            g_tail = [v * (izeta * 2.0) for v in V]
            dd = ([tau[j] * phiz / U[j]
                   + (1.0 - al[j]) / (U[j] * U[j]) for j in range(d1)]
                  + [izeta * 2.0 for _ in V])
            p0 = ar.sqrt(ar.dmax(phi * (phi + norm2w) * 0.5, 0.0))
            p0s = ar.where(p0.hi > 0, p0, 1.0)
            p1 = -(phi * 2.0) / p0s
            pvec = ([p0 * tau[j] * izeta for j in range(d1)]
                    + [p1 * v * izeta for v in V])
            q0 = ar.sqrt(ar.dmax(zs * phi * 0.5, 0.0))
            qvec = [tau[j] * q0 * izeta for j in range(d1)]
            r1 = ar.sqrt(ar.dmax((zs / (phi + norm2w)) * 4.0, 0.0))
            rvec = [r1 * v * izeta for v in V]
            fin = functools.reduce(jnp.logical_and, [
                jnp.isfinite(x.hi) for x in
                g_head + g_tail + dd + pvec + qvec + rvec])
            return {"kind": "genpow", "g": g_head + g_tail, "dd": dd,
                    "p": pvec, "q": qvec, "r": rvec, "mu": mu,
                    "d1": d1}, jnp.logical_and(feas, fin)

        def genpow_hs_apply(stg, v):
            """y = mu*(D v + p(p'v) - [q(q'v_h);0] - [0;r(r'v_t)])."""
            d1 = stg["d1"]
            dd, p, qv, rv, mu = (stg["dd"], stg["p"], stg["q"],
                                 stg["r"], stg["mu"])
            w = len(dd)
            cp = None
            for j in range(w):
                t = p[j] * v[j]
                cp = t if cp is None else cp + t
            cq = None
            for j in range(d1):
                t = qv[j] * v[j]
                cq = t if cq is None else cq + t
            cr = None
            for k in range(w - d1):
                t = rv[k] * v[d1 + k]
                cr = t if cr is None else cr + t
            out = []
            for j in range(w):
                y = dd[j] * v[j] + p[j] * cp
                if j < d1:
                    y = y - qv[j] * cq
                elif cr is not None:
                    y = y - rv[j - d1] * cr
                out.append(y * mu)
            return out

        def genpow_hinv_apply(stg, v):
            """(mu H)^-1 v via three Sherman-Morrison rank-1 updates on
            the diagonal base (mirrors cones/ops.mul_Hs_inv genpow)."""
            d1 = stg["d1"]
            dd, mu = stg["dd"], stg["mu"]
            w = len(dd)
            idd = [ar.recip(d) for d in dd]
            p_full = stg["p"]
            q_full = (stg["q"]
                      + [ar.zeros((S8, L128)) for _ in range(w - d1)])
            r_full = ([ar.zeros((S8, L128)) for _ in range(d1)]
                      + stg["r"])

            def base_inv(x):
                return [x[j] * idd[j] for j in range(w)]

            inv = base_inv
            for u, sgn in ((p_full, 1.0), (q_full, -1.0),
                           (r_full, -1.0)):
                Au = inv(u)
                uAu = None
                for j in range(w):
                    t = u[j] * Au[j]
                    uAu = t if uAu is None else uAu + t
                denom = uAu * sgn + 1.0
                denom = ar.where(denom.hi != 0, denom, 1.0)
                idenom = ar.recip(denom)

                def inv(x, prev=inv, u=u, Au=Au, idenom=idenom,
                        sgn=sgn):
                    Ax = prev(x)
                    uAx = None
                    for j in range(w):
                        t = u[j] * Ax[j]
                        uAx = t if uAx is None else uAx + t
                    coef = uAx * idenom * sgn
                    return [Ax[j] - Au[j] * coef for j in range(w)]

            imu = ar.recip(stg["mu"])
            return [y * imu for y in inv(v)]

        def hmul3(H, v):
            h11, h12, h13, h22, h23, h33 = H
            return [h11 * v[0] + h12 * v[1] + h13 * v[2],
                    h12 * v[0] + h22 * v[1] + h23 * v[2],
                    h13 * v[0] + h23 * v[1] + h33 * v[2]]

        def dot3(u, v):
            return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

        def chol3_fac(H):
            """Closed-form 3x3 Cholesky (reference:
            src/utils/mathutils.jl:427-466; mirrors smallops.chol3)."""
            h11, h12, h13, h22, h23, h33 = H
            ok = h11.hi > 0
            l11 = ar.sqrt(ar.dmax(h11, 0.0))
            l11 = ar.where(l11.hi > 0, l11, 1.0)
            i11 = ar.recip(l11)
            l21 = h12 * i11
            l31 = h13 * i11
            d2 = h22 - l21 * l21
            ok = jnp.logical_and(ok, d2.hi > 0)
            l22 = ar.sqrt(ar.dmax(d2, 0.0))
            l22 = ar.where(l22.hi > 0, l22, 1.0)
            i22 = ar.recip(l22)
            l32 = (h23 - l31 * l21) * i22
            d3 = h33 - l31 * l31 - l32 * l32
            ok = jnp.logical_and(ok, d3.hi > 0)
            l33 = ar.sqrt(ar.dmax(d3, 0.0))
            l33 = ar.where(l33.hi > 0, l33, 1.0)
            i33 = ar.recip(l33)
            return (l21, l31, l32, i11, i22, i33), ok

        def chol3_solve_fac(F, b):
            l21, l31, l32, i11, i22, i33 = F
            y1 = b[0] * i11
            y2 = (b[1] - l21 * y1) * i22
            y3 = (b[2] - l31 * y1 - l32 * y2) * i33
            x3 = y3 * i33
            x2 = (y2 - l32 * x3) * i22
            x1 = (y1 - l21 * x2 - l31 * x3) * i11
            return [x1, x2, x3]

        def pd_scaling_3d(Hd, st_g, zt, S, Z):
            """Primal-dual (BFGS) Hs with per-lane usability fallback to
            the local-μ dual form (reference:
            coneops_nonsymmetric_common.jl:50-164)."""
            eps_T = np.float32(np.finfo(np.float64).eps)
            dot_sz = dot3(S, Z)
            mu_l = dot_sz * (1.0 / 3.0)
            mut = dot3(zt, st_g) * (1.0 / 3.0)
            dsv = [S[i] + mu_l * st_g[i] for i in range(3)]
            dzv = [Z[i] + mu_l * zt[i] for i in range(3)]
            dot_dsz = dot3(dsv, dzv)
            de1 = mu_l * mut - 1.0
            Hzt = hmul3(Hd, zt)
            de2 = dot3(zt, Hzt) - mut * mut * 3.0
            usable = functools.reduce(jnp.logical_and, [
                ar.dabs(de1).hi > np.float32(np.sqrt(eps_T)),
                ar.dabs(de2).hi > eps_T,
                dot_sz.hi > 0, dot_dsz.hi > 0])
            de2s = ar.where(de2.hi != 0, de2, 1.0)
            tmp = [mut * st_g[i] - Hzt[i] for i in range(3)]
            ide2 = ar.recip(de2s)

            def hws(i, j):
                return (Hd_at(Hd, i, j)
                        - st_g[i] * st_g[j] * (1.0 / 3.0)
                        - tmp[i] * tmp[j] * ide2)

            w11, w12, w13 = hws(0, 0), hws(0, 1), hws(0, 2)
            w22, w23, w33 = hws(1, 1), hws(1, 2), hws(2, 2)
            frob = (w11 * w11 + w22 * w22 + w33 * w33
                    + (w12 * w12 + w13 * w13 + w23 * w23) * 2.0)
            t = mu_l * ar.sqrt(ar.dmax(frob, 0.0))
            ax = [Z[1] * zt[2] - Z[2] * zt[1],
                  Z[2] * zt[0] - Z[0] * zt[2],
                  Z[0] * zt[1] - Z[1] * zt[0]]
            axn = ar.sqrt(ar.dmax(dot3(ax, ax), 0.0))
            iaxn = ar.recip(ar.where(axn.hi > 0, axn, 1.0))
            ax = [a_ * iaxn for a_ in ax]
            isz = ar.recip(ar.where(dot_sz.hi != 0, dot_sz, 1.0))
            idsz = ar.recip(ar.where(dot_dsz.hi != 0, dot_dsz, 1.0))

            def hspd(i, j):
                return (S[i] * S[j] * isz + dsv[i] * dsv[j] * idsz
                        + t * ax[i] * ax[j])

            pd = (hspd(0, 0), hspd(0, 1), hspd(0, 2),
                  hspd(1, 1), hspd(1, 2), hspd(2, 2))
            fin = functools.reduce(jnp.logical_and,
                                   [jnp.isfinite(e.hi) for e in pd])
            usable = jnp.logical_and(usable, fin)
            fb = tuple(Hd[i] * mu_l for i in range(6))
            return tuple(ar.where(usable, pd[i], fb[i])
                         for i in range(6)), usable

        def Hd_at(H, i, j):
            key = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (0, 2): 2,
                   (2, 0): 2, (1, 1): 3, (1, 2): 4, (2, 1): 4,
                   (2, 2): 5}[(i, j)]
            return H[key]

        def nonsym_grad_hess(kind, a, S, Z):
            if kind == "exp":
                feas = jnp.logical_and(exp_feas_dual(Z),
                                       exp_feas_primal(S))
                g, Hd = exp_grad_hess_dual(Z)
                zt = exp_grad_primal(S)
            else:
                feas = jnp.logical_and(pow_feas_dual(Z, a),
                                       pow_feas_primal(S, a))
                g, Hd = pow_grad_hess_dual(Z, a)
                zt = pow_grad_primal(S, a)
            return g, Hd, zt, feas

        def make_scaling(s, z, mu=None, strat=None):
            """NT scaling update for every cone (reference:
            coneops_nncone.jl:77-89, coneops_socone.jl:75-154; mirrored
            from cones/ops.py update_scaling).  `mu`/`strat` drive the
            nonsymmetric cones' dual vs primal-dual Hs selection."""
            ok = jnp.ones((S8, L128), bool)
            state = []
            for seg_i, (kind, lo, hi) in enumerate(segs):
                sg, zg = s[lo:hi], z[lo:hi]
                if kind == "zero":
                    state.append({"kind": "zero"})
                    continue
                if kind == "genpow":
                    al, d2 = seg_alphas[seg_i]
                    d1 = len(al)
                    U = [zg[j] for j in range(d1)]
                    V = [zg[d1 + k] for k in range(d2)]
                    stg, okg = genpow_state(U, V, al, mu)
                    okg = jnp.logical_and(okg, genpow_feas_primal(
                        [sg[j] for j in range(d1)],
                        [sg[d1 + k] for k in range(d2)], al))
                    ok = jnp.logical_and(ok, okg)
                    state.append(stg)
                    continue
                if kind in ("exp", "pow"):
                    a = seg_alphas[seg_i]
                    S3 = [sg[0], sg[1], sg[2]]
                    Z3 = [zg[0], zg[1], zg[2]]
                    g, Hd, zt, feas = nonsym_grad_hess(kind, a, S3, Z3)
                    pd_hs, _usable = pd_scaling_3d(Hd, g, zt, S3, Z3)
                    dual_hs = tuple(Hd[i] * mu for i in range(6))
                    use_pd = (strat == PRIMAL_DUAL
                              if strat is not None
                              else jnp.zeros((S8, L128), bool))
                    Hs = tuple(ar.where(use_pd, pd_hs[i], dual_hs[i])
                               for i in range(6))
                    fin = functools.reduce(
                        jnp.logical_and,
                        [jnp.isfinite(e.hi) for e in Hs])
                    if "scalefeas" not in _FORCE_OK:
                        ok = jnp.logical_and(ok,
                                             jnp.logical_and(feas, fin))
                    Fc, _okc = chol3_fac(Hs)
                    # chol3 pivot breakdown is NON-FATAL: it is the
                    # double-float endgame killer — near an active
                    # boundary kappa(Hs) reaches ~1/eps_df and the
                    # elimination's pivot cancellation goes negative one
                    # digit before native f64 would (measured: 101 of
                    # 134 ALMOST lanes on the bench exp config trace to
                    # exactly this guard; keeping it fatal only for
                    # PrimalDual lanes still loses 44 lanes to
                    # post-downgrade stalls).  The factor's pivots are
                    # clamped, the refined solve targets the true Hs
                    # operator (hs_apply), and the convergence checks
                    # evaluate true residuals — a degraded factor can
                    # only slow progress, never fake a SOLVED; genuine
                    # stalls still terminate via INSUFFICIENT_PROGRESS.
                    # Deviation from the reference's fatal scaling
                    # checkpoint (src/solver.jl:475-489), strictly more
                    # robust: docs/DEVIATIONS.md #16.
                    state.append({"kind": kind, "g": g, "Hd": Hd,
                                  "Hs": Hs, "F": Fc, "z": Z3})
                    continue
                if kind == "psd":
                    # NT scaling via chol(S), chol(Z), one-sided Jacobi
                    # SVD of A = L2ᵀL1 = UΛVᵀ; R = L1VΛ^{-1/2},
                    # Rinv = Λ^{-1/2}UᵀL2ᵀ (reference
                    # coneops_psdtrianglecone.jl:78-143; mirrors
                    # cones/psd.update_scaling with LAPACK's SVD
                    # replaced by the lane-batched Hestenes sweep).
                    # Breakdown of the S/Z chols is NON-FATAL (clamped
                    # pivots + true-residual checks, same argument as
                    # the nonsym chol3 — docs/DEVIATIONS.md #16); only
                    # non-finite state is.
                    np_ = seg_alphas[seg_i]
                    Sm = psd_unpack(sg, np_)
                    Zm = psd_unpack(zg, np_)
                    L1, _ok1 = mat_chol(Sm)
                    L2, _ok2 = mat_chol(Zm)
                    A3 = mat_mm(mat_T(L2), L1)
                    lam, U, V = jacobi_svd(A3)
                    lam_isqrt = [ar.recip(ar.sqrt(l)) for l in lam]
                    L1V = mat_mm(L1, V)
                    Rm = [[L1V[i2][j2] * lam_isqrt[j2]
                           for j2 in range(np_)] for i2 in range(np_)]
                    UtL2t = mat_mm(mat_T(U), mat_T(L2))
                    Rinv = [[UtL2t[i2][j2] * lam_isqrt[i2]
                             for j2 in range(np_)] for i2 in range(np_)]
                    fin = functools.reduce(jnp.logical_and, [
                        jnp.logical_and(jnp.isfinite(Rm[i2][j2].hi),
                                        jnp.isfinite(Rinv[i2][j2].hi))
                        for i2 in range(np_) for j2 in range(np_)])
                    ok = jnp.logical_and(ok, fin)
                    state.append({"kind": "psd", "R": Rm,
                                  "Rinv": Rinv, "lam": lam,
                                  "np": np_})
                    continue
                if kind == "nn":
                    prod = sg * zg
                    ok = jnp.logical_and(ok, _fall0(prod.hi > 0))
                    prod = ar.dmax(prod, 0.0)
                    zsafe = ar.where(zg.hi != 0, zg, 1.0)
                    ratio = ar.where(zg.hi != 0, sg / zsafe,
                                     ar.zeros(zg.hi.shape))
                    w = ar.sqrt(ar.dmax(ratio, 0.0))
                    lam = ar.sqrt(prod)
                    state.append({"kind": "nn", "w": w, "w2": w * w,
                                  "winv2": ar.recip(w * w), "lam": lam})
                else:
                    d = hi - lo

                    def soc_res_sqrt(X):
                        x1n = ar.sqrt(_vsum0(X[1:] * X[1:]))
                        res = (X[0] - x1n) * (X[0] + x1n)
                        return ar.where(res.hi > 0,
                                        ar.sqrt(ar.dmax(res, 0.0)),
                                        ar.zeros(res.hi.shape)), res

                    zscale, _ = soc_res_sqrt(zg)
                    sscale, _ = soc_res_sqrt(sg)
                    okg = jnp.logical_and(zscale.hi > 0, sscale.hi > 0)
                    zs = ar.where(zscale.hi > 0, zscale, 1.0)
                    ss = ar.where(sscale.hi > 0, sscale, 1.0)
                    zsinv, ssinv = ar.recip(zs), ar.recip(ss)
                    eta = ar.sqrt(ss * zsinv)

                    w0 = sg[0] * ssinv + zg[0] * zsinv
                    w1 = sg[1:] * ssinv - zg[1:] * zsinv
                    w = _vcat([_vstack([w0]), w1])
                    wscale, _ = soc_res_sqrt(w)
                    okg = jnp.logical_and(okg, wscale.hi > 0)
                    ws = ar.where(wscale.hi > 0, wscale, 1.0)
                    w = w * ar.recip(ws)
                    w1sq = _vsum0(w[1:] * w[1:])
                    w0n = ar.sqrt(w1sq + 1.0)
                    w = _vcat([_vstack([w0n]), w[1:]])

                    # scaling point lambda (coneops_socone.jl:115-123)
                    gamma = ws * 0.5
                    den = ar.recip(sg[0] * ssinv + zg[0] * zsinv
                                   + gamma * 2.0)
                    lam1 = ((gamma + zg[0] * zsinv) * ssinv * sg[1:]
                            + (gamma + sg[0] * ssinv) * zsinv * zg[1:]) \
                        * den
                    lam = _vcat([_vstack([gamma]), lam1])
                    lam = lam * ar.sqrt(ss * zs)

                    eta2 = eta * eta
                    wbar = _vcat([_vstack([w[0]]), -w[1:]])  # J w
                    ok = jnp.logical_and(ok, okg)
                    state.append({
                        "kind": "soc", "w": w, "lam": lam, "eta": eta,
                        "eta2": eta2, "etainv": ar.recip(eta),
                        "etainv2": ar.recip(eta2), "wbar": wbar, "d": d,
                    })
            return state, ok

        def hs_diag_hi(state):
            """f32 Hs diagonal (for the static regularization scale)."""
            parts = []
            for stg, (kind, lo, hi) in zip(state, segs):
                if stg is None:
                    continue
                if kind == "zero":
                    parts.append(jnp.zeros((hi - lo, S8, L128),
                                           jnp.float32))
                elif stg["kind"] == "nn":
                    parts.append(stg["w2"].hi)
                elif stg["kind"] in ("exp", "pow"):
                    h = stg["Hs"]
                    parts.append(jnp.stack(
                        [h[0].hi, h[3].hi, h[5].hi], axis=0))
                elif stg["kind"] == "genpow":
                    d1 = stg["d1"]
                    rows = []
                    for j in range(len(stg["dd"])):
                        t = stg["dd"][j] + stg["p"][j] * stg["p"][j]
                        if j < d1:
                            t = t - stg["q"][j] * stg["q"][j]
                        else:
                            t = t - stg["r"][j - d1] * stg["r"][j - d1]
                        rows.append((t * stg["mu"]).hi)
                    parts.append(jnp.stack(rows, axis=0))
                elif stg["kind"] == "psd":
                    # skron(A) diagonal, A = RRᵀ: svec slot (i,i) ->
                    # A_ii²; (i<j) -> A_ii A_jj + A_ij²
                    np_ = stg["np"]
                    R32 = [[stg["R"][i2][j2].hi for j2 in range(np_)]
                           for i2 in range(np_)]
                    A32 = [[functools.reduce(jnp.add, [
                        R32[i2][k] * R32[j2][k] for k in range(np_)])
                        for j2 in range(np_)] for i2 in range(np_)]
                    rows = []
                    for j2 in range(np_):
                        for i2 in range(j2 + 1):
                            if i2 == j2:
                                rows.append(A32[i2][i2] * A32[i2][i2])
                            else:
                                rows.append(A32[i2][i2] * A32[j2][j2]
                                            + A32[i2][j2] * A32[i2][j2])
                    parts.append(jnp.stack(rows, axis=0))
                else:
                    w, eta2 = stg["w"], stg["eta2"]
                    w2 = 2.0 * w.hi * w.hi
                    head = (w2[0:1] - 1.0) * eta2.hi
                    tail = (w2[1:] + 1.0) * eta2.hi
                    parts.append(jnp.concatenate([head, tail], axis=0))
            return jnp.concatenate(parts, axis=0)

        def hinv_apply(state, v, eps):
            """Hs^{-1} v with closed-form per-cone inverses (mirrors
            cones/ops.py mul_Hs_inv, including its 1/eps convention for
            zero-cone rows — their Hs block is 0 and the static
            regularization is the only diagonal, exactly the
            reference's assembled KKT for zero cones).  state None =
            identity scaling (initial point)."""
            out = []
            for i, (kind, vg) in enumerate(seg_slices(v)):
                if kind == "zero":
                    out.append(vg * ar.recip(eps))
                elif state is None:
                    out.append(vg)
                elif kind == "nn":
                    out.append(vg * state[i]["winv2"])
                elif kind == "psd":
                    stg = state[i]
                    np_ = stg["np"]
                    Ri = stg["Rinv"]
                    X = psd_unpack(vg, np_)
                    T1 = mat_mm(mat_mm(Ri, X), mat_T(Ri))
                    Y = mat_mm(mat_mm(mat_T(Ri), T1), Ri)
                    out.append(_vstack(psd_pack(Y, np_)))
                elif kind in ("exp", "pow"):
                    sol = chol3_solve_fac(state[i]["F"],
                                          [vg[0], vg[1], vg[2]])
                    out.append(_vstack(sol))
                elif kind == "genpow":
                    w = vg.hi.shape[0]
                    sol = genpow_hinv_apply(
                        state[i], [vg[j] for j in range(w)])
                    out.append(_vstack(sol))
                else:
                    stg = state[i]
                    wbar = stg["wbar"]
                    ccoef = _vsum0(wbar * vg) * 2.0
                    base = _vcat([_vstack([-vg[0]]), vg[1:]])  # -J v
                    out.append((base + ccoef * wbar) * stg["etainv2"])
            return _vcat(out)

        def hs_apply(state, v):
            """Hs v (mirrors cones/ops.py mul_Hs; zero-cone block is 0
            in the TRUE operator, so refinement drives Ax -> b exactly)."""
            out = []
            for i, (kind, vg) in enumerate(seg_slices(v)):
                if kind == "zero":
                    out.append(ar.zeros(vg.hi.shape))
                elif state is None:
                    out.append(vg)
                elif kind == "nn":
                    out.append(vg * state[i]["w2"])
                elif kind == "psd":
                    stg = state[i]
                    np_ = stg["np"]
                    R = stg["R"]
                    X = psd_unpack(vg, np_)
                    W = mat_mm(mat_mm(mat_T(R), X), R)
                    Y = mat_mm(mat_mm(R, W), mat_T(R))
                    out.append(_vstack(psd_pack(Y, np_)))
                elif kind in ("exp", "pow"):
                    out.append(_vstack(hmul3(state[i]["Hs"],
                                             [vg[0], vg[1], vg[2]])))
                elif kind == "genpow":
                    w = vg.hi.shape[0]
                    out.append(_vstack(genpow_hs_apply(
                        state[i], [vg[j] for j in range(w)])))
                else:
                    stg = state[i]
                    w = stg["w"]
                    c = _vsum0(w * vg) * 2.0
                    base = _vcat([_vstack([-vg[0]]), vg[1:]])
                    out.append((base + c * w) * stg["eta2"])
            return _vcat(out)

        def hs_apply_tf(state, v):
            """Hs v with triple-float accumulation (mirrors hs_apply
            term for term; residual-evaluation path only).  The Hs
            contribution participates in the residual's outer
            cancellation against b and A x, so it must stay TF until
            the final (small) residual is rounded to DF."""
            out = []
            for i, (kind, vg) in enumerate(seg_slices(v)):
                if kind == "zero":
                    out.append(TF.zeros(vg.hi.shape))
                elif state is None:
                    out.append(TF.from_df(vg))
                elif kind == "nn":
                    out.append(df64.tf_prod(vg, state[i]["w2"]))
                elif kind in ("exp", "pow"):
                    h11, h12, h13, h22, h23, h33 = state[i]["Hs"]
                    v3 = [vg[0], vg[1], vg[2]]
                    rows = [
                        df64.tf_sum([df64.tf_prod(h11, v3[0]),
                                     df64.tf_prod(h12, v3[1]),
                                     df64.tf_prod(h13, v3[2])]),
                        df64.tf_sum([df64.tf_prod(h12, v3[0]),
                                     df64.tf_prod(h22, v3[1]),
                                     df64.tf_prod(h23, v3[2])]),
                        df64.tf_sum([df64.tf_prod(h13, v3[0]),
                                     df64.tf_prod(h23, v3[1]),
                                     df64.tf_prod(h33, v3[2])]),
                    ]
                    out.append(_tfstack(rows))
                elif kind == "genpow":
                    stg = state[i]
                    w = vg.hi.shape[0]
                    d1 = stg["d1"]
                    dd, p, qv, rv = (stg["dd"], stg["p"], stg["q"],
                                     stg["r"])
                    vr = [vg[j] for j in range(w)]
                    cp = df64.tf_sum([df64.tf_prod(p[j], vr[j])
                                      for j in range(w)])
                    cq = df64.tf_sum([df64.tf_prod(qv[j], vr[j])
                                      for j in range(d1)])
                    cr = (df64.tf_sum(
                        [df64.tf_prod(rv[k], vr[d1 + k])
                         for k in range(w - d1)]) if w > d1 else None)
                    rows = []
                    for j in range(w):
                        y = (df64.tf_prod(dd[j], vr[j])
                             + df64.tf_scale(cp, p[j]))
                        if j < d1:
                            y = y - df64.tf_scale(cq, qv[j])
                        elif cr is not None:
                            y = y - df64.tf_scale(cr, rv[j - d1])
                        rows.append(df64.tf_scale(y, stg["mu"]))
                    out.append(_tfstack(rows))
                elif kind == "psd":
                    stg = state[i]
                    np_ = stg["np"]
                    R = stg["R"]
                    X = psd_unpack(vg, np_)

                    def mm_df_df_tf(Am, Bm):
                        return [[df64.tf_sum(
                            [df64.tf_prod(Am[i2][k], Bm[k][j2])
                             for k in range(np_)])
                            for j2 in range(np_)] for i2 in range(np_)]

                    def mm_tf_df(Am, Bm):
                        return [[df64.tf_sum(
                            [df64.tf_scale(Am[i2][k], Bm[k][j2])
                             for k in range(np_)])
                            for j2 in range(np_)] for i2 in range(np_)]

                    def mm_df_tf(Am, Bm):
                        return [[df64.tf_sum(
                            [df64.tf_scale(Bm[k][j2], Am[i2][k])
                             for k in range(np_)])
                            for j2 in range(np_)] for i2 in range(np_)]

                    Rt = mat_T(R)
                    P1 = mm_df_df_tf(X, R)          # X R
                    W = mm_df_tf(Rt, P1)            # Rᵀ X R
                    P2 = mm_tf_df(W, Rt)            # W Rᵀ
                    Y = mm_df_tf(R, P2)             # R W Rᵀ
                    rows = []
                    for j2 in range(np_):
                        for i2 in range(j2 + 1):
                            e = Y[i2][j2]
                            rows.append(
                                e if i2 == j2
                                else df64.tf_scale(e, _SR2))
                    out.append(_tfstack(rows))
                else:   # soc
                    stg = state[i]
                    wv = stg["w"]
                    c = _tfdot0(wv, vg)
                    c2 = TF(c.hi * 2.0, c.md * 2.0, c.lo * 2.0)
                    base = _vcat([_vstack([-vg[0]]), vg[1:]])
                    t = TF.from_df(base) + df64.tf_scale(c2, wv)
                    out.append(df64.tf_scale(t, stg["eta2"]))
            return _tfcat(out)

        def chol_factor(Scols):
            """Unrolled dense Cholesky of the n x n condensed matrix;
            returns (L as nested per-lane scalars, 1/L[j][j], ok)."""
            Lm = [[None] * n for _ in range(n)]
            Linvd = [None] * n
            ok = jnp.ones((S8, L128), bool)
            for j in range(n):
                acc = Scols[j][j]
                if j > 0:
                    acc = acc - _vsum0(_vstack([Lm[j][k] * Lm[j][k]
                                                for k in range(j)]))
                ok = jnp.logical_and(ok, acc.hi > 0)
                Ljj = ar.sqrt(ar.dmax(acc, 0.0))
                Ljj = ar.where(Ljj.hi > 0, Ljj, 1.0)
                Lm[j][j] = Ljj
                Linvd[j] = ar.recip(Ljj)
                for i in range(j + 1, n):
                    acc = Scols[j][i]
                    if j > 0:
                        acc = acc - _vsum0(_vstack([Lm[i][k] * Lm[j][k]
                                                    for k in range(j)]))
                    Lm[i][j] = acc * Linvd[j]
            return Lm, Linvd, ok

        def chol_solve(Lm, Linvd, w):
            """L L' x = w by unrolled substitution; w = list of n
            per-lane scalars."""
            y = [None] * n
            for j in range(n):
                acc = w[j]
                if j > 0:
                    acc = acc - _vsum0(_vstack([Lm[j][k] * y[k]
                                                for k in range(j)]))
                y[j] = acc * Linvd[j]
            x = [None] * n
            for i in range(n - 1, -1, -1):
                acc = y[i]
                if i < n - 1:
                    acc = acc - _vsum0(_vstack([Lm[k][i] * x[k]
                                                for k in range(i + 1,
                                                               n)]))
                x[i] = acc * Linvd[i]
            return _vstack(x)

        def build_kkt(state, eps):
            """Condensed normal-equations factor at the given scaling
            state (mirrors kkt/condensed.py assemble_and_factor_condensed)
            plus the true augmented-KKT operator for refinement."""
            HinvA = [hinv_apply(state, c, eps) for c in Acols]
            Scols = []
            for j in range(n):
                col = rmv(Acols, HinvA[j])
                if p_nonzero:
                    col = col + Pcols[j]
                Scols.append(col)
            # + eps I: static diagonal add without scatter (rebuild
            # column; empty slices are skipped — Mosaic rejects
            # zero-size vectors)
            Scols2 = []
            for j in range(n):
                c = Scols[j]
                parts = []
                if j > 0:
                    parts.append(c[0:j])
                parts.append(_vstack([c[j] + eps]))
                if j + 1 < n:
                    parts.append(c[j + 1:])
                Scols2.append(_vcat(parts) if len(parts) > 1
                              else parts[0])
            Lm, Linvd, okc = chol_factor(Scols2)

            def apply_once(bx, bz):
                hb = hinv_apply(state, bz, eps)
                w = [bx[j] + _vdot0(Acols[j], hb) for j in range(n)]
                xs = chol_solve(Lm, Linvd, w)
                zs = hinv_apply(state, mv(Acols, xs) - bz, eps)
                return xs, zs

            def kkt_resid(bx, bz, xs, zs):
                """Residual (bx, bz) - K (xs, zs) of the true augmented
                operator, as a DF pair.  With megakernel_tf_residual
                the products and sums accumulate in triple-float and
                only the (small) residual rounds to DF — the limiting
                accuracy of refined solves then sits at ~2^-72*kappa
                instead of the df ulp's 2^-49*kappa (the round-4
                ALMOST-class wall; docs/STATUS.md)."""
                if use_tf:
                    tops = rmv_tf(Acols, zs)
                    if p_nonzero:
                        tops = [tops[j] + _tfdot0(Pcols[j], xs)
                                for j in range(n)]
                    ex = (TF.from_df(bx) - _tfstack(tops)).to_df()
                    bot = mv_tf(Acols, xs) - hs_apply_tf(state, zs)
                    ez = (TF.from_df(bz) - bot).to_df()
                    return ex, ez
                top = rmv(Acols, zs)
                if p_nonzero:
                    top = top + _vstack([_vdot0(Pcols[j], xs)
                                         for j in range(n)])
                bot = mv(Acols, xs) - hs_apply(state, zs)
                return bx - top, bz - bot

            return apply_once, kkt_resid, okc

        if ar.is_df:
            r_abstol = np.float32(min(st.iterative_refinement_abstol,
                                      1e-14))
            r_reltol = np.float32(min(st.iterative_refinement_reltol,
                                      1e-15))
        else:
            r_abstol = np.float32(1e-7)
            r_reltol = np.float32(3e-7)
        stop_ratio = np.float32(st.iterative_refinement_stop_ratio)
        tiny = np.float32(np.finfo(np.float32).tiny)

        def pair_max(pairs):
            mx = None
            for a, b in pairs:
                v = jnp.maximum(_fmax0(jnp.abs(a.hi)),
                                _fmax0(jnp.abs(b.hi)))
                mx = v if mx is None else jnp.maximum(mx, v)
            return mx

        def refined_solve(apply_once, kkt_resid, rhs_list, passes,
                          adaptive=None):
            """Accept-masked refinement against the true KKT operator
            (mirrors kkt/condensed.py solve_refined_condensed with
            per-lane masking; multi-RHS joint norms).  `adaptive` runs
            the passes as a while_loop that exits once every lane's
            residual meets tolerance (typical solves take 1 pass, the
            worst `passes`); non-adaptive unrolls them (no loop
            machinery — Mosaic pipelines straight-line code better).
            Default: adaptive only when more than one pass is allowed."""
            if adaptive is None:
                adaptive = _ADAPTIVE_REFINE and passes > 1
            sols = [apply_once(bx, bz) for bx, bz in rhs_list]
            if passes <= 0:
                okf = jnp.isfinite(pair_max(sols))
                return sols, okf

            def residuals_of(cur):
                return [kkt_resid(bx, bz, xs, zs)
                        for (bx, bz), (xs, zs) in zip(rhs_list, cur)]

            normb_ = pair_max(rhs_list)
            es = residuals_of(sols)
            norme = pair_max(es)
            ok_f = jnp.isfinite(norme).astype(jnp.float32)
            done_f = jnp.zeros((S8, L128), jnp.float32)

            def one_pass(sols_, es_, norme_, ok_, done_, active):
                """One accept-masked refinement pass on unflattened
                state; ok_/done_ are f32 0/1 masks."""
                ds = [apply_once(ex, ez) for ex, ez in es_]
                news = [(xs + dx, zs + dz)
                        for (xs, zs), (dx, dz) in zip(sols_, ds)]
                newe = residuals_of(news)
                nn_ = pair_max(newe)
                okn = jnp.isfinite(nn_)
                ratio = norme_ / jnp.where(nn_ != 0, nn_, tiny)
                stop = ratio < stop_ratio
                accept = jnp.logical_and(
                    okn,
                    jnp.logical_or(jnp.logical_not(stop), ratio > 1.0))
                accept = jnp.logical_and(accept, active)
                # bool-valued selects as logical algebra: jnp.where on
                # i1 values lowers through an unsupported i8->i1
                # truncation in Mosaic
                nact = jnp.logical_not(active)
                done_n = jnp.logical_or(
                    jnp.logical_and(active,
                                    jnp.logical_or(
                                        stop, jnp.logical_not(okn))),
                    jnp.logical_and(nact, done_ > 0.5))
                ok_n = jnp.logical_and(ok_ > 0.5,
                                       jnp.logical_or(okn, nact))
                sols_n = [(ar.where(accept, nx, xs),
                           ar.where(accept, nz, zs))
                          for (xs, zs), (nx, nz) in zip(sols_, news)]
                es_n = [(ar.where(accept, nex, ex),
                         ar.where(accept, nez, ez))
                        for (ex, ez), (nex, nez) in zip(es_, newe)]
                norme_n = jnp.where(accept, nn_, norme_)
                return (sols_n, es_n, norme_n,
                        ok_n.astype(jnp.float32),
                        done_n.astype(jnp.float32))

            def active_of(norme_, ok_, done_):
                return functools.reduce(jnp.logical_and, [
                    done_ < 0.5, ok_ > 0.5,
                    norme_ > r_abstol + r_reltol * normb_])

            if not adaptive:
                for _ in range(passes):
                    sols, es, norme, ok_f, done_f = one_pass(
                        sols, es, norme, ok_f, done_f,
                        active_of(norme, ok_f, done_f))
                return sols, jnp.logical_and(ok_f > 0.5,
                                             jnp.isfinite(norme))

            def fl(pairs):
                out = []
                for xv, zv in pairs:
                    out.extend(xv.astuple())
                    out.extend(zv.astuple())
                return out

            per = 2 if ar.is_df else 1

            def unfl(arrs):
                pairs = []
                i = 0
                while i < len(arrs):
                    if ar.is_df:
                        xv = DF(arrs[i], arrs[i + 1])
                        zv = DF(arrs[i + 2], arrs[i + 3])
                    else:
                        xv = F1(arrs[i])
                        zv = F1(arrs[i + 1])
                    pairs.append((xv, zv))
                    i += 2 * per
                return pairs

            nsol = 2 * per * len(rhs_list)

            def rcond(c):
                p = c[-1]
                return jnp.logical_and(
                    p < passes,
                    _any_lane(active_of(c[2 * nsol], c[2 * nsol + 1],
                                        c[2 * nsol + 2])))

            def rbody(c):
                sols_ = unfl(c[:nsol])
                es_ = unfl(c[nsol:2 * nsol])
                norme_, ok_, done_, p = (c[2 * nsol], c[2 * nsol + 1],
                                         c[2 * nsol + 2], c[-1])
                sols_n, es_n, norme_n, ok_n, done_n = one_pass(
                    sols_, es_, norme_, ok_, done_,
                    active_of(norme_, ok_, done_))
                return tuple(fl(sols_n) + fl(es_n)
                             + [norme_n, ok_n, done_n,
                                p + jnp.int32(1)])

            carry = tuple(fl(sols) + fl(es)
                          + [norme, ok_f, done_f, jnp.int32(0)])
            final = lax.while_loop(rcond, rbody, carry)
            sols = unfl(final[:nsol])
            norme = final[2 * nsol]
            ok_f = final[2 * nsol + 1]
            return sols, jnp.logical_and(ok_f > 0.5, jnp.isfinite(norme))

        # -- f32 cone helpers (precision-uncritical paths) --

        def margins_f32(vhi):
            """(min margin, sum of positive margins) over all cones."""
            mm = jnp.full((S8, L128), _BIG)
            pm = jnp.zeros((S8, L128), jnp.float32)
            for seg_i, (kind, lo, hi) in enumerate(segs):
                vg = vhi[lo:hi]
                if kind == "zero":
                    continue
                if kind == "nn":
                    mm = jnp.minimum(mm, _fmin0(vg))
                    pm = pm + _fsum0(jnp.maximum(vg, 0.0))
                elif kind == "psd":
                    eigs = psd_eigvals32(
                        psd_unpack32(vg, seg_alphas[seg_i]))
                    for e in eigs:
                        mm = jnp.minimum(mm, e)
                        pm = pm + jnp.maximum(e, 0.0)
                else:
                    a = vg[0] - _norm2_f32(vg[1:])
                    mm = jnp.minimum(mm, a)
                    pm = pm + jnp.maximum(a, 0.0)
            return mm, pm

        def shift_to_interior(v, pd):
            """reference: src/variables.jl:180-208 (both shifts merged;
            zero cones: the primal slack projects to 0, the dual is
            free — cones/ops.scaled_unit_shift semantics)."""
            mm, pm = margins_f32(v.hi)
            mm = jnp.where(jnp.isfinite(mm), mm, -1.0)
            pm = jnp.where(jnp.isfinite(pm), pm, 0.0)
            target = jnp.maximum(1.0, 0.1 * pm / max(degree, 1))
            amt1 = jnp.where(mm <= 0, -mm, 0.0)
            amt2 = jnp.where(mm <= 0, target,
                             jnp.where(mm < target, target - mm, 0.0))
            amt = amt1 + amt2
            # add amt on the cone "unit" positions (all nn rows, SOC
            # heads, PSD svec diagonals), segment-wise to avoid
            # non-scalar trace-time constants (Pallas kernels cannot
            # capture them)
            parts = []
            for seg_i, (kind, vg) in enumerate(seg_slices(v)):
                if kind == "zero":
                    parts.append(ar.zeros(vg.hi.shape)
                                 if pd == "primal" else vg)
                elif kind == "nn":
                    parts.append(vg + ar.lift(amt))
                elif kind == "psd":
                    np_ = seg_alphas[seg_i]
                    rows = []
                    for j in range(np_):
                        for i in range(j + 1):
                            k = j * (j + 1) // 2 + i
                            rows.append(vg[k] + ar.lift(amt)
                                        if i == j else vg[k])
                    parts.append(_vstack(rows))
                else:
                    parts.append(_vcat([_vstack([vg[0] + ar.lift(amt)]),
                                        vg[1:]]))
            return _vcat(parts)

        def soc_step_len(Xd, Yd):
            """Min positive boundary root, batched per lane (reference:
            coneops_socone.jl:443-512).  The boundary quadratic's
            coefficients cancel catastrophically near convergence (the
            SOC is active, so z0^2 - ||z1||^2 ~ mu with z0 ~ 1): a, b,
            c, and the discriminant are formed at `ar` precision; the
            root selection and ratios are f32 (relative precision
            only)."""
            x0, y0 = Xd.hi[0], Yd.hi[0]
            a0 = jnp.where(jnp.logical_and(x0 >= 0, y0 < 0),
                           -x0 / jnp.where(y0 < 0, y0, -1.0), _BIG)

            def soc_res(V):
                return V[0] * V[0] - _vsum0(V[1:] * V[1:])

            a_v = soc_res(Yd)
            b_v = (Xd[0] * Yd[0] - _vsum0(Xd[1:] * Yd[1:])) * 2.0
            c_v = ar.dmax(soc_res(Xd), 0.0)
            d_v2 = b_v * b_v - a_v * c_v * 4.0
            a, b, c, d_ = a_v.hi, b_v.hi, c_v.hi, d_v2.hi
            sqrt_d = jnp.sqrt(jnp.maximum(d_, 0.0))
            t = jnp.where(b >= 0, -b - sqrt_d, -b + sqrt_d)
            t_safe = jnp.where(t != 0, t, 1.0)
            a_safe = jnp.where(a != 0, a, 1.0)
            r1 = jnp.where(t != 0, (2.0 * c) / t_safe, _BIG)
            r2 = jnp.where(a != 0, t / (2.0 * a_safe), _BIG)
            r1 = jnp.where(r1 < 0, _BIG, r1)
            r2 = jnp.where(r2 < 0, _BIG, r2)
            root = jnp.minimum(r1, r2)
            alpha_i = jnp.where(
                jnp.logical_or(jnp.logical_and(a > 0, b > 0), d_ < 0),
                _BIG,
                jnp.where(a == 0, _BIG,
                          jnp.where(c == 0,
                                    jnp.where(a >= 0, _BIG, 0.0),
                                    root)),
            )
            return jnp.minimum(alpha_i, a0)

        def step_length(state, dz, ds, z, s, amax):
            """reference: src/variables.jl:14-43 + per-cone steps.
            Symmetric cones first; with nonsymmetric cones present the
            step is capped below 1 and their feasibility backtracking
            runs jointly over all exp/pow segments (reference:
            coneops_compositecone.jl:205-243,
            coneops_nonsymmetric_common.jl:5-34)."""
            alpha = amax
            for seg_i, (kind, lo, hi) in enumerate(segs):
                if kind in ("zero", "exp", "pow", "genpow"):
                    continue
                dzg, dsg = dz.hi[lo:hi], ds.hi[lo:hi]
                zg, sg = z.hi[lo:hi], s.hi[lo:hi]
                if kind == "psd":
                    # eig-based max step (reference
                    # coneops_psdtrianglecone.jl:230-254,439-466):
                    # min eig of Λ^{-1/2}(WΔ)Λ^{-1/2} per side, f32
                    # (step lengths need relative precision only)
                    stg = state[seg_i]
                    np_ = stg["np"]
                    li32 = [1.0 / jnp.sqrt(jnp.maximum(
                        el.hi, np.float32(np.finfo(np.float32).tiny)))
                        for el in stg["lam"]]

                    def _psd_comp(dhi, Rx, transpose):
                        R32 = [[Rx[i2][j2].hi for j2 in range(np_)]
                               for i2 in range(np_)]
                        D32 = psd_unpack32(dhi, np_)

                        def mm32(Am, Bm):
                            return [[functools.reduce(jnp.add, [
                                Am[i2][k] * Bm[k][j2]
                                for k in range(np_)])
                                for j2 in range(np_)]
                                for i2 in range(np_)]

                        def t32(Am):
                            return [[Am[j2][i2] for j2 in range(np_)]
                                    for i2 in range(np_)]

                        if transpose:
                            Mt = mm32(mm32(R32, D32), t32(R32))
                        else:
                            Mt = mm32(mm32(t32(R32), D32), R32)
                        Ms = [[0.5 * (Mt[i2][j2] + Mt[j2][i2])
                               * li32[i2] * li32[j2]
                               for j2 in range(np_)]
                              for i2 in range(np_)]
                        gmin = functools.reduce(jnp.minimum,
                                                psd_eigvals32(Ms))
                        return jnp.where(
                            gmin < 0,
                            1.0 / jnp.maximum(-gmin, np.float32(1e-30)),
                            _BIG)

                    alpha = jnp.minimum(
                        alpha, _psd_comp(dzg, stg["R"], False))
                    alpha = jnp.minimum(
                        alpha, _psd_comp(dsg, stg["Rinv"], True))
                    continue
                if kind == "nn":
                    az = jnp.where(
                        dzg < 0,
                        -zg / jnp.where(dzg < 0, dzg, -1.0), _BIG)
                    as_ = jnp.where(
                        dsg < 0,
                        -sg / jnp.where(dsg < 0, dsg, -1.0), _BIG)
                    alpha = jnp.minimum(
                        alpha, jnp.minimum(_fmin0(az), _fmin0(as_)))
                else:
                    alpha = jnp.minimum(alpha,
                                        soc_step_len(z[lo:hi],
                                                     dz[lo:hi]))
                    alpha = jnp.minimum(alpha,
                                        soc_step_len(s[lo:hi],
                                                     ds[lo:hi]))
            if not has_nonsym:
                return alpha
            # cap: the reference caps at 1-sqrt(eps_f64), which rounds
            # to 1.0 in f32 alpha arithmetic; use 1-2^-12 instead
            # (docs/DEVIATIONS.md — a marginally smaller cap, same role)
            alpha = jnp.minimum(alpha, np.float32(1.0 - 2.0 ** -12))

            step_bt = np.float32(st.linesearch_backtrack_step)
            alpha_min = np.float32(st.min_terminate_step_length)

            def feas_at(a_arr):
                ad = ar.lift(a_arr)
                okf = jnp.ones((S8, L128), bool)
                for seg_i, (kind, lo, hi) in enumerate(segs):
                    if kind not in ("exp", "pow", "genpow"):
                        continue
                    a = seg_alphas[seg_i]
                    if kind == "genpow":
                        al, d2 = a
                        d1 = len(al)
                        Zt = [z[lo + j] + ad * dz[lo + j]
                              for j in range(d1 + d2)]
                        St = [s[lo + j] + ad * ds[lo + j]
                              for j in range(d1 + d2)]
                        okf = jnp.logical_and(okf, genpow_feas_dual(
                            Zt[:d1], Zt[d1:], al))
                        okf = jnp.logical_and(okf, genpow_feas_primal(
                            St[:d1], St[d1:], al))
                        continue
                    Zt = [z[lo + j] + ad * dz[lo + j] for j in range(3)]
                    St = [s[lo + j] + ad * ds[lo + j] for j in range(3)]
                    if kind == "exp":
                        okf = jnp.logical_and(okf, exp_feas_dual(Zt))
                        okf = jnp.logical_and(okf, exp_feas_primal(St))
                    else:
                        okf = jnp.logical_and(okf, pow_feas_dual(Zt, a))
                        okf = jnp.logical_and(okf,
                                              pow_feas_primal(St, a))
                return okf

            def bt_cond(c):
                i, a_arr, done = c
                return jnp.logical_and(i < 60,
                                       jnp.logical_not(jnp.min(done)))

            def bt_body(c):
                i, a_arr, done = c
                feas = feas_at(a_arr)
                newdone = jnp.logical_or(done > 0, feas)
                a_arr = jnp.where(newdone, a_arr, a_arr * step_bt)
                killed = jnp.logical_and(jnp.logical_not(newdone),
                                         a_arr < alpha_min)
                a_arr = jnp.where(killed, 0.0, a_arr)
                return (i + 1, a_arr,
                        jnp.logical_or(newdone, killed).astype(
                            jnp.float32))

            _, alpha, _ = lax.while_loop(
                bt_cond, bt_body,
                (jnp.int32(0), alpha,
                 jnp.zeros((S8, L128), jnp.float32)))
            return alpha

        def barrier_at(z, s, dz, ds, tau, kappa, dtau, dkappa, a_arr):
            """Total barrier at the shifted point, f32 (reference:
            src/variables.jl:46-72; the <1 safeguard check is
            tolerance-insensitive, docs/DEVIATIONS.md)."""
            af = a_arr
            cur_tau = tau.hi + af * dtau.hi
            cur_kappa = kappa.hi + af * dkappa.hi
            zs = z.hi + af * dz.hi
            ss = s.hi + af * ds.hi
            sz = _fsum0(zs * ss)
            mu_a = (sz + cur_tau * cur_kappa) / (degree + 1)
            bar = ((degree + 1) * _logsafe32(mu_a)
                   - _logsafe32(cur_tau) - _logsafe32(cur_kappa))
            for seg_i, (kind, lo, hi) in enumerate(segs):
                zg, sg = zs[lo:hi], ss[lo:hi]
                if kind == "zero":
                    continue
                if kind == "nn":
                    bar = bar - _fsum0(_logsafe32(sg * zg))
                elif kind == "soc":
                    rs = sg[0] * sg[0] - _fsum0(sg[1:] * sg[1:])
                    rz = zg[0] * zg[0] - _fsum0(zg[1:] * zg[1:])
                    bar = bar + jnp.where(
                        jnp.logical_and(rs > 0, rz > 0),
                        -0.5 * _logsafe32(rs * rz), _BIG)
                elif kind == "psd":
                    np_ = seg_alphas[seg_i]
                    lz, okz = psd_logdet32(psd_unpack32(zg, np_))
                    ls_, oks = psd_logdet32(psd_unpack32(sg, np_))
                    bar = bar + jnp.where(
                        jnp.logical_and(okz, oks), -(lz + ls_), _BIG)
                elif kind == "genpow":
                    al, d2 = seg_alphas[seg_i]
                    bar = bar + _genpow_barrier32(al, d2, zg, sg)
                else:
                    a = seg_alphas[seg_i]
                    bar = bar + _nonsym_barrier32(
                        kind, a, zg[0], zg[1], zg[2],
                        sg[0], sg[1], sg[2])
            return bar

        def _nonsym_barrier32(kind, a, z1, z2, z3, s1, s2, s3):
            """f*(z) + f(s) for one 3-d cone, f32 (reference:
            coneops_expcone.jl:223-310, coneops_powcone.jl:217-326)."""
            if kind == "exp":
                l = _logsafe32(-z3 / jnp.where(z1 != 0, z1, -1.0))
                bd = (-_logsafe32(-z3 * z1)
                      - _logsafe32(z2 - z1 - z1 * l))
                dfeas = jnp.logical_and(
                    jnp.logical_and(z3 > 0, z1 < 0),
                    z2 - z1 - z1 * l > 0)
                s2s = jnp.where(s2 > 0, s2, 1.0)
                s3s = jnp.where(s3 > 0, s3, 1.0)
                arg = 1.0 - s1 / s2s - _logsafe32(s2s / s3s)
                w = _wright_omega32(jnp.maximum(arg, 0.0))
                wm = (w - 1.0) ** 2 / jnp.where(w != 0, w, 1.0)
                bp = (-_logsafe32(wm) - 2.0 * _logsafe32(s2)
                      - _logsafe32(s3) - 3.0)
                pfeas = jnp.logical_and(
                    jnp.logical_and(s3 > 0, s2 > 0),
                    s2 * _logsafe32(s3 / s2s) - s1 > 0)
            else:
                a32 = np.float32(a)
                phid = jnp.exp(2 * a32 * _logsafe32(z1 / a32)
                               + (2 - 2 * a32)
                               * _logsafe32(z2 / (1 - a32)))
                resd = phid - z3 * z3
                bd = (-_logsafe32(resd) - (1 - a32) * _logsafe32(z1)
                      - a32 * _logsafe32(z2))
                dfeas = jnp.logical_and(
                    jnp.logical_and(z1 > 0, z2 > 0), resd > 0)
                # primal barrier via the dual barrier of -grad_primal
                # (reference: coneops_powcone.jl:310-317); the f32 NR
                # suffices for a <1 safeguard check
                x32, big, absf = _pow_nr32(s1, s2, s3, a)
                g3 = jnp.where(big, jnp.sign(s3) * x32, 0.0)
                g1 = jnp.where(big, -(a32 * g3 * s3 + 1.0 + a32) / s1,
                               -(1.0 + a32) / s1)
                g2 = jnp.where(big,
                               -((1 - a32) * g3 * s3 + 2.0 - a32) / s2,
                               -(2.0 - a32) / s2)
                phig = jnp.exp(2 * a32 * _logsafe32(-g1 / a32)
                               + (2 - 2 * a32)
                               * _logsafe32(-g2 / (1 - a32)))
                bp = (_logsafe32(phig - g3 * g3)
                      + (1 - a32) * _logsafe32(-g1)
                      + a32 * _logsafe32(-g2) - 3.0)
                resp = jnp.exp(2 * a32 * _logsafe32(s1)
                               + (2 - 2 * a32) * _logsafe32(s2)) \
                    - s3 * s3
                pfeas = jnp.logical_and(
                    jnp.logical_and(s1 > 0, s2 > 0), resp > 0)
            bd = jnp.where(dfeas, bd, _BIG)
            bp = jnp.where(pfeas, bp, _BIG)
            return bd + bp

        def _genpow_barrier32(al, d2, zg, sg):
            """f*(z) + f(s) for one genpow cone, f32 (reference:
            coneops_genpowcone.jl:237-316; primal via the NR gradient
            and the dual barrier of -g)."""
            d1 = len(al)
            a32 = [np.float32(a) for a in al]

            def phi_dual32(rows):
                acc = 0.0
                for j, a in enumerate(a32):
                    acc = acc + 2.0 * a * _logsafe32(rows[j] / a)
                return jnp.exp(acc)

            z1 = [zg[j] for j in range(d1)]
            z2 = [zg[d1 + k] for k in range(d2)]
            phid = phi_dual32(z1)
            n2z = functools.reduce(jnp.add, [v * v for v in z2]) \
                if d2 else jnp.zeros((S8, L128), jnp.float32)
            resd = phid - n2z
            bd = -_logsafe32(resd)
            for j, a in enumerate(a32):
                bd = bd - (1.0 - a) * _logsafe32(z1[j])
            dfeas = functools.reduce(
                jnp.logical_and, [zj > 0 for zj in z1] + [resd > 0])

            s1 = [sg[j] for j in range(d1)]
            s2 = [sg[d1 + k] for k in range(d2)]
            lphi = 0.0
            for j, a in enumerate(a32):
                lphi = lphi + 2.0 * a * _logsafe32(s1[j])
            phi32 = jnp.exp(lphi)
            n2r = functools.reduce(jnp.add, [v * v for v in s2]) \
                if d2 else jnp.zeros((S8, L128), jnp.float32)
            norm_r = jnp.sqrt(jnp.maximum(n2r, 0.0))
            eps32 = np.float32(np.finfo(np.float32).eps)
            big = norm_r > eps32
            nr = jnp.where(big, norm_r, 1.0)
            psi_c = np.float32(1.0 / sum(a * a for a in al))
            den0 = jnp.where(jnp.abs(phi32 - nr * nr) > 0,
                             phi32 - nr * nr, 1.0)
            x0 = -1.0 / nr + (
                psi_c * nr + jnp.sqrt(jnp.maximum(
                    (phi32 / (nr * nr) + psi_c * psi_c - 1.0) * phi32,
                    0.0))) / den0

            def f0_32(x):
                v = -_logsafe32(2.0 * x / nr + x * x)
                for j, a in enumerate(a32):
                    v = v + 2.0 * a * (
                        _logsafe32(x * nr + (1.0 + a) / a)
                        - _logsafe32(s1[j]))
                return v

            def f1_32(x):
                t1 = x * x
                t2 = 2.0 * x / nr
                v = -(2.0 * x + 2.0 / nr) / jnp.where(
                    t1 + t2 != 0, t1 + t2, 1.0)
                for a in a32:
                    v = v + 2.0 * a * nr / (nr * x + (1.0 + a) / a)
                return v

            def nr_cond(c):
                i, x, done = c
                return jnp.logical_and(i < 50,
                                       jnp.logical_not(jnp.min(done)))

            def nr_body(c):
                i, x, done = c
                d1_ = f1_32(x)
                d1s = jnp.where(d1_ != 0, d1_, 1.0)
                dx = -f0_32(x) / d1s
                stop = functools.reduce(jnp.logical_or, [
                    dx < eps32,
                    jnp.abs(dx / jnp.where(x != 0, x, 1.0))
                    < np.float32(np.sqrt(np.finfo(np.float32).eps)),
                    jnp.abs(d1_) < eps32])
                x = jnp.where(jnp.logical_or(done > 0, stop), x, x + dx)
                return (i + 1, x,
                        jnp.logical_or(done > 0, stop).astype(
                            jnp.float32))

            _, g1, _ = lax.while_loop(
                nr_cond, nr_body,
                (jnp.int32(0), x0,
                 jnp.zeros((S8, L128), jnp.float32)))
            gr = [jnp.where(big, g1 * s2[k] / nr, 0.0)
                  for k in range(d2)]
            gp = [jnp.where(big,
                            -(1.0 + a + a * g1 * norm_r) / s1[j],
                            -(1.0 + a) / s1[j])
                  for j, a in zip(range(d1), a32)]
            # primal barrier = -dual_barrier(-g) - (d1 + 1)
            phig = phi_dual32([-g for g in gp])
            n2g = functools.reduce(jnp.add, [v * v for v in gr]) \
                if d2 else jnp.zeros((S8, L128), jnp.float32)
            bd_g = -_logsafe32(phig - n2g)
            for j, a in enumerate(a32):
                bd_g = bd_g - (1.0 - a) * _logsafe32(-gp[j])
            bp = -bd_g - np.float32(d1 + 1.0)
            pfeas = functools.reduce(
                jnp.logical_and,
                [sj > 0 for sj in s1] + [phi32 - n2r > 0])
            bd = jnp.where(dfeas, bd, _BIG)
            bp = jnp.where(pfeas, bp, _BIG)
            return bd + bp

        def affine_ds(state, s):
            """ds = lambda o lambda (symmetric) or s (nonsymmetric)
            (reference: coneops_compositecone.jl:153-165)."""
            out = []
            for stg, (kind, sg) in zip(state, seg_slices(s)):
                if kind == "zero":
                    out.append(ar.zeros(sg.hi.shape))
                    continue
                if kind in ("exp", "pow", "genpow"):
                    out.append(sg)
                    continue
                if kind == "psd":
                    # λ ∘ λ: diagonal λ_i² on the svec diagonal slots
                    np_ = stg["np"]
                    lamp = stg["lam"]
                    rows = []
                    for j in range(np_):
                        for i in range(j + 1):
                            rows.append(lamp[j] * lamp[j] if i == j
                                        else ar.zeros((S8, L128)))
                    out.append(_vstack(rows))
                    continue
                lam = stg["lam"]
                if kind == "nn":
                    out.append(lam * lam)
                else:
                    x0 = _vsum0(lam * lam)
                    x1 = lam[0] * lam[1:] * 2.0
                    out.append(_vcat([_vstack([x0]), x1]))
            return _vcat(out)

        def _hd_solve_guarded(Hd, b3):
            """u = H_dual^{-1} b with the reference's finite fallback to
            0 (coneops_expcone.jl:319-327 via mathutils chol3)."""
            F, okc = chol3_fac(Hd)
            u = chol3_solve_fac(F, b3)
            fin = functools.reduce(jnp.logical_and,
                                   [jnp.isfinite(ui.hi) for ui in u])
            fin = jnp.logical_and(fin, okc)
            return [ar.where(fin, ui, ar.zeros((S8, L128)))
                    for ui in u]

        def _finite_or_zero3(eta, ok=None):
            """Zero the 3rd-order correction where its f32 hi word left
            representable range.  Near an active cone boundary psi -> 0
            and the correction's psi^-3 intermediates exceed f32's
            ~1e38 span (the reference computes them in f64's 1e308);
            a blown eta corrupts the combined direction and collapses
            the step length to 0 — measured as every pow lane
            terminating INSUFFICIENT_PROGRESS one iteration short of
            convergence.  Dropping eta keeps the sigma*mu*g(z)
            centering shift, which is the essential part at that
            stage."""
            fin = functools.reduce(jnp.logical_and,
                                   [jnp.isfinite(e.hi) for e in eta])
            if ok is not None:
                fin = jnp.logical_and(fin, ok)
            return [ar.where(fin, e, ar.zeros((S8, L128)))
                    for e in eta]

        def exp_higher_corr(Hd, Zc, ds3, v3):
            """3rd-order correction η (reference:
            coneops_expcone.jl:319-366)."""
            u = _hd_solve_guarded(Hd, ds3)
            z1, z2, z3 = Zc
            gpsi3 = -z1 / z3
            gpsi1 = nslogsafe(gpsi3)
            psi = z1 * gpsi1 - z1 + z2
            # same noise-floor guard as pow_higher_corr: psi is a
            # cancellation of O(|z|) terms; below its df noise the
            # psi^-3 correction is garbage
            psi_scale = (ar.dabs(z1 * gpsi1) + ar.dabs(z1)
                         + ar.dabs(z2)).hi
            psi_ok = psi.hi > np.float32(1e-9) * psi_scale
            psi = ar.where(psi_ok, psi, 1.0)
            gpsi = [gpsi1, ar.lift(jnp.ones((S8, L128), jnp.float32)),
                    gpsi3]
            dpu = dot3(gpsi, u)
            dpv = dot3(gpsi, v3)
            ipsi = ar.recip(psi)
            ipsi2 = ipsi * ipsi
            iz1 = ar.recip(z1)
            iz3 = ar.recip(z3)
            coef = ((u[0] * (v3[0] * iz1 - v3[2] * iz3)
                     + u[2] * (z1 * v3[2] * iz3 - v3[0]) * iz3) * psi
                    - dpu * dpv * 2.0) * (ipsi2 * ipsi)
            eta = [g * coef for g in gpsi]
            eta0 = eta[0] + (
                (ipsi - iz1 * 2.0) * u[0] * v3[0] * (iz1 * iz1)
                - u[2] * v3[2] * (iz3 * iz3) * ipsi
                + dpu * ipsi2 * (v3[0] * iz1 - v3[2] * iz3)
                + dpv * ipsi2 * (u[0] * iz1 - u[2] * iz3))
            eta2 = eta[2] + (
                (z1 * ipsi - 1.0) * u[2] * v3[2]
                * (iz3 * iz3 * iz3) * 2.0
                - (u[2] * v3[0] + u[0] * v3[2]) * (iz3 * iz3) * ipsi
                + dpu * ipsi2 * (z1 * v3[2] * (iz3 * iz3) - v3[0] * iz3)
                + dpv * ipsi2 * (z1 * u[2] * (iz3 * iz3)
                                 - u[0] * iz3))
            return _finite_or_zero3([eta0 * 0.5, eta[1] * 0.5,
                                     eta2 * 0.5], psi_ok)

        def pow_higher_corr(Hd, Zc, a, ds3, v3):
            """3rd-order correction η (reference:
            coneops_powcone.jl:329-404)."""
            u = _hd_solve_guarded(Hd, ds3)
            z1, z2, z3 = Zc
            phi = pow_phi_dual(Zc, a)
            psi = phi - z3 * z3
            # near an active boundary psi is the cancellation of two
            # ~equal O(phi) terms; once it sinks below the double-float
            # noise floor of that cancellation the psi^-3 terms are
            # garbage (and can overflow the f32 hi word) — suppress the
            # correction there, keeping the sigma*mu*g(z) shift
            psi_ok = psi.hi > np.float32(1e-9) * (phi.hi
                                                  + (z3 * z3).hi)
            psi = ar.where(psi_ok, psi, 1.0)
            iz1, iz2 = ar.recip(z1), ar.recip(z2)
            gpsi = [phi * iz1 * (2.0 * a),
                    phi * iz2 * (2.0 - 2.0 * a), z3 * (-2.0)]
            Hp11 = phi * (iz1 * iz1) * (2.0 * a * (2.0 * a - 1.0))
            Hp12 = phi * (iz1 * iz2) * (4.0 * a * (1.0 - a))
            Hp22 = phi * (iz2 * iz2) \
                * (2.0 * (1.0 - a) * (1.0 - 2.0 * a))
            dpu = dot3(gpsi, u)
            dpv = dot3(gpsi, v3)
            Hv = [Hp11 * v3[0] + Hp12 * v3[1],
                  Hp12 * v3[0] + Hp22 * v3[1],
                  v3[2] * (-2.0)]
            uHv = u[0] * Hv[0] + u[1] * Hv[1] + u[2] * Hv[2]
            ipsi = ar.recip(psi)
            ipsi2 = ipsi * ipsi
            coef = (uHv * psi - dpu * dpv * 2.0) * (ipsi2 * ipsi)
            coef2 = (phi * (u[0] * iz1 - u[1] * iz2)
                     * (v3[0] * iz1 - v3[1] * iz2) * ipsi
                     * (4.0 * a * (2.0 * a - 1.0) * (1.0 - a)))
            e1 = (coef * gpsi[0]
                  - u[0] * v3[0] * (iz1 * iz1 * iz1)
                  * (2.0 * (1.0 - a))
                  + coef2 * iz1 + Hv[0] * dpu * ipsi2)
            e2 = (coef * gpsi[1]
                  - u[1] * v3[1] * (iz2 * iz2 * iz2) * (2.0 * a)
                  - coef2 * iz2 + Hv[1] * dpu * ipsi2)
            e3 = coef * gpsi[2] + Hv[2] * dpu * ipsi2
            Hu = [Hp11 * u[0] + Hp12 * u[1],
                  Hp12 * u[0] + Hp22 * u[1],
                  u[2] * (-2.0)]
            return _finite_or_zero3(
                [(e1 + Hu[0] * dpv * ipsi2) * 0.5,
                 (e2 + Hu[1] * dpv * ipsi2) * 0.5,
                 (e3 + Hu[2] * dpv * ipsi2) * 0.5], psi_ok)

        def combined_ds_shift(state, dz_mc, ds, sigma_mu):
            """W^{-1}ds o W dz - sigma*mu*e (symmetric; reference:
            coneops_symmetric_common.jl:2-35) or sigma*mu*g(z) - eta
            (nonsymmetric; coneops_nonsymmetric_common.jl:38-47)."""
            out = []
            for seg_i, (stg, (kind, lo, hi)) in enumerate(
                    zip(state, segs)):
                if kind == "zero":
                    out.append(ar.zeros((hi - lo, S8, L128)))
                    continue
                dzg, dsg = dz_mc[lo:hi], ds[lo:hi]
                if kind == "psd":
                    # W⁻¹Δs ∘ WΔz − σμ e (matrix circ = symmetrized
                    # product; reference coneops_symmetric_common.jl
                    # + coneops_psdtrianglecone.jl:409-437)
                    np_ = stg["np"]
                    R, Ri = stg["R"], stg["Rinv"]
                    Dz = psd_unpack(dzg, np_)
                    Ds = psd_unpack(dsg, np_)
                    WDz = mat_mm(mat_mm(mat_T(R), Dz), R)
                    WiDs = mat_mm(mat_mm(Ri, Ds), mat_T(Ri))
                    Pm = mat_mm(WiDs, WDz)
                    Qm = mat_mm(WDz, WiDs)
                    C = [[(Pm[i2][j2] + Qm[i2][j2]) * 0.5
                          for j2 in range(np_)] for i2 in range(np_)]
                    for i2 in range(np_):
                        C[i2][i2] = C[i2][i2] - sigma_mu
                    out.append(_vstack(psd_pack(C, np_)))
                    continue
                if kind == "genpow":
                    # no 3rd-order correction for genpow (reference:
                    # coneops_genpowcone.jl combined_ds_shift)
                    out.append(_vstack(
                        [gj * sigma_mu for gj in stg["g"]]))
                    continue
                if kind in ("exp", "pow"):
                    ds3 = [dsg[0], dsg[1], dsg[2]]
                    v3 = [dzg[0], dzg[1], dzg[2]]
                    if kind == "exp":
                        eta = exp_higher_corr(stg["Hd"], stg["z"],
                                              ds3, v3)
                    else:
                        eta = pow_higher_corr(stg["Hd"], stg["z"],
                                              seg_alphas[seg_i],
                                              ds3, v3)
                    out.append(_vstack(
                        [stg["g"][j] * sigma_mu - eta[j]
                         for j in range(3)]))
                    continue
                if kind == "nn":
                    out.append(dzg * dsg - sigma_mu)
                else:
                    w, eta, etainv = stg["w"], stg["eta"], stg["etainv"]

                    def mul_w(X, inv=False):
                        zeta = _vsum0(w[1:] * X[1:])
                        denom = ar.recip(w[0] + 1.0)
                        if not inv:
                            c = X[0] + zeta * denom
                            y0 = (w[0] * X[0] + zeta) * eta
                            y1 = (X[1:] + c * w[1:]) * eta
                        else:
                            c = -X[0] + zeta * denom
                            y0 = (w[0] * X[0] - zeta) * etainv
                            y1 = (X[1:] + c * w[1:]) * etainv
                        return _vcat([_vstack([y0]), y1])

                    wdz = mul_w(dzg)
                    wids = mul_w(dsg, inv=True)
                    x0 = _vsum0(wids * wdz) - sigma_mu
                    x1 = wids[0] * wdz[1:] + wdz[0] * wids[1:]
                    out.append(_vcat([_vstack([x0]), x1]))
            return _vcat(out)

        def ds_from_dz_offset(state, dsv, z):
            """out = W'(lambda \\ ds) stable form (symmetric; reference:
            coneops_socone.jl:241-268, coneops_compositecone.jl:185-202)
            or ds unchanged (nonsymmetric)."""
            out = []
            for stg, (kind, lo, hi) in zip(state, segs):
                if kind == "zero":
                    out.append(ar.zeros((hi - lo, S8, L128)))
                    continue
                dsg, zg = dsv[lo:hi], z[lo:hi]
                if kind in ("exp", "pow", "genpow"):
                    out.append(dsg)
                elif kind == "psd":
                    # out = Wᵀ(λ \ ds): (λ \ Z)_ij = 2 Z_ij/(λ_i+λ_j)
                    # (reference coneops_psdtrianglecone.jl:218-227)
                    np_ = stg["np"]
                    R, lamp = stg["R"], stg["lam"]
                    Zm = psd_unpack(dsg, np_)
                    X = [[Zm[i2][j2] * 2.0
                          * ar.recip(lamp[i2] + lamp[j2])
                          for j2 in range(np_)] for i2 in range(np_)]
                    Y = mat_mm(mat_mm(R, X), mat_T(R))
                    out.append(_vstack(psd_pack(Y, np_)))
                elif kind == "nn":
                    out.append(dsg / zg)
                else:
                    w, eta, lam = stg["w"], stg["eta"], stg["lam"]
                    z1n = ar.sqrt(_vsum0(zg[1:] * zg[1:]))
                    resz = (zg[0] - z1n) * (zg[0] + z1n)
                    lam1ds1 = _vsum0(lam[1:] * dsg[1:])
                    w1ds1 = _vsum0(w[1:] * dsg[1:])
                    c = (lam[0] * dsg[0] - lam1ds1) * ar.recip(resz)
                    o0 = zg[0] * c
                    o1 = -zg[1:] * c
                    o0 = o0 + eta * w1ds1
                    o1 = o1 + (dsg[1:]
                               + (w1ds1 * ar.recip(w[0] + 1.0))
                               * w[1:]) * eta
                    lam0inv = ar.recip(lam[0])
                    out.append(_vcat([_vstack([o0 * lam0inv]),
                                      o1 * lam0inv]))
            return _vcat(out)

        def residuals(x, z, s, tau, kappa, tinv):
            """reference: src/residuals.jl:1-37 (ipm/loop.py:94-106).
            With megakernel_tf_residual the KKT rhs residuals rx/rz/rtau
            accumulate in triple-float (they are cancellations of O(1)
            terms down to the convergence level; df-rounded rhs noise
            would re-enter the directions at eps_df*kappa even with
            exact refinement)."""
            sz = _vdot0(s, z)
            if use_tf:
                qx_tf = _tfdot0(qe, x)
                bz_tf = _tfdot0(be, z)
                qx, bz = qx_tf.to_df(), bz_tf.to_df()
                Atz = _tfstack(rmv_tf(Acols, z))
                Ax_tf = mv_tf(Acols, x)
                rx_inf = (-Atz).to_df()
                rz_inf = (TF.from_df(s) + Ax_tf).to_df()
                qtau = df64.tf_prod(qe, tau)
                if p_nonzero:
                    Px_tf = _tfstack([_tfdot0(Pcols[j], x)
                                      for j in range(n)])
                    Px = Px_tf.to_df()
                    rx = (-(Atz + Px_tf + qtau)).to_df()
                else:
                    Px = ar.zeros((n, S8, L128))
                    rx = (-(Atz + qtau)).to_df()
                xPx = _vdot0(x, Px)
                rz = (TF.from_df(s) + Ax_tf
                      - df64.tf_prod(be, tau)).to_df()
                rtau = (qx_tf + bz_tf + TF.from_df(kappa)
                        + df64.tf_prod(xPx, tinv)).to_df()
            else:
                qx = _vdot0(qe, x)
                bz = _vdot0(be, z)
                Px = (_vstack([_vdot0(Pcols[j], x) for j in range(n)])
                      if p_nonzero else ar.zeros((n, S8, L128)))
                xPx = _vdot0(x, Px)
                rx_inf = -rmv(Acols, z)
                rz_inf = s + mv(Acols, x)
                rx = rx_inf - Px - qe * tau
                rz = rz_inf - be * tau
                rtau = qx + bz + kappa + xPx * tinv
            return dict(rx=rx, rz=rz, rtau=rtau, rx_inf=rx_inf,
                        rz_inf=rz_inf, Px=Px, qx=qx, bz=bz, sz=sz,
                        xPx=xPx)

        def compute_info(res, x, z, s, tau, kappa, tinv):
            """reference: src/info.jl:1-63 (ipm/loop.py:113-153).
            Costs/gap at `ar` precision (cancellation); norms in f32."""
            xPx_half = res["xPx"] * tinv * tinv * 0.5
            cost_primal = (res["qx"] * tinv + xPx_half) * cinv
            cost_dual = (-res["bz"] * tinv - xPx_half) * cinv
            tinv_f = tinv.hi
            normx = _norm2_f32(dat.d_f * x.hi)
            normz = _norm2_f32(dat.e_f * z.hi) * dat.cinv_hi
            norms = _norm2_f32(dat.einv_hi * s.hi)
            res_primal_inf = (_norm2_f32(dat.dinv_hi * res["rx_inf"].hi)
                              * dat.cinv_hi) / jnp.maximum(1.0, normz)
            res_dual_inf = jnp.maximum(
                _norm2_f32(dat.dinv_hi * res["Px"].hi)
                / jnp.maximum(1.0, normx),
                _norm2_f32(dat.einv_hi * res["rz_inf"].hi)
                / jnp.maximum(1.0, normx + norms))
            normx = normx * tinv_f
            normz = normz * tinv_f
            norms = norms * tinv_f
            res_primal = (_norm2_f32(dat.einv_hi * res["rz"].hi)
                          * tinv_f
                          / jnp.maximum(1.0, dat.normb + normx + norms))
            res_dual = (_norm2_f32(dat.dinv_hi * res["rx"].hi) * tinv_f
                        * dat.cinv_hi
                        / jnp.maximum(1.0, dat.normq + normx + normz))
            gap_abs = ar.dabs(cost_primal - cost_dual).hi
            gap_rel = gap_abs / jnp.maximum(
                1.0, jnp.minimum(jnp.abs(cost_primal.hi),
                                 jnp.abs(cost_dual.hi)))
            ktratio = kappa.hi * tinv_f
            return dict(cost_primal=cost_primal, cost_dual=cost_dual,
                        res_primal=res_primal, res_dual=res_dual,
                        res_primal_inf=res_primal_inf,
                        res_dual_inf=res_dual_inf, gap_abs=gap_abs,
                        gap_rel=gap_rel, ktratio=ktratio)

        def eps_of(diag_hi):
            maxdiag = jnp.maximum(
                _fmax0(jnp.abs(jnp.stack(
                    [Pcols[j].hi[j] for j in range(n)], axis=0)))
                if p_nonzero else jnp.zeros((S8, L128), jnp.float32),
                _fmax0(jnp.abs(diag_hi)))
            return ar.lift(
                np.float32(st.static_regularization_constant)
                + np.float32(st.static_regularization_proportional)
                * maxdiag)

        ops = type("Ops", (), {})()
        ops.ar = ar
        ops.dat = dat
        for name, fn in list(locals().items()):
            if callable(fn) and not name.startswith("_"):
                setattr(ops, name, fn)
        return ops

    def check_convergence(info, dot_bz_hi, dot_qx_hi, tols):
        (tol_gap_abs, tol_gap_rel, tol_feas, tol_infeas_abs,
         tol_infeas_rel, tol_ktratio, solved_st, pinf_st, dinf_st) = tols
        is_solved = jnp.logical_and(
            jnp.logical_or(info["gap_abs"] < tol_gap_abs,
                           info["gap_rel"] < tol_gap_rel),
            jnp.logical_and(info["res_primal"] < tol_feas,
                            info["res_dual"] < tol_feas))
        solved = jnp.logical_and(info["ktratio"] <= 1.0, is_solved)
        kt_big = info["ktratio"] > np.float32(1000.0 / tol_ktratio)
        pinf = jnp.logical_and(
            dot_bz_hi < -tol_infeas_abs,
            info["res_primal_inf"] < -tol_infeas_rel * dot_bz_hi)
        dinf = jnp.logical_and(
            dot_qx_hi < -tol_infeas_abs,
            info["res_dual_inf"] < -tol_infeas_rel * dot_qx_hi)
        return jnp.where(
            solved, solved_st,
            jnp.where(jnp.logical_and(kt_big, pinf), pinf_st,
                      jnp.where(jnp.logical_and(kt_big, dinf), dinf_st,
                                UNSOLVED))).astype(jnp.int32)

    full_tols = (np.float32(st.tol_gap_abs), np.float32(st.tol_gap_rel),
                 np.float32(st.tol_feas), np.float32(st.tol_infeas_abs),
                 np.float32(st.tol_infeas_rel), st.tol_ktratio,
                 SOLVED, PINF, DINF)
    reduced_tols = (np.float32(st.reduced_tol_gap_abs),
                    np.float32(st.reduced_tol_gap_rel),
                    np.float32(st.reduced_tol_feas),
                    np.float32(st.reduced_tol_infeas_abs),
                    np.float32(st.reduced_tol_infeas_rel),
                    st.reduced_tol_ktratio,
                    ALMOST_SOLVED, ALMOST_PINF, ALMOST_DINF)

    OUTD = n + 2 * m + 13

    def pc_step(ops, x, z, s, tau, kappa, tinv, res, mu, iters1,
                refine_passes, strat=None):
        """One Mehrotra predictor-corrector step (shared by both
        precision phases): scaling update, condensed KKT factor, fused
        2-RHS affine solve, corrector solve, tau recovery, step length.
        Returns (dx, dz, dsv, dtau, dkappa, alpha, sigma, kkt_fail)
        with alpha already scaled by max_step_fraction.  `strat` (per
        lane) selects primal-dual vs dual scaling on nonsymmetric
        cones."""
        ar = ops.ar
        qe, be = ops.dat.qe, ops.dat.be
        Pcols = ops.dat.Pcols

        state, ok_scale = ops.make_scaling(s, z, mu, strat)
        eps = ops.eps_of(ops.hs_diag_hi(state))
        apply1, kktmv1, ok_chol = ops.build_kkt(state, eps)
        if "scale" in _FORCE_OK:
            ok_scale = jnp.ones((S8, L128), bool)
        if "chol" in _FORCE_OK:
            ok_chol = jnp.ones((S8, L128), bool)
        ok_kkt = jnp.logical_and(ok_scale, ok_chol)

        aff_ds = ops.affine_ds(state, s)
        # fused 2-RHS solve: constant [-q; b] + affine [rx; s - rz]
        sols, ok1 = ops.refined_solve(
            apply1, kktmv1,
            [(-qe, be), (res["rx"], s - res["rz"])], refine_passes)
        (x2, z2), (x1a, z1a) = sols
        if "refine" in _FORCE_OK:
            ok1 = jnp.ones((S8, L128), bool)
        ok_kkt = jnp.logical_and(ok_kkt, ok1)

        # tau recovery pieces invariant across the two solves
        xi = x * tinv
        xi_m_x2 = xi - x2
        if p_nonzero:
            PX1 = lambda v: _vstack([_vdot0(Pcols[j], v)
                                     for j in range(n)])
            tau_den = (kappa * tinv - _vdot0(qe, x2)
                       - _vdot0(be, z2)
                       + _vdot0(xi_m_x2, PX1(xi_m_x2))
                       - _vdot0(x2, PX1(x2)))
        else:
            tau_den = (kappa * tinv - _vdot0(qe, x2)
                       - _vdot0(be, z2))

        def tau_recovery(x1, z1, ds_const, rhs_tau, rhs_kappa):
            """reference: src/kktsystem.jl:135-215."""
            tau_num = (rhs_tau - rhs_kappa * tinv
                       + _vdot0(qe, x1) + _vdot0(be, z1))
            if p_nonzero:
                tau_num = tau_num + _vdot0(xi, PX1(x1)) * 2.0
            dtau = tau_num / tau_den
            dx = x1 + x2 * dtau
            dz = z1 + z2 * dtau
            dsv = -(ops.hs_apply(state, dz) + ds_const)
            dkappa = -(rhs_kappa + kappa * dtau) * tinv
            return dx, dz, dsv, dtau, dkappa

        # affine step (reference: src/variables.jl:107-121)
        dxa, dza, dsa, dtaua, dkappaa = tau_recovery(
            x1a, z1a, s, res["rtau"], tau * kappa)
        a_tau = jnp.where(dtaua.hi < 0,
                          -tau.hi / jnp.where(dtaua.hi < 0, dtaua.hi,
                                              -1.0), _BIG)
        a_kap = jnp.where(dkappaa.hi < 0,
                          -kappa.hi / jnp.where(dkappaa.hi < 0,
                                                dkappaa.hi, -1.0),
                          _BIG)
        amax = jnp.minimum(jnp.minimum(a_tau, a_kap), 1.0)
        alpha_aff = ops.step_length(state, dza, dsa, z, s, amax)
        sigma = (1.0 - alpha_aff) ** 3
        m_corr = jnp.where(iters1 > 1, 1.0, alpha_aff)
        sigma_mu = ar.lift(sigma) * mu

        # combined step rhs (reference: src/variables.jl:124-162)
        shift = ops.combined_ds_shift(state, dza * ar.lift(m_corr),
                                      dsa, sigma_mu)
        comb_s = aff_ds + shift
        one_m_sigma = ar.lift(1.0 - sigma)
        comb_x = res["rx"] * one_m_sigma
        comb_z = res["rz"] * one_m_sigma
        comb_tau = res["rtau"] * one_m_sigma
        comb_kappa = (-sigma_mu + dtaua * dkappaa * ar.lift(m_corr)
                      + tau * kappa)

        ds_const = ops.ds_from_dz_offset(state, comb_s, z)
        solsc, ok3 = ops.refined_solve(
            apply1, kktmv1, [(comb_x, ds_const - comb_z)],
            refine_passes)
        x1c, z1c = solsc[0]
        dx, dz, dsv, dtau, dkappa = tau_recovery(
            x1c, z1c, ds_const, comb_tau, comb_kappa)
        if "refine" in _FORCE_OK:
            ok3 = jnp.ones((S8, L128), bool)
        ok_kkt = jnp.logical_and(ok_kkt, ok3)
        kkt_fail = jnp.logical_not(ok_kkt)

        # final step length (combined scaled by max_step_fraction)
        a_tau = jnp.where(dtau.hi < 0,
                          -tau.hi / jnp.where(dtau.hi < 0, dtau.hi,
                                              -1.0), _BIG)
        a_kap = jnp.where(dkappa.hi < 0,
                          -kappa.hi / jnp.where(dkappa.hi < 0,
                                                dkappa.hi, -1.0),
                          _BIG)
        amax = jnp.minimum(jnp.minimum(a_tau, a_kap), 1.0)
        alpha = ops.step_length(state, dz, dsv, z, s, amax)
        alpha = alpha * np.float32(st.max_step_fraction)
        if has_nonsym:
            # extra barrier backtrack for asymmetric dual scaling
            # (reference: src/solver.jl:407-442); applied to lanes on
            # the Dual strategy
            step_bt = np.float32(st.linesearch_backtrack_step)
            ls_max = int(st.linesearch_max_iter)

            def bb_cond(c):
                i, a_arr, done = c
                return jnp.logical_and(i < ls_max,
                                       jnp.logical_not(jnp.min(done)))

            def bb_body(c):
                i, a_arr, done = c
                bar = ops.barrier_at(z, s, dz, dsv, tau, kappa,
                                     dtau, dkappa, a_arr)
                good = bar < 1.0
                newdone = jnp.logical_or(done > 0, good)
                a_arr = jnp.where(newdone, a_arr, a_arr * step_bt)
                return (i + 1, a_arr, newdone.astype(jnp.float32))

            _, alpha_bt, _ = lax.while_loop(
                bb_cond, bb_body,
                (jnp.int32(0), alpha,
                 jnp.zeros((S8, L128), jnp.float32)))
            if strat is not None:
                alpha = jnp.where(strat == DUAL, alpha_bt, alpha)
            else:
                alpha = alpha_bt
        return dx, dz, dsv, dtau, dkappa, alpha, sigma, kkt_fail

    # ------------------------------------------------------------------
    # the kernel
    # ------------------------------------------------------------------

    def compute(Phi, Plo, qhi, qlo, Ahi, Alo, bhi, blo):
        """The whole solve as a pure array function over one 1024-lane
        block.  The Pallas kernel below is a thin ref wrapper; tests can
        `jax.jit` this directly (fast on CPU — no kernel interpreter)."""
        # ---- raw data as stacked DF (column-major flats) ----
        Praw = DF(Phi, Plo)                 # (n*n, 8, 128), [j*n+i]
        qraw = DF(qhi, qlo)                 # (n, 8, 128)
        Araw = DF(Ahi, Alo)                 # (n*m, 8, 128), [j*m+k]
        braw = DF(bhi, blo)                 # (m, 8, 128)

        # ---- Ruiz equilibration, f32 norms, one exact df application
        # (mirrors ipm/equilibration.py; the scalings are a heuristic
        # CHOICE, so computing them in f32 is exact-by-definition — the
        # df application below is what preserves the problem) ----
        if st.equilibrate_enable:
            smin = np.float32(st.equilibrate_min_scaling)
            smax = np.float32(st.equilibrate_max_scaling)
            Pa = jnp.abs(Praw.hi).reshape(n, n, S8, L128)   # [j, i]
            Aa = jnp.abs(Araw.hi).reshape(n, m, S8, L128)   # [j, k]
            qa = jnp.abs(qraw.hi)
            d_f = jnp.ones((n, S8, L128), jnp.float32)
            e_f = jnp.ones((m, S8, L128), jnp.float32)
            c_f = jnp.ones((S8, L128), jnp.float32)
            for _ in range(st.equilibrate_max_iter):
                pcol = jnp.max(Pa, axis=1)          # (n, 8, 128)
                acol = jnp.max(Aa, axis=1)          # (n, 8, 128)
                dwork = jnp.maximum(pcol, acol)
                ework = jnp.max(Aa, axis=0)         # (m, 8, 128)
                dwork = jnp.where(dwork == 0, 1.0, dwork)
                ework = jnp.where(ework == 0, 1.0, ework)
                dwork = 1.0 / jnp.sqrt(dwork)
                ework = 1.0 / jnp.sqrt(ework)
                dwork = jnp.clip(dwork, smin / d_f, smax / d_f)
                ework = jnp.clip(ework, smin / e_f, smax / e_f)
                Pa = Pa * dwork[:, None] * dwork[None, :, :]
                Aa = Aa * dwork[:, None] * ework[None, :, :]
                qa = qa * dwork
                d_f = d_f * dwork
                e_f = e_f * ework
                mean_p = jnp.mean(jnp.max(Pa, axis=1), axis=0)
                inf_q = jnp.max(qa, axis=0)
                do_cost = jnp.logical_and(mean_p != 0, inf_q != 0)
                scale_cost = jnp.maximum(inf_q, mean_p)
                ctmp = jnp.where(
                    do_cost,
                    jnp.clip(1.0 / jnp.where(scale_cost != 0,
                                             scale_cost, 1.0),
                             smin / c_f, smax / c_f),
                    1.0)
                Pa = Pa * ctmp
                qa = qa * ctmp
                c_f = c_f * ctmp
            # cone rectification: scalar (mean) scaling on SOC rows
            # (reference: coneops_defaults.jl:32-44)
            e_parts = []
            for kind, lo, hi in segs:
                eg = e_f[lo:hi]
                if kind in ("nn", "zero"):
                    e_parts.append(eg)
                else:
                    mean = jnp.mean(eg, axis=0)
                    e_parts.append(jnp.broadcast_to(mean[None],
                                                    eg.shape))
            e_f = jnp.concatenate(e_parts, axis=0)
        else:
            d_f = jnp.ones((n, S8, L128), jnp.float32)
            e_f = jnp.ones((m, S8, L128), jnp.float32)
            c_f = jnp.ones((S8, L128), jnp.float32)

        d_df, e_df, c_df = DF(d_f), DF(e_f), DF(c_f)
        dinv = df64.recip(d_df)
        einv = df64.recip(e_df)
        cinv = df64.recip(c_df)

        # exact df application of the scalings
        qe = qraw * (d_df * c_df)
        be = braw * e_df
        Pcols = []
        if p_nonzero:
            for j in range(n):
                colscale = d_df * (d_df[j] * c_df)
                Pcols.append(Praw[j * n:(j + 1) * n] * colscale)
        else:
            Pcols = [DF.zeros((n, S8, L128)) for _ in range(n)]
        Acols = [Araw[j * m:(j + 1) * m] * (e_df * d_df[j])
                 for j in range(n)]

        normq = _fmax0(jnp.abs(dinv.hi * qe.hi)) * cinv.hi
        normb = _fmax0(jnp.abs(einv.hi * be.hi))

        dat64 = _Dat(Pcols, Acols, qe, be, cinv, d_f, e_f,
                     dinv.hi, einv.hi, cinv.hi, normq, normb)
        ops64 = make_ops(_ArDF, dat64)

        def _debug_out(xv: DF, zv: DF, sv: DF):
            pad = OUTD - (n + 2 * m)
            zt = jnp.zeros((S8, L128), jnp.float32)
            sc = _vstack([DF(zt)] * pad)
            o = _vcat([xv, zv, sv, sc])
            ints = jnp.stack([jnp.zeros((S8, L128), jnp.int32),
                              jnp.zeros((S8, L128), jnp.int32)], axis=0)
            return o.hi, o.lo, ints

        if _DEBUG_STAGE == 1:
            return _debug_out(qe, be, be)

        # ---- initial point (reference: src/solver.jl:383-404) ----
        if has_nonsym:
            # asymmetric problems: unit initialization for EVERY cone
            # (reference: src/solver.jl:400-403, variables.jl:213-226;
            # mirrors cones/ops.unit_initialization).  Built from
            # SCALAR fills only — Pallas kernels cannot capture array
            # constants (same constraint as shift_to_interior).
            def _row_const(v):
                hi32 = np.float32(v)
                lo32 = np.float32(float(v) - float(hi32))
                return DF(jnp.full((1, S8, L128), hi32),
                          jnp.full((1, S8, L128), lo32))

            zparts = []
            for seg_i, (kind, lo, hi) in enumerate(segs):
                w = hi - lo
                if kind == "zero":
                    zparts.append(DF.zeros((w, S8, L128)))
                elif kind == "nn":
                    zparts.append(DF(jnp.ones((w, S8, L128),
                                             jnp.float32)))
                elif kind == "soc":
                    zparts.append(_row_const(1.0))
                    if w > 1:
                        zparts.append(DF.zeros((w - 1, S8, L128)))
                elif kind == "exp":
                    # reference: coneops_expcone.jl:36-52
                    for v in (-1.051383945322714, 0.556409619469370,
                              1.258967884768947):
                        zparts.append(_row_const(v))
                elif kind == "genpow":
                    al, d2 = seg_alphas[seg_i]
                    for a in al:
                        zparts.append(_row_const(math.sqrt(1.0 + a)))
                    if d2:
                        zparts.append(DF.zeros((d2, S8, L128)))
                elif kind == "psd":
                    np_ = seg_alphas[seg_i]
                    for j in range(np_):
                        if j:
                            zparts.append(DF.zeros((j, S8, L128)))
                        zparts.append(_row_const(1.0))
                else:
                    a = seg_alphas[seg_i]
                    zparts.append(_row_const(math.sqrt(1.0 + a)))
                    zparts.append(_row_const(math.sqrt(2.0 - a)))
                    zparts.append(DF.zeros((1, S8, L128)))
            z0 = _vcat(zparts)
            s0 = z0
            x0 = DF.zeros((n, S8, L128))
        else:
            eps0 = ops64.eps_of(jnp.ones((m, S8, L128), jnp.float32))
            apply0, kktmv0, ok0 = ops64.build_kkt(None, eps0)
            if p_nonzero:
                sols, _ok = ops64.refined_solve(apply0, kktmv0,
                                                [(-qe, be)], refine_df)
                x0, z0 = sols[0]
                s0 = -z0
            else:
                zer_n = DF.zeros((n, S8, L128))
                zer_m = DF.zeros((m, S8, L128))
                sols, _ok = ops64.refined_solve(
                    apply0, kktmv0, [(zer_n, be), (-qe, zer_m)],
                    refine_df)
                x0, ms = sols[0]
                s0 = -ms
                z0 = sols[1][1]
            s0 = ops64.shift_to_interior(s0, "primal")
            z0 = ops64.shift_to_interior(z0, "dual")
        one = DF(jnp.ones((S8, L128), jnp.float32))
        tau0 = one
        kappa0 = one

        if _DEBUG_STAGE == 2:
            return _debug_out(x0, z0, s0)

        # ---- main loop ----
        fzero = jnp.zeros((S8, L128), jnp.float32)
        izero = jnp.zeros((S8, L128), jnp.int32)
        carry0 = (
            x0.hi, x0.lo, z0.hi, z0.lo, s0.hi, s0.lo,
            tau0.hi, tau0.lo, kappa0.hi, kappa0.lo,
            x0.hi, x0.lo, z0.hi, z0.lo, s0.hi, s0.lo,
            tau0.hi, tau0.lo, kappa0.hi, kappa0.lo,
            jnp.full((S8, L128), _BIG), jnp.full((S8, L128), _BIG),
            jnp.full((S8, L128), _BIG), jnp.full((S8, L128), _BIG),
            jnp.full((S8, L128), _BIG),  # mu
            fzero,                        # alpha
            jnp.ones((S8, L128), jnp.float32),  # sigma
            izero,                              # iters
            jnp.full((S8, L128), UNSOLVED, jnp.int32),  # status
            izero,                              # hand (phase-1 handoff)
            # scaling strategy (nonsymmetric cones start PrimalDual and
            # may downgrade to Dual; genpow pins the composite to Dual;
            # reference src/types.jl:73-76, ipm/loop.py scaling0)
            jnp.full((S8, L128),
                     PRIMAL_DUAL if allows_pd else DUAL, jnp.int32),
        )

        def unpack(c, ar):
            x = ar.make(c[0], c[1])
            z = ar.make(c[2], c[3])
            s = ar.make(c[4], c[5])
            tau = ar.make(c[6], c[7])
            kappa = ar.make(c[8], c[9])
            px = ar.make(c[10], c[11])
            pz = ar.make(c[12], c[13])
            ps = ar.make(c[14], c[15])
            ptau = ar.make(c[16], c[17])
            pkap = ar.make(c[18], c[19])
            return (x, z, s, tau, kappa, px, pz, ps, ptau, pkap,
                    c[20], c[21], c[22], c[23], c[24], c[25], c[26],
                    c[27], c[28], c[29])

        # ---- phase 1: plain-f32 iterations while mu is large ----
        dat32 = dat64.to_f32()
        ops32 = make_ops(_ArF32, dat32)

        def wsel32(mask, new, oldh, oldl):
            """Masked carry write from an F1 value (lo resets to 0)."""
            return (jnp.where(mask, new.hi, oldh),
                    jnp.where(mask, jnp.zeros_like(oldl), oldl))

        def loop_cond1(c):
            # any lane not yet handed off (phase 1 never sets statuses)
            return jnp.min(c[29]) == 0

        def loop_body1(c):
            ar = _ArF32
            (x, z, s, tau, kappa, px, pz, ps, ptau, pkap,
             prev_rp, prev_rd, prev_ga, prev_gr,
             mu_f, alpha_f, sigma_f, iters, status, hand) = unpack(c, ar)
            active = jnp.logical_and(status == UNSOLVED, hand == 0)

            tinv = ar.recip(tau)
            res = ops32.residuals(x, z, s, tau, kappa, tinv)
            mu = (res["sz"] + tau * kappa) * (1.0 / (degree + 1))
            info = ops32.compute_info(res, x, z, s, tau, kappa, tinv)

            # handoff at top of loop: mu reached the switch point, mu
            # stopped contracting (f32 floor), or the phase-1 cap hit
            hand_top = functools.reduce(jnp.logical_or, [
                mu.hi < switch_mu,
                jnp.logical_not(jnp.isfinite(mu.hi)),
                iters >= p1_cap,
                jnp.logical_and(iters >= _P1_STALL_FROM_ITER,
                                mu.hi > _P1_STALL_RATIO * mu_f),
            ])
            do = jnp.logical_and(active, jnp.logical_not(hand_top))
            iters1 = iters + jnp.where(do, 1, 0).astype(jnp.int32)

            (dx, dz, dsv, dtau, dkappa, alpha, sigma,
             kkt_fail) = pc_step(ops32, x, z, s, tau, kappa, tinv, res,
                                 mu, iters1, refine_f32)

            small_term = alpha <= _P1_MIN_STEP
            take = jnp.logical_and(jnp.logical_not(kkt_fail),
                                   jnp.logical_not(small_term))
            alpha_eff = jnp.where(take, alpha, 0.0)
            dotake = jnp.logical_and(do, take)
            hand_fail = jnp.logical_and(do, jnp.logical_not(take))
            a = ar.lift(alpha_eff)

            xn = wsel32(dotake, x + dx * a, c[0], c[1])
            zn = wsel32(dotake, z + dz * a, c[2], c[3])
            sn = wsel32(dotake, s + dsv * a, c[4], c[5])
            taun = wsel32(dotake, tau + dtau * a, c[6], c[7])
            kapn = wsel32(dotake, kappa + dkappa * a, c[8], c[9])
            pxn = wsel32(dotake, x, c[10], c[11])
            pzn = wsel32(dotake, z, c[12], c[13])
            psn = wsel32(dotake, s, c[14], c[15])
            ptaun = wsel32(dotake, tau, c[16], c[17])
            pkapn = wsel32(dotake, kappa, c[18], c[19])

            prev_rp_n = jnp.where(dotake, info["res_primal"], prev_rp)
            prev_rd_n = jnp.where(dotake, info["res_dual"], prev_rd)
            prev_ga_n = jnp.where(dotake, info["gap_abs"], prev_ga)
            prev_gr_n = jnp.where(dotake, info["gap_rel"], prev_gr)
            mu_n = jnp.where(active, mu.hi, mu_f)
            alpha_n = jnp.where(do, alpha_eff, alpha_f)
            sigma_n = jnp.where(do, sigma, sigma_f)
            hand_n = jnp.where(
                jnp.logical_and(active,
                                jnp.logical_or(hand_top, hand_fail)),
                1, hand).astype(jnp.int32)

            return (xn[0], xn[1], zn[0], zn[1], sn[0], sn[1],
                    taun[0], taun[1], kapn[0], kapn[1],
                    pxn[0], pxn[1], pzn[0], pzn[1], psn[0], psn[1],
                    ptaun[0], ptaun[1], pkapn[0], pkapn[1],
                    prev_rp_n, prev_rd_n, prev_ga_n, prev_gr_n,
                    mu_n, alpha_n, sigma_n, iters1, status, hand_n,
                    c[30])

        # ---- phase 2: double-float endgame + termination machine ----
        def loop_cond2(c):
            # any-lane-unsolved as an int32 min-reduction: UNSOLVED is
            # 0, the smallest status code (Mosaic's reduce_or proxy
            # lowering materializes an f64 temp under global x64;
            # reduce_min on int32 lowers directly)
            return jnp.min(c[28]) == UNSOLVED

        def loop_body2(c):
            ar = _ArDF
            (x, z, s, tau, kappa, px, pz, ps, ptau, pkap,
             prev_rp, prev_rd, prev_ga, prev_gr,
             mu_f, alpha_f, sigma_f, iters, status, hand) = unpack(c, ar)
            active = status == UNSOLVED

            # ---- top of loop: residuals, info, termination ----
            tinv = df64.recip(tau)
            res = ops64.residuals(x, z, s, tau, kappa, tinv)
            mu = (res["sz"] + tau * kappa) * (1.0 / (degree + 1))
            info = ops64.compute_info(res, x, z, s, tau, kappa, tinv)

            status1 = check_convergence(info, res["bz"].hi,
                                        res["qx"].hi, full_tols)
            status1 = jnp.where(active, status1, status)

            # poor-progress checks (reference: src/info.jl:79-104)
            going_back = jnp.logical_or(info["res_dual"] > prev_rd,
                                        info["res_primal"] > prev_rp)
            sr = np.float32(st.stall_detection_ratio)
            stagnating = jnp.logical_or(
                info["res_dual"] > sr * prev_rd,
                info["res_primal"] > sr * prev_rp)
            # in-kernel refinement drives residuals to the df floor many
            # iterations before the duality gap closes, so a
            # residual-only stall check fires while centering steps are
            # still making progress (measured: 37/4096 lanes end ALMOST
            # with healthy alpha and a shrinking ~4e-8 gap).  Only call
            # it a stall if the gap has ALSO stopped improving
            # (docs/DEVIATIONS.md).
            stagnating = jnp.logical_and(
                stagnating,
                jnp.logical_and(info["gap_abs"] > sr * prev_ga,
                                info["gap_rel"] > sr * prev_gr))
            after_first = jnp.logical_and(
                jnp.logical_and(active, status1 == UNSOLVED), iters > 1)
            eps_T = np.float32(np.finfo(np.float64).eps)
            poor_hi = jnp.logical_and(
                info["ktratio"] < 100.0 * eps_T,
                jnp.logical_or(prev_ga < np.float32(st.tol_gap_abs),
                               prev_gr < np.float32(st.tol_gap_rel)))
            tf100 = np.float32(100.0 * st.tol_feas)
            diverging = jnp.logical_and(
                info["ktratio"] < 1.0,
                jnp.logical_or(
                    jnp.logical_and(info["res_dual"] > tf100,
                                    info["res_dual"] > 100.0 * prev_rd),
                    jnp.logical_and(
                        info["res_primal"] > tf100,
                        info["res_primal"] > 100.0 * prev_rp)))
            insuff = jnp.logical_or(
                jnp.logical_and(jnp.logical_and(after_first, stagnating),
                                poor_hi),
                jnp.logical_and(jnp.logical_and(after_first, going_back),
                                diverging))
            status2 = jnp.where(insuff, INSUFFICIENT_PROGRESS, status1)
            status2 = jnp.where(
                jnp.logical_and(
                    jnp.logical_and(active, status2 == UNSOLVED),
                    iters >= st.max_iter),
                MAX_ITERATIONS, status2).astype(jnp.int32)

            # rollback for insufficient progress (src/solver.jl:453-472)
            # with the asymmetric strategy downgrade: a PrimalDual lane
            # rolls back, switches to Dual, and CONTINUES; symmetric
            # problems (and Dual lanes) terminate.
            strat = c[30]
            is_insuff = status2 == INSUFFICIENT_PROGRESS
            restore = jnp.logical_and(active, is_insuff)
            if has_nonsym:
                can_dg = strat == PRIMAL_DUAL
                downgraded_ip = jnp.logical_and(restore, can_dg)
                status2 = jnp.where(downgraded_ip, UNSOLVED,
                                    status2).astype(jnp.int32)
                strat = jnp.where(downgraded_ip, DUAL,
                                  strat).astype(jnp.int32)
            xr = df64.where(restore, px, x)
            zr = df64.where(restore, pz, z)
            sr_ = df64.where(restore, ps, s)
            taur = df64.where(restore, ptau, tau)
            kapr = df64.where(restore, pkap, kappa)
            if has_nonsym:
                # a downgraded lane skips this iteration's step (its
                # direction was computed under the old scaling; the
                # restored carry re-enters the loop on Dual — exactly
                # the reference's checkpoint semantics)
                do = jnp.logical_and(
                    jnp.logical_and(active, status2 == UNSOLVED),
                    jnp.logical_not(downgraded_ip))
            else:
                do = jnp.logical_and(active, status2 == UNSOLVED)
            iters1 = iters + jnp.where(do, 1, 0).astype(jnp.int32)

            # ---- phase B: scaling, KKT, predictor-corrector ----
            (dx, dz, dsv, dtau, dkappa, alpha, sigma,
             kkt_fail) = pc_step(ops64, x, z, s, tau, kappa, tinv,
                                 res, mu, iters1, refine_df,
                                 strat if has_nonsym else None)

            # numerical-error checkpoint (reference: src/solver.jl:
            # 475-489): PrimalDual lanes downgrade instead of erroring
            if has_nonsym:
                can_dg2 = strat == PRIMAL_DUAL
                dg_fail = jnp.logical_and(kkt_fail, can_dg2)
                fail_status = jnp.where(
                    jnp.logical_and(kkt_fail, jnp.logical_not(can_dg2)),
                    NUMERICAL_ERROR, UNSOLVED).astype(jnp.int32)
            else:
                dg_fail = jnp.zeros((S8, L128), bool)
                fail_status = jnp.where(kkt_fail, NUMERICAL_ERROR,
                                        UNSOLVED).astype(jnp.int32)

            # small-step checkpoint (reference: src/solver.jl:492-505):
            # PrimalDual lanes with alpha below min_switch downgrade
            small_term = alpha <= np.float32(
                max(0.0, st.min_terminate_step_length))
            if has_nonsym:
                small_switch = jnp.logical_and(
                    jnp.logical_and(can_dg2,
                                    jnp.logical_not(kkt_fail)),
                    alpha < np.float32(st.min_switch_step_length))
                small_term = jnp.logical_and(
                    small_term, jnp.logical_not(small_switch))
                dg_fail = jnp.logical_or(dg_fail, small_switch)
            fail_status = jnp.where(
                jnp.logical_and(
                    fail_status == UNSOLVED,
                    jnp.logical_and(jnp.logical_not(kkt_fail),
                                    small_term)),
                INSUFFICIENT_PROGRESS, fail_status).astype(jnp.int32)
            take = jnp.logical_and(jnp.logical_not(kkt_fail),
                                   jnp.logical_not(small_term))
            if has_nonsym:
                take = jnp.logical_and(take,
                                       jnp.logical_not(dg_fail))
                strat = jnp.where(jnp.logical_and(do, dg_fail), DUAL,
                                  strat).astype(jnp.int32)
                fail_status = jnp.where(dg_fail, UNSOLVED,
                                        fail_status).astype(jnp.int32)
            alpha_eff = jnp.where(take, alpha, 0.0)
            dotake = jnp.logical_and(do, take)
            a = DF(alpha_eff)

            xn = df64.where(dotake, x + dx * a, xr)
            zn = df64.where(dotake, z + dz * a, zr)
            sn = df64.where(dotake, s + dsv * a, sr_)
            taun = df64.where(dotake, tau + dtau * a, taur)
            kapn = df64.where(dotake, kappa + dkappa * a, kapr)
            pxn = df64.where(dotake, x, px)
            pzn = df64.where(dotake, z, pz)
            psn = df64.where(dotake, s, ps)
            ptaun = df64.where(dotake, tau, ptau)
            pkapn = df64.where(dotake, kappa, pkap)

            prev_rp_n = jnp.where(dotake, info["res_primal"], prev_rp)
            prev_rd_n = jnp.where(dotake, info["res_dual"], prev_rd)
            prev_ga_n = jnp.where(dotake, info["gap_abs"], prev_ga)
            prev_gr_n = jnp.where(dotake, info["gap_rel"], prev_gr)
            mu_n = jnp.where(active, mu.hi, mu_f)
            alpha_n = jnp.where(do, alpha_eff, alpha_f)
            sigma_n = jnp.where(do, sigma, sigma_f)
            status_n = jnp.where(do, fail_status, status2).astype(
                jnp.int32)

            return (xn.hi, xn.lo, zn.hi, zn.lo, sn.hi, sn.lo,
                    taun.hi, taun.lo, kapn.hi, kapn.lo,
                    pxn.hi, pxn.lo, pzn.hi, pzn.lo, psn.hi, psn.lo,
                    ptaun.hi, ptaun.lo, pkapn.hi, pkapn.lo,
                    prev_rp_n, prev_rd_n, prev_ga_n, prev_gr_n,
                    mu_n, alpha_n, sigma_n, iters1, status_n, hand,
                    strat)

        if _DEBUG_STAGE == 3:
            final = loop_body2(carry0)   # one unrolled body, no while
        else:
            carry1 = carry0
            if two_phase:
                carry1 = lax.while_loop(loop_cond1, loop_body1, carry0)
            final = lax.while_loop(loop_cond2, loop_body2, carry1)
        (x, z, s, tau, kappa, _px, _pz, _ps, _pt, _pk,
         _prp, _prd, _pga, _pgr, mu_f, alpha_f, sigma_f, iters,
         status, _hand) = unpack(final, _ArDF)

        # ---- finalize (mirrors ipm/loop.py finalize) ----
        tinv = df64.recip(tau)
        res = ops64.residuals(x, z, s, tau, kappa, tinv)
        info = ops64.compute_info(res, x, z, s, tau, kappa, tinv)
        errored = functools.reduce(jnp.logical_or, [
            status == NUMERICAL_ERROR, status == INSUFFICIENT_PROGRESS,
            status == MAX_ITERATIONS])
        almost = check_convergence(info, res["bz"].hi, res["qx"].hi,
                                   reduced_tols)
        raw_status = status   # pre-almost terminal status (diagnostics)
        status = jnp.where(
            jnp.logical_and(errored, almost != UNSOLVED), almost,
            status).astype(jnp.int32)
        is_inf = functools.reduce(jnp.logical_or, [
            status == PINF, status == DINF,
            status == ALMOST_PINF, status == ALMOST_DINF])
        scaleinv = df64.recip(df64.where(is_inf, kappa, tau))
        x_out = x * d_df * scaleinv
        z_out = z * e_df * (scaleinv * cinv)
        s_out = s * einv * scaleinv
        nanf = jnp.full((S8, L128), np.nan, jnp.float32)
        obj_val = df64.where(is_inf, DF(nanf), info["cost_primal"])
        obj_val_dual = df64.where(is_inf, DF(nanf), info["cost_dual"])

        scalars = [obj_val, obj_val_dual, DF(info["res_primal"]),
                   DF(info["res_dual"]), DF(info["gap_abs"]),
                   DF(info["gap_rel"]), DF(mu_f), DF(alpha_f),
                   DF(sigma_f), DF(info["ktratio"]),
                   tau * scaleinv, kappa * scaleinv,
                   DF(raw_status.astype(jnp.float32))]
        out = _vcat([x_out, z_out, s_out, _vstack(scalars)])
        return out.hi, out.lo, jnp.stack([status, iters], axis=0)

    def kernel(Phi, Plo, qhi, qlo, Ahi, Alo, bhi, blo, ohi, olo, oint):
        hi, lo, ints = compute(Phi[...], Plo[...], qhi[...], qlo[...],
                               Ahi[...], Alo[...], bhi[...], blo[...])
        ohi[...] = hi
        olo[...] = lo
        oint[...] = ints

    # ------------------------------------------------------------------
    # host wrapper
    # ------------------------------------------------------------------

    def _pallas_fn(G):
        bspec = lambda d: pl.BlockSpec((d, S8, L128),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[bspec(n * n), bspec(n * n), bspec(n), bspec(n),
                      bspec(n * m), bspec(n * m), bspec(m), bspec(m)],
            out_specs=[bspec(OUTD), bspec(OUTD), bspec(2)],
            out_shape=[
                jax.ShapeDtypeStruct((OUTD, G * S8, L128), jnp.float32),
                jax.ShapeDtypeStruct((OUTD, G * S8, L128), jnp.float32),
                jax.ShapeDtypeStruct((2, G * S8, L128), jnp.int32),
            ],
            # the triple-float residual path (round 5) raises the
            # kernel's scoped-VMEM stack high-water past Mosaic's 16 MB
            # default on some shapes; v5e has 128 MB of VMEM per core —
            # allow the kernel the 32 MB its eligibility budget assumes
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
        )

    _TRIU = n * (n + 1) // 2
    _DIMS = (_TRIU, n, n * m, m)   # transfer widths of P,q,A,b flats
    # triu(col-major) -> full(col-major) gather map: P is symmetric, so
    # only the upper triangle crosses the host link (28% of the input
    # bytes for this n); tri(i,j) = j(j+1)/2 + i for i <= j
    _P_GATHER = np.array(
        [(j * (j + 1)) // 2 + i if i <= j else (i * (i + 1)) // 2 + j
         for j in range(n) for i in range(n)], dtype=np.int32)

    def _solve_padded_py(packed, sP, sq, sA, sb):
        """One packed (Bp, sum-of-varying-widths) f64 array of the
        per-lane-VARYING components' column-major flats, plus four
        shared slots: (1, d) when that component is batch-constant
        (transferred over the host link once and broadcast on device),
        (0, d) when it varies (read from `packed`).  Bp is a multiple
        of 1024.  One host->device transfer instead of four — the TPU
        tunnel has a ~10-40 ms per-transfer latency floor
        (docs/PERF.md)."""
        Bp = packed.shape[0]
        G = Bp // BLOCK

        off = 0

        def take(shared, d):
            nonlocal off
            if shared.shape[0] == 0:
                v = packed[:, off:off + d]
                off += d
                return v
            return jnp.broadcast_to(shared, (Bp, d))

        flats = [take(s, d) for s, d in zip((sP, sq, sA, sb), _DIMS)]
        flats[0] = flats[0][:, _P_GATHER]   # triu -> full column-major

        def to_blocks(flat, d):
            hi, lo = split_f64(flat.T)
            return (hi.reshape(d, G * S8, L128),
                    lo.reshape(d, G * S8, L128))

        Phi, Plo = to_blocks(flats[0], n * n)
        qhi, qlo = to_blocks(flats[1], n)
        Ahi, Alo = to_blocks(flats[2], n * m)
        bhi, blo = to_blocks(flats[3], m)
        args = (Phi, Plo, qhi, qlo, Ahi, Alo, bhi, blo)
        if use_pallas:
            # trace the pallas_call with x64 DISABLED: under x64 bare
            # python literals trace as weak f64 and BlockSpec index maps
            # produce i64, neither of which Mosaic can legalize (same
            # workaround as linalg/pallas_ldl.py:94-98).  The df64 EFT
            # barriers are off in-kernel: Mosaic neither needs them (no
            # HLO simplifier) nor can lower optimization_barrier.
            with jax.enable_x64(False), df64.eft_barrier(False):
                ohi, olo, oint = _pallas_fn(G)(*args)
        else:
            # plain-XLA execution of the same block function (CPU path:
            # Mosaic only targets TPU; semantics are identical)
            outs = [compute(*[a[:, g * S8:(g + 1) * S8, :]
                              for a in args])
                    for g in range(G)]
            ohi = jnp.concatenate([o[0] for o in outs], axis=1)
            olo = jnp.concatenate([o[1] for o in outs], axis=1)
            oint = jnp.concatenate([o[2] for o in outs], axis=1)
        # return TWO packed device arrays unpacked host-side after one
        # device_get each: "eager" carries what every caller reads
        # (x, objective, status, iterations — ~64 B/lane), "rest" the
        # rarely-read fields (z, s, diagnostic scalars — ~5x the
        # bytes), fetched lazily on first access.  Per-field device
        # dicts cost ~18 separate host<->device round trips at fetch
        # time (measured 82 ms over the TPU tunnel; the tunnel has a
        # 10-40 ms per-transfer latency floor and no transfer/compute
        # overlap — docs/PERF.md).
        # outputs stay in their NATURAL (row-major, lane-minor) device
        # layout — a device-side transpose gives device_get a
        # non-default layout whose fetch crawls over the tunnel
        # (measured 140 ms vs ~25 ms for 1.2 MB); the host transposes
        # for free after the fetch
        valsT = join_f64(ohi, olo).reshape(OUTD, Bp)    # (OUTD, Bp)
        intsT = oint.reshape(2, Bp)
        k = n + 2 * m
        eagerT = jnp.concatenate(
            [valsT[:n], valsT[k:k + 1], intsT.astype(jnp.float64)],
            axis=0)                                     # (n + 3, Bp)
        restT = jnp.concatenate([valsT[n:k], valsT[k + 1:]], axis=0)
        return eagerT, restT

    if use_pallas:
        _solve_padded = jax.jit(_solve_padded_py)
    else:
        # XLA:CPU's fusion loop emitter contracts/reassociates floats
        # inside fused subgraphs, which silently destroys the df64
        # error-free transforms (measured: refined solves degrade from
        # 3e-15 to 1.5e-9; optimization_barrier does not survive the CPU
        # pipeline).  AOT-compile with fusion disabled — scoped to this
        # one computation, not the process.
        _aot_cache = {}

        def _solve_padded(*args):
            key = tuple(a.shape for a in args)
            fn = _aot_cache.get(key)
            if fn is None:
                fn = (jax.jit(_solve_padded_py)
                      .lower(*args)
                      .compile({"xla_disable_hlo_passes": "fusion"}))
                _aot_cache[key] = fn
            return fn(*args)

    _REST_NAMES = ["obj_val_dual", "r_prim", "r_dual", "gap_abs",
                   "gap_rel", "mu", "step_length", "sigma", "ktratio",
                   "tau", "kappa", "raw_status"]

    def unpack_eager(e):
        """Host-side unpack of the eager output block (x, obj, status,
        iterations); the device array is (n+3, Bp) lane-minor."""
        e = np.asarray(e).T
        return {
            "x": e[:, :n],
            "obj_val": e[:, n],
            "status": e[:, n + 1].astype(np.int64),
            "iterations": e[:, n + 2].astype(np.int64),
        }

    def unpack_rest(r):
        """Host-side unpack of the lazily-fetched block (z, s,
        diagnostic scalars); the device array is lane-minor."""
        r = np.asarray(r).T
        out = {"z": r[:, :m], "s": r[:, m:2 * m]}
        for i, nm in enumerate(_REST_NAMES):
            out[nm] = r[:, 2 * m + i]
        return out

    def _collapse(arr):
        """(B, d) -> (1, d) when every batch entry is identical, so
        batch-constant data crosses the host link once (the device side
        broadcasts).  The cheap arr[1] probe rejects varying batches
        before the full comparison."""
        if (arr.shape[0] > 1 and np.array_equal(arr[1], arr[0])
                and bool((arr == arr[0]).all())):
            return arr[:1]
        return arr

    # lanes per dispatch.  Round-5 probes overturned the round-3 "no
    # transfer/compute overlap" finding: a concurrent H2D hides ~70% of
    # a running kernel's time, so SMALL chunks that pipeline chunk
    # k+1's transfer under chunk k's kernel win decisively — measured
    # at B=65536 on the bench shape: 8-block chunks 140.3k solves/s vs
    # 64-block 75.5k (the wall now matches the device-resident kernel
    # rate; the pipeline is kernel-bound).  The byte budget still caps
    # dispatch staging for large shapes; CLARABEL_MEGA_CHUNK_BLOCKS
    # overrides for measurement.
    CHUNK_MAX_BLOCKS = 8
    CHUNK_BYTE_BUDGET = 1 << 30  # ~1 GB staged per dispatch
    # inputs (split f32 pair = 8 B/value) + in-kernel state + packed
    # outputs retained across chunks, conservatively 4x the input bytes
    CHUNK_WORK_FACTOR = 4

    def _chunk_lanes(packed_width, total_lanes=None):
        ov = int(_os.environ.get("CLARABEL_MEGA_CHUNK_BLOCKS", "0"))
        if ov > 0:
            # measurement override (CLARABEL_MEGA_CHUNK_BLOCKS)
            return min(ov, 64) * BLOCK
        lane_bytes = max(packed_width, 1) * 8 * CHUNK_WORK_FACTOR
        blocks = max(1, CHUNK_BYTE_BUDGET // (lane_bytes * BLOCK))
        blocks = 1 << min(int(blocks).bit_length() - 1,
                          CHUNK_MAX_BLOCKS.bit_length() - 1)
        if total_lanes is not None:
            # batch-aware pipelining (measured sweep, bench shape):
            # the optimal chunk grows with B — 2 blocks up to ~16k
            # lanes (B=4096: 65.4k solves/s at 2 blocks vs 62.2k at
            # one 4-block dispatch; B=16384: 130.7k vs 98.7k), 8
            # blocks from ~65k lanes up (B=131072: 157.0k at 8 vs
            # 131.1k at 2 — tiny chunks pay per-dispatch overhead
            # once there are dozens of them)
            want = max(2, min(blocks, total_lanes // (8 * BLOCK)))
            want = 1 << (want.bit_length() - 1)   # round down to 2^k
            blocks = min(blocks, want)
        return blocks * BLOCK

    def prepare(P, q, A, b):
        """Host-side numpy prep shared by solve() and benchmarks:
        pad to a BLOCK multiple, build column-major flats, collapse
        batch-constant components, pack the varying ones into ONE
        array.  Returns (B, Bp, packed, shared4).

        P may be full-symmetric OR upper-triangular: the triu(i<=j)
        extraction reads identical values under either convention, so
        no symmetrization pass is needed (host prep was ~1 s of the
        B=65536 wall before this — docs/PERF.md round 4).
        Batch-constant components are detected on the RAW arrays
        before any flatten/transpose, so a constant A (the common
        batched regime) never pays its (B, n*m) copy."""
        P = np.asarray(P, np.float64)
        q = np.asarray(q, np.float64)
        A = np.asarray(A, np.float64)
        b = np.asarray(b, np.float64)
        B = q.shape[0]
        Bp = -(-B // BLOCK) * BLOCK
        # tri(i,j) = j(j+1)/2 + i packing (column-major triu) to match
        # the device-side _P_GATHER map
        tri_i = np.concatenate([np.arange(j + 1) for j in range(n)])
        tri_j = np.concatenate([np.full(j + 1, j) for j in range(n)])

        def is_const(arr):
            # cheap row probe rejects varying batches before the scan
            return (arr.shape[0] > 1 and np.array_equal(arr[1], arr[0])
                    and bool((arr == arr[0]).all()))

        exts = [
            (P, lambda x: np.ascontiguousarray(x[:, tri_i, tri_j])),
            (q, lambda x: x.reshape(len(x), n)),
            (A, lambda x: np.ascontiguousarray(
                x.transpose(0, 2, 1)).reshape(len(x), n * m)),
            (b, lambda x: x.reshape(len(x), m)),
        ]
        shared, varying = [], []
        for (raw, ext), d in zip(exts, _DIMS):
            if is_const(raw):
                shared.append(ext(raw[:1]))
            else:
                f = ext(raw)
                if Bp != B:
                    f = np.concatenate(
                        [f, np.repeat(f[:1], Bp - B, 0)], 0)
                shared.append(np.zeros((0, d)))
                varying.append(f)
        packed = (np.concatenate(varying, axis=1) if varying
                  else np.zeros((Bp, 0)))
        return B, Bp, packed, shared

    def solve(P, q, A, b):
        B, Bp, packed, shared = prepare(P, q, A, b)
        CHUNK = _chunk_lanes(packed.shape[1], total_lanes=Bp)
        if Bp <= CHUNK:
            outs = [_solve_padded(packed, *shared)]
        else:
            outs = [_solve_padded(packed[c0:c0 + CHUNK], *shared)
                    for c0 in range(0, Bp, CHUNK)]
        eag = jax.device_get([o[0] for o in outs])
        eag = np.concatenate(eag, 1) if len(eag) > 1 else eag[0]
        rest_dev = [o[1] for o in outs]

        def fetch_rest():
            r = jax.device_get(rest_dev)
            r = np.concatenate(r, 1) if len(r) > 1 else r[0]
            return {k: v[:B] for k, v in unpack_rest(r).items()}

        eager = {k: v[:B] for k, v in unpack_eager(eag).items()}
        return LazyOutputs(eager, _REST_NAMES + ["z", "s"], fetch_rest)

    solve.unpack_eager = unpack_eager
    solve.unpack_rest = unpack_rest
    solve.prepare = prepare

    solve.compute = compute          # one-block pure function (tests)
    solve.solve_padded = _solve_padded
    return solve

