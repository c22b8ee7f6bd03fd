"""The batched IPM as ONE Pallas TPU kernel per 1024-lane block.

Why: the vmapped XLA IPM is latency-bound, not FLOP-bound (docs/PERF.md):
XLA emits hundreds of small fused VPU kernels per iteration, each with
fixed issue overhead, plus the f64 float-float emulation tax on every one.
This module fuses the ENTIRE solve — Ruiz equilibration, the initial-point
solve, the full Mehrotra predictor-corrector loop (residuals, NT scaling,
condensed KKT factor + refined solves, step lengths, termination state
machine), and finalization — into a single `pallas_call`.  All f64-class
arithmetic is explicit double-float (f32-pair) math from linalg/df64.py,
since Mosaic has no f64 type.

Scope: batches of small problems with nonnegative + second-order cones
only (the BatchSolver regime; see `eligible`).  Semantics mirror
ipm/loop.py formula-for-formula (which in turn cites the reference
src/solver.jl, src/kktsystem.jl, src/cones/*.jl); deviations are the
precision split documented inline (step lengths / convergence norms in
f32, everything cancellation-sensitive in double-float).

Layout: lanes are instances.  Each per-lane scalar is an (8, 128) f32
array (= one VPU vreg); vectors/matrices carry stacked leading dims, e.g.
x is (n, 8, 128).  A grid step processes 1024 lanes; the in-kernel
`while_loop` exits as soon as every lane in the block has terminated, so
blocks of easy instances finish early (per-block early exit — the vmapped
XLA loop runs every instance to the slowest lane of the whole batch).
"""

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..cones.api import NonnegativeConeT, SecondOrderConeT
from ..cones.layout import ConeLayout
from ..statuscodes import SolverStatus
from ..linalg.df64 import DF, df, split_f64, join_f64
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

# refinement passes per linear solve (accept-masked, unrolled).  The
# condensed backend needs refinement against the true augmented KKT to
# undo the normal equations' squared conditioning (kkt/condensed.py); in
# the kernel each pass is pure VPU compute, so passes are cheap but they
# multiply code size — 3 matches the measured typical pass count
# (docs/PERF.md flop table).
REFINE_PASSES = 3

# debug bisect hook: 0 = full kernel; 1 = stop after equilibration;
# 2 = after the initial point; 3 = after the loop (skip finalize)
_DEBUG_STAGE = 0


def eligible(layout: ConeLayout, settings, n: int) -> bool:
    """The megakernel covers the BatchSolver regime: small dense problems
    over nonnegative/second-order cones, solved at f64-class precision."""
    if settings.dtype != "float64":
        return False
    if settings.verbose or settings.mixed_precision:
        return False
    m = layout.m
    if n < 1 or m < 1 or n > 32 or m > 96 or n * m > 2048:
        return False
    for c in layout.cones:
        if not isinstance(c, (NonnegativeConeT, SecondOrderConeT)):
            return False
        if isinstance(c, SecondOrderConeT) and c.dim < 2:
            return False
    return True


# ---------------------------------------------------------------------------
# stacked double-float helpers: leading structural dims, trailing (8, 128)
# ---------------------------------------------------------------------------

def _dcat(parts: List[DF]) -> DF:
    return DF(jnp.concatenate([p.hi for p in parts], axis=0),
              jnp.concatenate([p.lo for p in parts], axis=0))


def _dstack(parts: List[DF]) -> DF:
    return DF(jnp.stack([p.hi for p in parts], axis=0),
              jnp.stack([p.lo for p in parts], axis=0))


def _dsum0(v: DF) -> DF:
    """Tree-sum a stacked DF over axis 0 -> per-lane DF scalar."""
    while v.hi.shape[0] > 1:
        k = v.hi.shape[0]
        h = k // 2
        s = v[0:h] + v[h:2 * h]
        if k % 2:
            s = _dcat([s, v[2 * h:]])
        v = s
    return v[0]


def _ddot0(a: DF, b: DF) -> DF:
    return _dsum0(a * b)


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


def _norm2_f32(arr):
    """Overflow-safe ||.||_2 over axis 0 of an (k, 8, 128) f32 stack."""
    mx = _fmax0(jnp.abs(arr))
    mxs = jnp.where(mx > 0, mx, 1.0)
    r = arr / mxs[None]
    return mx * jnp.sqrt(_fsum0(r * r))


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

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

    # static cone segments (contiguous by ConeLayout construction)
    segs: List[Tuple[str, int, int]] = []
    for cone, (lo, hi) in zip(layout.cones, layout.ranges):
        kind = "nn" if isinstance(cone, NonnegativeConeT) else "soc"
        segs.append((kind, lo, hi))
    # ---------------- in-kernel subroutines ----------------

    def seg_slices(v: DF):
        return [(kind, v[lo:hi]) for kind, lo, hi in segs]

    def mv(cols: List[DF], x: DF) -> DF:
        """A @ x from a list of n column stacks (m, 8, 128)."""
        acc = cols[0] * x[0]
        for j in range(1, len(cols)):
            acc = acc + cols[j] * x[j]
        return acc

    def rmv(cols: List[DF], y: DF) -> DF:
        """A' @ y -> (n, 8, 128) stack."""
        return _dstack([_ddot0(c, y) for c in cols])

    def make_scaling(s: DF, z: DF):
        """NT scaling update for every cone (reference:
        coneops_nncone.jl:77-89, coneops_socone.jl:75-154; mirrored from
        cones/ops.py update_scaling)."""
        ok = jnp.ones((S8, L128), bool)
        state = []
        for kind, lo, hi in segs:
            sg, zg = s[lo:hi], z[lo:hi]
            if kind == "nn":
                prod = sg * zg
                ok = jnp.logical_and(ok, _fall0(prod.hi > 0))
                prod = df64.dmax(prod, 0.0)
                zsafe = df64.where(zg.hi != 0, zg, 1.0)
                ratio = df64.where(zg.hi != 0, sg / zsafe,
                                   DF.zeros(zg.hi.shape))
                w = df64.sqrt(df64.dmax(ratio, 0.0))
                lam = df64.sqrt(prod)
                state.append({"kind": "nn", "w": w, "w2": w * w,
                              "winv2": df64.recip(w * w), "lam": lam})
            else:
                d = hi - lo

                def soc_res_sqrt(X: DF):
                    x1n = df64.sqrt(_dsum0(X[1:] * X[1:]))
                    res = (X[0] - x1n) * (X[0] + x1n)
                    return df64.where(res.hi > 0,
                                      df64.sqrt(df64.dmax(res, 0.0)),
                                      DF.zeros(res.hi.shape)), res

                zscale, _ = soc_res_sqrt(zg)
                sscale, _ = soc_res_sqrt(sg)
                okg = jnp.logical_and(zscale.hi > 0, sscale.hi > 0)
                zs = df64.where(zscale.hi > 0, zscale, 1.0)
                ss = df64.where(sscale.hi > 0, sscale, 1.0)
                zsinv, ssinv = df64.recip(zs), df64.recip(ss)
                eta = df64.sqrt(ss * zsinv)

                w0 = sg[0] * ssinv + zg[0] * zsinv
                w1 = sg[1:] * ssinv - zg[1:] * zsinv
                w = _dcat([_dstack([w0]), w1])
                wscale, _ = soc_res_sqrt(w)
                okg = jnp.logical_and(okg, wscale.hi > 0)
                ws = df64.where(wscale.hi > 0, wscale, 1.0)
                w = w * df64.recip(ws)
                w1sq = _dsum0(w[1:] * w[1:])
                w0n = df64.sqrt(w1sq + 1.0)
                w = _dcat([_dstack([w0n]), w[1:]])

                # scaling point lambda (reference coneops_socone.jl:115-123)
                gamma = ws * 0.5
                den = df64.recip(sg[0] * ssinv + zg[0] * zsinv
                                 + gamma * 2.0)
                lam1 = ((gamma + zg[0] * zsinv) * ssinv * sg[1:]
                        + (gamma + sg[0] * ssinv) * zsinv * zg[1:]) * den
                lam = _dcat([_dstack([gamma]), lam1])
                lam = lam * df64.sqrt(ss * zs)

                eta2 = eta * eta
                wbar = _dcat([_dstack([w[0]]), -w[1:]])  # J w
                ok = jnp.logical_and(ok, okg)
                state.append({
                    "kind": "soc", "w": w, "lam": lam, "eta": eta,
                    "eta2": eta2, "etainv": df64.recip(eta),
                    "etainv2": df64.recip(eta2), "wbar": wbar, "d": d,
                })
        return state, ok

    def hs_diag_hi(state):
        """f32 Hs diagonal (for the static regularization scale)."""
        parts = []
        for stg in state:
            if stg is None:
                continue
            if stg["kind"] == "nn":
                parts.append(stg["w2"].hi)
            else:
                w, eta2 = stg["w"], stg["eta2"]
                w2 = 2.0 * w.hi * w.hi
                head = (w2[0:1] - 1.0) * eta2.hi
                tail = (w2[1:] + 1.0) * eta2.hi
                parts.append(jnp.concatenate([head, tail], axis=0))
        return jnp.concatenate(parts, axis=0)

    def hinv_apply(state, v: DF) -> DF:
        """Hs^{-1} v with closed-form per-cone inverses (mirrors
        cones/ops.py mul_Hs_inv; no zero cones here).  state None =
        identity scaling."""
        if state is None:
            return v
        out = []
        for stg, (kind, vg) in zip(state, seg_slices(v)):
            if kind == "nn":
                out.append(vg * stg["winv2"])
            else:
                wbar = stg["wbar"]
                ccoef = _dsum0(wbar * vg) * 2.0
                base = _dcat([_dstack([-vg[0]]), vg[1:]])  # -J v
                out.append((base + ccoef * wbar) * stg["etainv2"])
        return _dcat(out)

    def hs_apply(state, v: DF) -> DF:
        """Hs v (mirrors cones/ops.py mul_Hs)."""
        if state is None:
            return v
        out = []
        for stg, (kind, vg) in zip(state, seg_slices(v)):
            if kind == "nn":
                out.append(vg * stg["w2"])
            else:
                w = stg["w"]
                c = _dsum0(w * vg) * 2.0
                base = _dcat([_dstack([-vg[0]]), vg[1:]])
                out.append((base + c * w) * stg["eta2"])
        return _dcat(out)

    def chol_factor(Scols: List[DF]):
        """Unrolled dense Cholesky of the n x n condensed matrix; returns
        (L as nested lists of per-lane DF scalars, 1/L[j][j] list, ok)."""
        Lm = [[None] * n for _ in range(n)]
        Linvd = [None] * n
        ok = jnp.ones((S8, L128), bool)
        for j in range(n):
            acc = Scols[j][j]
            if j > 0:
                acc = acc - _dsum0(_dstack([Lm[j][k] * Lm[j][k]
                                            for k in range(j)]))
            ok = jnp.logical_and(ok, acc.hi > 0)
            Ljj = df64.sqrt(df64.dmax(acc, 0.0))
            Ljj = df64.where(Ljj.hi > 0, Ljj, 1.0)
            Lm[j][j] = Ljj
            Linvd[j] = df64.recip(Ljj)
            for i in range(j + 1, n):
                acc = Scols[j][i]
                if j > 0:
                    acc = acc - _dsum0(_dstack([Lm[i][k] * Lm[j][k]
                                                for k in range(j)]))
                Lm[i][j] = acc * Linvd[j]
        return Lm, Linvd, ok

    def chol_solve(Lm, Linvd, w: List[DF]) -> DF:
        """L L' x = w by unrolled substitution; w = list of n scalars."""
        y = [None] * n
        for j in range(n):
            acc = w[j]
            if j > 0:
                acc = acc - _dsum0(_dstack([Lm[j][k] * y[k]
                                            for k in range(j)]))
            y[j] = acc * Linvd[j]
        x = [None] * n
        for i in range(n - 1, -1, -1):
            acc = y[i]
            if i < n - 1:
                acc = acc - _dsum0(_dstack([Lm[k][i] * x[k]
                                            for k in range(i + 1, n)]))
            x[i] = acc * Linvd[i]
        return _dstack(x)

    def build_kkt(Pcols, Acols, state, eps):
        """Condensed normal-equations factor at the given scaling state
        (mirrors kkt/condensed.py assemble_and_factor_condensed) plus the
        true augmented-KKT operator for refinement."""
        HinvA = [hinv_apply(state, c) for c in Acols]
        Scols = []
        for j in range(n):
            col = rmv(Acols, HinvA[j])
            if p_nonzero:
                col = col + Pcols[j]
            Scols.append(col)
        # + eps I: static diagonal add without scatter (rebuild column;
        # empty slices are skipped — Mosaic rejects zero-size vectors)
        Scols2 = []
        for j in range(n):
            c = Scols[j]
            parts = []
            if j > 0:
                parts.append(c[0:j])
            parts.append(_dstack([c[j] + eps]))
            if j + 1 < n:
                parts.append(c[j + 1:])
            Scols2.append(_dcat(parts) if len(parts) > 1 else parts[0])
        Lm, Linvd, okc = chol_factor(Scols2)

        def apply_once(bx: DF, bz: DF):
            hb = hinv_apply(state, bz)
            w = [bx[j] + _ddot0(Acols[j], hb) for j in range(n)]
            xs = chol_solve(Lm, Linvd, w)
            zs = hinv_apply(state, mv(Acols, xs) - bz)
            return xs, zs

        def kkt_mv(xs: DF, zs: DF):
            top = rmv(Acols, zs)
            if p_nonzero:
                top = top + _dstack([_ddot0(Pcols[j], xs)
                                     for j in range(n)])
            bot = mv(Acols, xs) - hs_apply(state, zs)
            return top, bot

        return apply_once, kkt_mv, okc

    def refined_solve(apply_once, kkt_mv, rhs_list):
        """Accept-masked unrolled refinement against the true KKT
        operator (mirrors kkt/condensed.py solve_refined_condensed with
        per-lane masking; multi-RHS joint norms)."""
        abstol = np.float32(min(st.iterative_refinement_abstol, 1e-14))
        reltol = np.float32(min(st.iterative_refinement_reltol, 1e-15))
        stop_ratio = np.float32(st.iterative_refinement_stop_ratio)

        sols = [apply_once(bx, bz) for bx, bz in rhs_list]

        def pair_max(pairs):
            mx = None
            for a, b in pairs:
                v = jnp.maximum(_fmax0(jnp.abs(a.hi)),
                                _fmax0(jnp.abs(b.hi)))
                mx = v if mx is None else jnp.maximum(mx, v)
            return mx

        def residuals(cur):
            es = []
            for (bx, bz), (xs, zs) in zip(rhs_list, cur):
                tx, tz = kkt_mv(xs, zs)
                es.append((bx - tx, bz - tz))
            return es

        normb = pair_max(rhs_list)
        es = residuals(sols)
        norme = pair_max(es)
        ok = jnp.isfinite(norme)
        done = jnp.zeros_like(ok)
        for _ in range(REFINE_PASSES):
            active = jnp.logical_and(
                jnp.logical_and(jnp.logical_not(done), ok),
                norme > abstol + reltol * normb,
            )
            news = [(xs + dx, zs + dz)
                    for (xs, zs), (dx, dz) in zip(sols, [
                        apply_once(ex, ez) for ex, ez in es])]
            newe = residuals(news)
            nn_ = pair_max(newe)
            okn = jnp.isfinite(nn_)
            tiny = np.float32(np.finfo(np.float32).tiny)
            ratio = norme / jnp.where(nn_ != 0, nn_, tiny)
            stop = ratio < stop_ratio
            accept = jnp.logical_and(
                okn, jnp.logical_or(jnp.logical_not(stop), ratio > 1.0))
            accept = jnp.logical_and(accept, active)
            # bool-valued selects as logical algebra: jnp.where on i1
            # values lowers through an unsupported i8->i1 truncation in
            # Mosaic (where(c, a, b) == (c & a) | (~c & b))
            nact = jnp.logical_not(active)
            done = jnp.logical_or(
                jnp.logical_and(active,
                                jnp.logical_or(stop,
                                               jnp.logical_not(okn))),
                jnp.logical_and(nact, done))
            ok = jnp.logical_and(ok, jnp.logical_or(okn, nact))
            sols = [(df64.where(accept, nx, xs), df64.where(accept, nz, zs))
                    for (xs, zs), (nx, nz) in zip(sols, news)]
            es = [(df64.where(accept, nex, ex), df64.where(accept, nez, ez))
                  for (ex, ez), (nex, nez) in zip(es, newe)]
            norme = jnp.where(accept, nn_, norme)
        return sols, jnp.logical_and(ok, jnp.isfinite(norme))

    # -- f32 cone helpers (precision-uncritical paths) --

    def margins_f32(vhi):
        """(min margin, sum of positive margins) over all cones; f32."""
        mm, pm = jnp.full((S8, L128), _BIG), jnp.zeros((S8, L128),
                                                       jnp.float32)
        for kind, lo, hi in segs:
            vg = vhi[lo:hi]
            if kind == "nn":
                mm = jnp.minimum(mm, _fmin0(vg))
                pm = pm + _fsum0(jnp.maximum(vg, 0.0))
            else:
                a = vg[0] - _norm2_f32(vg[1:])
                mm = jnp.minimum(mm, a)
                pm = pm + jnp.maximum(a, 0.0)
        return mm, pm

    def shift_to_interior(v: DF) -> DF:
        """reference: src/variables.jl:180-208 (both shifts merged)."""
        mm, pm = margins_f32(v.hi)
        mm = jnp.where(jnp.isfinite(mm), mm, -1.0)
        pm = jnp.where(jnp.isfinite(pm), pm, 0.0)
        target = jnp.maximum(1.0, 0.1 * pm / max(degree, 1))
        amt1 = jnp.where(mm <= 0, -mm, 0.0)
        amt2 = jnp.where(mm <= 0, target,
                         jnp.where(mm < target, target - mm, 0.0))
        amt = amt1 + amt2
        # add amt on the cone "unit" positions (all nn rows, SOC heads),
        # segment-wise to avoid non-scalar trace-time constants (Pallas
        # kernels cannot capture them)
        parts = []
        for kind, vg in seg_slices(v):
            if kind == "nn":
                parts.append(vg + DF(amt))
            else:
                parts.append(_dcat([_dstack([vg[0] + DF(amt)]), vg[1:]]))
        return _dcat(parts)

    def soc_step_len_f32(Xd: DF, Yd: DF):
        """Min positive boundary root, batched per lane (reference:
        coneops_socone.jl:443-512).  The boundary quadratic's
        coefficients cancel catastrophically near convergence (the SOC
        is active, so z0^2 - ||z1||^2 ~ mu with z0 ~ 1): a, b, c, and
        the discriminant are formed in df; the root selection and
        ratios are f32 (relative precision only)."""
        x0, y0 = Xd.hi[0], Yd.hi[0]
        a0 = jnp.where(jnp.logical_and(x0 >= 0, y0 < 0),
                       -x0 / jnp.where(y0 < 0, y0, -1.0), _BIG)

        def soc_res_df(V: DF) -> DF:
            return V[0] * V[0] - _dsum0(V[1:] * V[1:])

        a_df = soc_res_df(Yd)
        b_df = (Xd[0] * Yd[0] - _dsum0(Xd[1:] * Yd[1:])) * 2.0
        c_df = df64.dmax(soc_res_df(Xd), 0.0)
        d_df2 = b_df * b_df - a_df * c_df * 4.0
        a, b, c, d_ = a_df.hi, b_df.hi, c_df.hi, d_df2.hi
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
                      jnp.where(c == 0, jnp.where(a >= 0, _BIG, 0.0),
                                root)),
        )
        return jnp.minimum(alpha_i, a0)

    def step_length_f32(dz, ds, z, s, amax):
        """reference: src/variables.jl:14-43 + per-cone step lengths."""
        alpha = amax
        for kind, lo, hi in segs:
            dzg, dsg = dz.hi[lo:hi], ds.hi[lo:hi]
            zg, sg = z.hi[lo:hi], s.hi[lo:hi]
            if kind == "nn":
                az = jnp.where(dzg < 0,
                               -zg / jnp.where(dzg < 0, dzg, -1.0), _BIG)
                as_ = jnp.where(dsg < 0,
                                -sg / jnp.where(dsg < 0, dsg, -1.0), _BIG)
                alpha = jnp.minimum(alpha,
                                    jnp.minimum(_fmin0(az), _fmin0(as_)))
            else:
                alpha = jnp.minimum(alpha,
                                    soc_step_len_f32(z[lo:hi], dz[lo:hi]))
                alpha = jnp.minimum(alpha,
                                    soc_step_len_f32(s[lo:hi], ds[lo:hi]))
        return alpha

    def affine_ds(state, s: DF) -> DF:
        """ds = lambda o lambda (reference: coneops_compositecone.jl:153)."""
        out = []
        for stg, (kind, sg) in zip(state, seg_slices(s)):
            lam = stg["lam"]
            if kind == "nn":
                out.append(lam * lam)
            else:
                x0 = _dsum0(lam * lam)
                x1 = lam[0] * lam[1:] * 2.0
                out.append(_dcat([_dstack([x0]), x1]))
        return _dcat(out)

    def combined_ds_shift(state, dz_mc: DF, ds: DF, sigma_mu: DF) -> DF:
        """W^{-1}ds o W dz - sigma*mu*e (reference:
        coneops_symmetric_common.jl:2-35)."""
        out = []
        for stg, (kind, lo, hi) in zip(state, segs):
            dzg, dsg = dz_mc[lo:hi], ds[lo:hi]
            if kind == "nn":
                out.append(dzg * dsg - sigma_mu)
            else:
                w, eta, etainv = stg["w"], stg["eta"], stg["etainv"]

                def mul_w(X, inv=False):
                    zeta = _dsum0(w[1:] * X[1:])
                    denom = df64.recip(w[0] + 1.0)
                    if not inv:
                        c = X[0] + zeta * denom
                        y0 = (w[0] * X[0] + zeta) * eta
                        y1 = (X[1:] + c * w[1:]) * eta
                    else:
                        c = -X[0] + zeta * denom
                        y0 = (w[0] * X[0] - zeta) * etainv
                        y1 = (X[1:] + c * w[1:]) * etainv
                    return _dcat([_dstack([y0]), y1])

                wdz = mul_w(dzg)
                wids = mul_w(dsg, inv=True)
                x0 = _dsum0(wids * wdz) - sigma_mu
                x1 = wids[0] * wdz[1:] + wdz[0] * wids[1:]
                out.append(_dcat([_dstack([x0]), x1]))
        return _dcat(out)

    def ds_from_dz_offset(state, dsv: DF, z: DF) -> DF:
        """out = W'(lambda \\ ds) stable form (reference:
        coneops_socone.jl:241-268, coneops_compositecone.jl:185-202)."""
        out = []
        for stg, (kind, lo, hi) in zip(state, segs):
            dsg, zg = dsv[lo:hi], z[lo:hi]
            if kind == "nn":
                out.append(dsg / zg)
            else:
                w, eta, lam = stg["w"], stg["eta"], stg["lam"]
                z1n = df64.sqrt(_dsum0(zg[1:] * zg[1:]))
                resz = (zg[0] - z1n) * (zg[0] + z1n)
                lam1ds1 = _dsum0(lam[1:] * dsg[1:])
                w1ds1 = _dsum0(w[1:] * dsg[1:])
                c = (lam[0] * dsg[0] - lam1ds1) * df64.recip(resz)
                o0 = zg[0] * c
                o1 = -zg[1:] * c
                o0 = o0 + eta * w1ds1
                o1 = o1 + (dsg[1:]
                           + (w1ds1 * df64.recip(w[0] + 1.0)) * w[1:]) * eta
                lam0inv = df64.recip(lam[0])
                out.append(_dcat([_dstack([o0 * lam0inv]),
                                  o1 * lam0inv]))
        return _dcat(out)

    # -- convergence checks (f32; mirrors ipm/loop.py check_convergence) --

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
                    jnp.clip(1.0 / jnp.where(scale_cost != 0, scale_cost,
                                             1.0),
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
                if kind == "nn":
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

        def _debug_out(xv: DF, zv: DF, sv: DF):
            zt = jnp.zeros((S8, L128), jnp.float32)
            sc = _dstack([DF(zt)] * 12)
            o = _dcat([xv, zv, sv, sc])
            ints = jnp.stack([jnp.zeros((S8, L128), jnp.int32),
                              jnp.zeros((S8, L128), jnp.int32)], axis=0)
            return o.hi, o.lo, ints

        if _DEBUG_STAGE == 1:
            return _debug_out(qe, be, be)
        if _DEBUG_STAGE == 11:
            # first columns of P and A through the data path
            return _debug_out(Pcols[0], Acols[0], Acols[1])

        def residuals(x, z, s, tau, kappa, tinv):
            """reference: src/residuals.jl:1-37 (ipm/loop.py:94-106)."""
            qx = _ddot0(qe, x)
            bz = _ddot0(be, z)
            sz = _ddot0(s, z)
            Px = (_dstack([_ddot0(Pcols[j], x) for j in range(n)])
                  if p_nonzero else DF.zeros((n, S8, L128)))
            xPx = _ddot0(x, Px)
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
            Costs/gap in df (cancellation); norms in f32."""
            xPx_half = res["xPx"] * tinv * tinv * 0.5
            cost_primal = (res["qx"] * tinv + xPx_half) * cinv
            cost_dual = (-res["bz"] * tinv - xPx_half) * cinv
            tinv_f = tinv.hi
            normx = _norm2_f32(d_f * x.hi)
            normz = _norm2_f32(e_f * z.hi) * cinv.hi
            norms = _norm2_f32(einv.hi * s.hi)
            res_primal_inf = (_norm2_f32(dinv.hi * res["rx_inf"].hi)
                              * cinv.hi) / jnp.maximum(1.0, normz)
            res_dual_inf = jnp.maximum(
                _norm2_f32(dinv.hi * res["Px"].hi)
                / jnp.maximum(1.0, normx),
                _norm2_f32(einv.hi * res["rz_inf"].hi)
                / jnp.maximum(1.0, normx + norms))
            normx = normx * tinv_f
            normz = normz * tinv_f
            norms = norms * tinv_f
            res_primal = (_norm2_f32(einv.hi * res["rz"].hi) * tinv_f
                          / jnp.maximum(1.0, normb + normx + norms))
            res_dual = (_norm2_f32(dinv.hi * res["rx"].hi) * tinv_f
                        * cinv.hi
                        / jnp.maximum(1.0, normq + normx + normz))
            gap_abs_df = df64.dabs(cost_primal - cost_dual)
            gap_abs = gap_abs_df.hi
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
            return DF(np.float32(st.static_regularization_constant)
                      + np.float32(st.static_regularization_proportional)
                      * maxdiag)

        # ---- initial point (reference: src/solver.jl:383-404) ----
        eps0 = eps_of(jnp.ones((m, S8, L128), jnp.float32))
        apply0, kktmv0, ok0 = build_kkt(Pcols, Acols, None, eps0)
        if _DEBUG_STAGE == 21:
            xs, zs = apply0(-qe, be)
            return _debug_out(xs, zs, zs)
        if _DEBUG_STAGE == 22:
            xs, zs = apply0(-qe, be)
            tx, tz = kktmv0(xs, zs)
            return _debug_out(tx, tz, tz)
        if _DEBUG_STAGE == 23:
            sols, okr = refined_solve(apply0, kktmv0, [(-qe, be)])
            xs, zs = sols[0]
            return _debug_out(xs, zs, df64.where(okr, zs, -zs))
        if _DEBUG_STAGE == 24:
            xs, zs = apply0(-qe, be)
            tx, tz = kktmv0(xs, zs)
            ex, ez = -qe - tx, be - tz
            dx, dz = apply0(ex, ez)
            return _debug_out(xs + dx, zs + dz, zs + dz)
        if p_nonzero:
            sols, _ok = refined_solve(apply0, kktmv0, [(-qe, be)])
            x0, z0 = sols[0]
            s0 = -z0
        else:
            zer_n = DF.zeros((n, S8, L128))
            zer_m = DF.zeros((m, S8, L128))
            sols, _ok = refined_solve(apply0, kktmv0,
                                      [(zer_n, be), (-qe, zer_m)])
            x0, ms = sols[0]
            s0 = -ms
            z0 = sols[1][1]
        s0 = shift_to_interior(s0)
        z0 = shift_to_interior(z0)
        one = DF(jnp.ones((S8, L128), jnp.float32))
        tau0 = one
        kappa0 = one

        if _DEBUG_STAGE == 2:
            return _debug_out(x0, z0, s0)

        # ---- main loop ----
        fzero = jnp.zeros((S8, L128), jnp.float32)
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
            jnp.zeros((S8, L128), jnp.int32),   # iters
            jnp.full((S8, L128), UNSOLVED, jnp.int32),  # status
        )

        def unpack(c):
            x = DF(c[0], c[1]); z = DF(c[2], c[3]); s = DF(c[4], c[5])
            tau = DF(c[6], c[7]); kappa = DF(c[8], c[9])
            px = DF(c[10], c[11]); pz = DF(c[12], c[13])
            ps = DF(c[14], c[15]); ptau = DF(c[16], c[17])
            pkap = DF(c[18], c[19])
            return (x, z, s, tau, kappa, px, pz, ps, ptau, pkap,
                    c[20], c[21], c[22], c[23], c[24], c[25], c[26],
                    c[27], c[28])

        def loop_cond(c):
            # any-lane-unsolved as an int32 min-reduction: UNSOLVED is 0,
            # the smallest status code (Mosaic's reduce_or proxy lowering
            # materializes an f64 temp under global x64; reduce_min on
            # int32 lowers directly)
            return jnp.min(c[28]) == UNSOLVED

        def loop_body(c):
            (x, z, s, tau, kappa, px, pz, ps, ptau, pkap,
             prev_rp, prev_rd, prev_ga, prev_gr,
             mu_f, alpha_f, sigma_f, iters, status) = unpack(c)
            active = status == UNSOLVED

            # ---- top of loop: residuals, info, termination ----
            tinv = df64.recip(tau)
            res = residuals(x, z, s, tau, kappa, tinv)
            mu = (res["sz"] + tau * kappa) * (1.0 / (degree + 1))
            info = compute_info(res, x, z, s, tau, kappa, tinv)

            status1 = check_convergence(info, res["bz"].hi, res["qx"].hi,
                                        full_tols)
            status1 = jnp.where(active, status1, status)

            # poor-progress checks (reference: src/info.jl:79-104)
            going_back = jnp.logical_or(info["res_dual"] > prev_rd,
                                        info["res_primal"] > prev_rp)
            sr = np.float32(st.stall_detection_ratio)
            stagnating = jnp.logical_or(info["res_dual"] > sr * prev_rd,
                                        info["res_primal"] > sr * prev_rp)
            # in-kernel refinement drives residuals to the df floor many
            # iterations before the duality gap closes, so a residual-only
            # stall check fires while centering steps are still making
            # progress (measured: 37/4096 lanes end ALMOST with healthy
            # alpha and a shrinking ~4e-8 gap).  Only call it a stall if
            # the gap has ALSO stopped improving.
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
                    jnp.logical_and(info["res_primal"] > tf100,
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

            # rollback for insufficient progress (src/solver.jl:453-472;
            # symmetric cones never downgrade, so insuff terminates)
            restore = jnp.logical_and(active,
                                      status2 == INSUFFICIENT_PROGRESS)
            xr = df64.where(restore, px, x)
            zr = df64.where(restore, pz, z)
            sr_ = df64.where(restore, ps, s)
            taur = df64.where(restore, ptau, tau)
            kapr = df64.where(restore, pkap, kappa)

            do = jnp.logical_and(active, status2 == UNSOLVED)
            iters1 = iters + jnp.where(do, 1, 0).astype(jnp.int32)

            # ---- phase B: scaling, KKT, predictor-corrector ----
            state, ok_scale = make_scaling(s, z)
            eps = eps_of(hs_diag_hi(state))
            apply1, kktmv1, ok_chol = build_kkt(Pcols, Acols, state, eps)
            ok_kkt = jnp.logical_and(ok_scale, ok_chol)

            aff_ds = affine_ds(state, s)
            # fused 2-RHS solve: constant [-q; b] + affine [rx; s - rz]
            sols, ok1 = refined_solve(
                apply1, kktmv1,
                [(-qe, be), (res["rx"], s - res["rz"])])
            (x2, z2), (x1a, z1a) = sols
            ok_kkt = jnp.logical_and(ok_kkt, ok1)

            # tau recovery pieces invariant across the two solves
            xi = x * tinv
            xi_m_x2 = xi - x2
            if p_nonzero:
                PX1 = lambda v: _dstack([_ddot0(Pcols[j], v)
                                         for j in range(n)])
                tau_den = (kappa * tinv - _ddot0(qe, x2)
                           - _ddot0(be, z2)
                           + _ddot0(xi_m_x2, PX1(xi_m_x2))
                           - _ddot0(x2, PX1(x2)))
            else:
                tau_den = (kappa * tinv - _ddot0(qe, x2)
                           - _ddot0(be, z2))

            def tau_recovery(x1, z1, ds_const, rhs_tau, rhs_kappa):
                """reference: src/kktsystem.jl:135-215."""
                tau_num = (rhs_tau - rhs_kappa * tinv
                           + _ddot0(qe, x1) + _ddot0(be, z1))
                if p_nonzero:
                    tau_num = tau_num + _ddot0(xi, PX1(x1)) * 2.0
                dtau = tau_num / tau_den
                dx = x1 + x2 * dtau
                dz = z1 + z2 * dtau
                dsv = -(hs_apply(state, dz) + ds_const)
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
            alpha_aff = step_length_f32(dza, dsa, z, s, amax)
            sigma = (1.0 - alpha_aff) ** 3
            m_corr = jnp.where(iters1 > 1, 1.0, alpha_aff)
            sigma_mu = DF(sigma) * mu

            # combined step rhs (reference: src/variables.jl:124-162)
            shift = combined_ds_shift(state, dza * DF(m_corr), dsa,
                                      sigma_mu)
            comb_s = aff_ds + shift
            one_m_sigma = DF(1.0 - sigma)
            comb_x = res["rx"] * one_m_sigma
            comb_z = res["rz"] * one_m_sigma
            comb_tau = res["rtau"] * one_m_sigma
            comb_kappa = (-sigma_mu + dtaua * dkappaa * DF(m_corr)
                          + tau * kappa)

            ds_const = ds_from_dz_offset(state, comb_s, z)
            solsc, ok3 = refined_solve(apply1, kktmv1,
                                       [(comb_x, ds_const - comb_z)])
            x1c, z1c = solsc[0]
            dx, dz, dsv, dtau, dkappa = tau_recovery(
                x1c, z1c, ds_const, comb_tau, comb_kappa)
            ok_kkt = jnp.logical_and(ok_kkt, ok3)

            kkt_fail = jnp.logical_not(ok_kkt)
            fail_status = jnp.where(kkt_fail, NUMERICAL_ERROR,
                                    UNSOLVED).astype(jnp.int32)

            # final step length (combined scaled by max_step_fraction)
            a_tau = jnp.where(dtau.hi < 0,
                              -tau.hi / jnp.where(dtau.hi < 0, dtau.hi,
                                                  -1.0), _BIG)
            a_kap = jnp.where(dkappa.hi < 0,
                              -kappa.hi / jnp.where(dkappa.hi < 0,
                                                    dkappa.hi, -1.0),
                              _BIG)
            amax = jnp.minimum(jnp.minimum(a_tau, a_kap), 1.0)
            alpha = step_length_f32(dz, dsv, z, s, amax)
            alpha = alpha * np.float32(st.max_step_fraction)

            # small-step checkpoint (reference: src/solver.jl:492-505;
            # no downgrade path for symmetric cones)
            small_term = alpha <= np.float32(
                max(0.0, st.min_terminate_step_length))
            fail_status = jnp.where(
                jnp.logical_and(
                    fail_status == UNSOLVED,
                    jnp.logical_and(jnp.logical_not(kkt_fail),
                                    small_term)),
                INSUFFICIENT_PROGRESS, fail_status).astype(jnp.int32)
            take = jnp.logical_and(jnp.logical_not(kkt_fail),
                                   jnp.logical_not(small_term))
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
                    mu_n, alpha_n, sigma_n, iters1, status_n)

        if _DEBUG_STAGE == 3:
            final = loop_body(carry0)   # one unrolled body, no while
        else:
            final = lax.while_loop(loop_cond, loop_body, carry0)
        (x, z, s, tau, kappa, _px, _pz, _ps, _pt, _pk,
         _prp, _prd, _pga, _pgr, mu_f, alpha_f, sigma_f, iters,
         status) = unpack(final)

        # ---- finalize (mirrors ipm/loop.py finalize) ----
        tinv = df64.recip(tau)
        res = residuals(x, z, s, tau, kappa, tinv)
        info = compute_info(res, x, z, s, tau, kappa, tinv)
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
        out = _dcat([x_out, z_out, s_out, _dstack(scalars)])
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
    OUTD = n + 2 * m + 13

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
            interpret=interpret,
        )

    def _solve_padded_py(P, q, A, b):
        """(Bp, ...) f64 arrays with Bp a multiple of 1024."""
        Bp = q.shape[0]
        G = Bp // BLOCK

        def to_blocks(arr, d):
            hi, lo = split_f64(arr.reshape(Bp, d).T)
            return (hi.reshape(d, G * S8, L128),
                    lo.reshape(d, G * S8, L128))

        # column-major flats: P[b, i, j] -> [j*n + i]
        Pt = jnp.transpose(P, (0, 2, 1)).reshape(Bp, n * n)
        At = jnp.transpose(A, (0, 2, 1)).reshape(Bp, n * m)
        Phi, Plo = to_blocks(Pt, n * n)
        qhi, qlo = to_blocks(q, n)
        Ahi, Alo = to_blocks(At, n * m)
        bhi, blo = to_blocks(b, m)
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
            outs = [compute(*[a[:, g * S8:(g + 1) * S8, :] for a in args])
                    for g in range(G)]
            ohi = jnp.concatenate([o[0] for o in outs], axis=1)
            olo = jnp.concatenate([o[1] for o in outs], axis=1)
            oint = jnp.concatenate([o[2] for o in outs], axis=1)
        vals = join_f64(ohi, olo).reshape(OUTD, Bp).T   # (Bp, OUTD)
        ints = oint.reshape(2, Bp).T
        k = n + 2 * m
        names = ["obj_val", "obj_val_dual", "r_prim", "r_dual",
                 "gap_abs", "gap_rel", "mu", "step_length", "sigma",
                 "ktratio", "tau", "kappa", "raw_status"]
        out = {
            "x": vals[:, :n],
            "z": vals[:, n:n + m],
            "s": vals[:, n + m:k],
            "status": ints[:, 0],
            "iterations": ints[:, 1],
        }
        for i, nm in enumerate(names):
            out[nm] = vals[:, k + i]
        return out

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

        def _solve_padded(P, q, A, b):
            key = (P.shape, q.shape, A.shape, b.shape)
            fn = _aot_cache.get(key)
            if fn is None:
                fn = (jax.jit(_solve_padded_py)
                      .lower(P, q, A, b)
                      .compile({"xla_disable_hlo_passes": "fusion"}))
                _aot_cache[key] = fn
            return fn(P, q, A, b)

    def solve(P, q, A, b):
        P = np.asarray(P, np.float64)
        q = np.asarray(q, np.float64)
        A = np.asarray(A, np.float64)
        b = np.asarray(b, np.float64)
        B = q.shape[0]
        Bp = -(-B // BLOCK) * BLOCK
        if Bp != B:
            pad = Bp - B
            P = np.concatenate([P, np.repeat(P[:1], pad, 0)], 0)
            q = np.concatenate([q, np.repeat(q[:1], pad, 0)], 0)
            A = np.concatenate([A, np.repeat(A[:1], pad, 0)], 0)
            b = np.concatenate([b, np.repeat(b[:1], pad, 0)], 0)
        out = _solve_padded(P, q, A, b)
        if Bp != B:
            out = {k: v[:B] for k, v in out.items()}
        return out

    solve.compute = compute          # one-block pure function (tests)
    solve.solve_padded = _solve_padded
    return solve
