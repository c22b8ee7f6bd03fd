"""Double-float (float32-pair) arithmetic usable inside Pallas TPU kernels.

TPU Pallas/Mosaic has no f64 type at all; XLA's own f64-on-TPU support is
a float-float ("double-float") emulation at the HLO level, which is exactly
why the batched IPM is latency-bound (docs/PERF.md): every tiny f64 op is
its own fused-kernel launch.  This module provides the same ~2^-48
arithmetic as explicit f32-pair operations so that the *entire* IPM
iteration can run inside one Pallas kernel (ipm/megakernel.py) with no
per-op dispatch cost.

Representation: a `DF` holds (hi, lo) f32 arrays with value hi + lo,
|lo| <= ulp(hi)/2.  Algorithms are the classic error-free transformations
(Knuth two-sum, Dekker split/two-prod — no FMA on the VPU) as used in the
double-double literature (Thall, "Extended-Precision Floating-Point
Numbers for GPU Computation"; Hida-Li-Bailey QD).

All operations are elementwise over arbitrary (broadcastable) jnp array
shapes, so they work identically under jit, vmap, and inside Pallas kernel
bodies (and under `interpret=True` on CPU for testing).

Reference provenance: this backs the TPU redesign of the reference's f64
dense linear algebra (reference: src/kktsolvers/direct-ldl/*.jl uses native
f64; on TPU the equivalent precision must be built from f32 pairs).
"""

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for f32 (24-bit mantissa -> 12+12 split)

# The error-free transformations below are EXACT floating-point identities
# that XLA's HLO algebraic simplifier destroys in large graphs (it rewrites
# (a+b)-a -> b and t-(t-a) -> a, which are true in real arithmetic but
# erase exactly the rounding error we are capturing — measured: a jitted
# refine chain degrades from 3e-15 to 1.5e-9).  `optimization_barrier` on
# the pivot value blocks those rewrites.  Inside Pallas TPU kernels the
# body is compiled by Mosaic (no HLO simplifier, and MLIR arith does not
# reassociate floats without fast-math), and Mosaic has no lowering for
# the barrier — so kernels disable it via `eft_barrier(False)`.
_EFT_BARRIER = True


class eft_barrier:
    """Context manager toggling the anti-simplifier barriers."""

    def __init__(self, enable: bool):
        self.enable = enable

    def __enter__(self):
        global _EFT_BARRIER
        self.prev = _EFT_BARRIER
        _EFT_BARRIER = self.enable

    def __exit__(self, *exc):
        global _EFT_BARRIER
        _EFT_BARRIER = self.prev


def _guard(x):
    if _EFT_BARRIER:
        from jax import lax

        return lax.optimization_barrier(x)
    return x


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def _two_sum(a, b):
    """Error-free a+b (Knuth): s + e == a + b exactly.

    Both `s` and `v` are guarded: guarding only `s` still lets the
    simplifier fold s-(s-a) -> a across the two subtractions, and
    guarding only `v` lets it fold (a+b)-a -> b inside the barrier's
    operand before the barrier applies.
    """
    s = _guard(a + b)
    v = _guard(s - a)
    e = (a - (s - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    """Error-free a+b assuming |a| >= |b|."""
    s = _guard(a + b)
    e = b - (s - a)
    return s, e


def _split(a):
    t = _guard(_SPLITTER * a)
    d = _guard(t - a)
    hi = t - d
    return hi, a - hi


def _two_prod(a, b):
    """Error-free a*b (Dekker, no FMA): p + e == a*b exactly.

    `p` is guarded: XLA rewrites patterns like mul(b, div(a, b)) into a
    reassociated division, changing p's rounding while the Dekker error
    terms still describe the ORIGINAL product — which turns the exact
    p + e into an inconsistent pair (fatal inside div's cancellation).
    """
    p = _guard(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


class DF:
    """A double-float value: elementwise hi + lo over jnp f32 arrays."""

    __slots__ = ("hi", "lo")
    # win elementwise-op dispatch against raw jnp arrays
    __array_priority__ = 1000

    def __init__(self, hi, lo=None):
        self.hi = _f32(hi)
        self.lo = jnp.zeros_like(self.hi) if lo is None else _f32(lo)

    # -- construction -------------------------------------------------
    @staticmethod
    def const(value: float):
        """Trace-time constant split exactly in python float64."""
        hi = np.float32(value)
        lo = np.float32(float(value) - float(hi))
        return DF(jnp.float32(hi), jnp.float32(lo))

    @staticmethod
    def zeros(shape):
        z = jnp.zeros(shape, jnp.float32)
        return DF(z, z)

    # -- structure ----------------------------------------------------
    @property
    def shape(self):
        return jnp.broadcast_shapes(self.hi.shape, self.lo.shape)

    def __getitem__(self, idx):
        return DF(self.hi[idx], self.lo[idx])

    def astuple(self):
        return self.hi, self.lo

    # -- arithmetic ---------------------------------------------------
    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __add__(self, other):
        o = _as_df(other)
        s, e = _two_sum(self.hi, o.hi)
        t, f = _two_sum(self.lo, o.lo)
        e = e + t
        s, e = _quick_two_sum(s, e)
        e = e + f
        hi, lo = _quick_two_sum(s, e)
        return DF(_guard(hi), _guard(lo))

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-_as_df(other))

    def __rsub__(self, other):
        return _as_df(other) + (-self)

    def __mul__(self, other):
        o = _as_df(other)
        p, e = _two_prod(self.hi, o.hi)
        e = e + (self.hi * o.lo + self.lo * o.hi)
        hi, lo = _quick_two_sum(p, e)
        return DF(_guard(hi), _guard(lo))

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = _as_df(other)
        # long division with two correction terms (full double-double);
        # quotients guarded against div-chain reassociation rewrites
        q1 = _guard(self.hi / o.hi)
        r = self - o * q1
        q2 = _guard(r.hi / o.hi)
        r = r - o * q2
        q3 = _guard(r.hi / o.hi)
        s, e = _quick_two_sum(q1, q2)
        return DF(s, e) + q3

    def __rtruediv__(self, other):
        return _as_df(other) / self

    # -- comparisons (hi with lo tiebreak) ----------------------------
    def __lt__(self, other):
        o = _as_df(other)
        return jnp.logical_or(
            self.hi < o.hi,
            jnp.logical_and(self.hi == o.hi, self.lo < o.lo),
        )

    def __le__(self, other):
        o = _as_df(other)
        return jnp.logical_or(
            self.hi < o.hi,
            jnp.logical_and(self.hi == o.hi, self.lo <= o.lo),
        )

    def __gt__(self, other):
        return _as_df(other) < self

    def __ge__(self, other):
        return _as_df(other) <= self


def _as_df(x):
    if isinstance(x, DF):
        return x
    if isinstance(x, (int, float, np.floating)):
        return DF.const(float(x))
    return DF(_f32(x))


def df(hi, lo=None) -> DF:
    return DF(hi, lo)


def where(mask, a, b) -> DF:
    a, b = _as_df(a), _as_df(b)
    return DF(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def dabs(a: DF) -> DF:
    return where(a.hi < 0, -a, a)


def dmax(a, b) -> DF:
    a, b = _as_df(a), _as_df(b)
    return where(a < b, b, a)


def dmin(a, b) -> DF:
    a, b = _as_df(a), _as_df(b)
    return where(b < a, b, a)


def recip(a: DF) -> DF:
    return _as_df(1.0) / a


def sqrt(a: DF) -> DF:
    """Double-float sqrt via one df Newton correction of the f32 root.

    Domain: a > 0 (callers guard, as the cone ops do).  a == 0 -> 0.
    """
    y0 = jnp.sqrt(jnp.maximum(a.hi, 0.0))
    y0_safe = jnp.where(y0 > 0, y0, 1.0)
    p, e = _two_prod(y0, y0)
    d = a - DF(p, e)
    t = d.hi / (2.0 * y0_safe)
    hi, lo = _quick_two_sum(y0, t)
    return where(y0 > 0, DF(hi, lo), DF.zeros(()))


_LN2 = 0.6931471805599453094172321214581766
_INV_LN2 = np.float32(1.4426950408889634)
# exp Taylor cutoff: |r| <= ln2/2 after range reduction, and
# (ln2/2)^14 / 14! ~ 2^-57 < the ~2^-49 double-float ulp
_EXP_TERMS = 14

# ln2 split into 16/16/24/24-bit chunks (values verified against a
# 200-bit reference; combined residual 1.2e-26).  The first two chunks
# have 16-bit mantissas, so k * chunk is EXACT in f32 for the integer
# |k| <= 128 the reduction produces (7 + 16 <= 24 mantissa bits); the
# third chunk's product is made exact with a two_prod.  The previous
# reduction multiplied k by a ~2^-49-rounded DF ln2, putting an
# |k|*2^-49*ln2 ~ 1.4e-13 ABSOLUTE error into r — which is a 1.4e-13
# RELATIVE error on exp(a), 500x the df ulp, and was the precision
# floor of every barrier/log chain in the nonsymmetric cone kernels
# (docs/STATUS.md round-4 "float-float ALMOST class").
_LN2_C1 = np.float32(0.693145751953125)          # 16-bit mantissa
_LN2_C2 = np.float32(1.4286197256296873e-06)     # 16-bit mantissa
_LN2_C3 = np.float32(-1.2905320041778356e-11)
_LN2_C4 = np.float32(-2.2829879883612685e-19)


def _pow2_exact(k):
    """2^k for integer-valued f32 k in [-252, 254], EXACTLY, as a pair
    of f32 power-of-two factors to multiply in sequence.  jnp.exp2 is a
    polynomial approximation on XLA (measured rel err ~2^-17 even on
    integer arguments — it silently destroyed exp's last 7 digits), so
    the factors are built from raw exponent bits instead."""
    ki = k.astype(jnp.int32)
    k1 = ki >> 1            # floor halving keeps both halves in
    k2 = ki - k1            # [-126, 127] over the full domain

    def bits(e):
        e = jnp.clip(e, -126, 127)
        return jax.lax.bitcast_convert_type(
            ((e + 127) << 23).astype(jnp.int32), jnp.float32)

    return bits(k1), bits(k2)


def exp(a: DF) -> DF:
    """Double-float exp via range reduction a = k·ln2 + r (|r| ≤ ln2/2)
    and a Taylor series evaluated in df arithmetic, then an exact 2^k
    scale — the standard double-double recipe (Hida/Li/Bailey QD; class
    (b) textbook algorithm, no reference-code counterpart).

    Domain: |a.hi| within the f32 exp range (cone callers feed moderate
    logs/ratios).  a.hi <= -87 underflows to 0, a.hi >= 89 returns inf
    — both in line with jnp.exp(f32) semantics."""
    k = jnp.round(a.hi * _INV_LN2)
    # r = a - k*ln2 with the chunked ln2: k*c1 and k*c2 are exact f32
    # products, k*c3 is made exact by a two_prod, k*c4's rounding is
    # ~1e-24 absolute — the reduction error is now below the df ulp
    r = a - k * _LN2_C1
    r = r - k * _LN2_C2
    p3, e3 = _two_prod(k, _LN2_C3)
    r = r - DF(p3, e3)
    r = r - k * _LN2_C4
    # Taylor sum as (1 + r) + r^2*P(r): P's Horner roundings are
    # relative to |P| <= 0.54 and scale by r^2 <= 0.12, keeping the
    # accumulated error near the df ulp of the O(1) result
    acc = DF.const(1.0 / float(math.factorial(_EXP_TERMS)))
    for i in range(_EXP_TERMS - 1, 1, -1):
        acc = acc * r + DF.const(1.0 / float(math.factorial(i)))
    acc = acc * (r * r) + r + 1.0
    s1, s2 = _pow2_exact(k)
    out = DF(acc.hi * s1 * s2, acc.lo * s1 * s2)
    # saturate outside the reduced range instead of trusting the series
    out = where(a.hi >= 89.0, DF(jnp.full_like(a.hi, np.inf)), out)
    out = where(a.hi <= -87.0, DF.zeros(a.hi.shape), out)
    return out


def log(a: DF) -> DF:
    """Double-float log: exact power-of-two mantissa extraction
    a = m·2^k (m ∈ [1,2), both limbs scaled exactly), Newton refinement
    of the f32 estimate of log m against the df exp (y ← y + m·e^{−y}−1;
    two quadratic iterations reach the df ulp), then log a = k·ln2 + y.
    Working on the mantissa keeps e^{−y} in (0.5, 1] — the previous
    whole-argument Newton underflowed e^{−y}'s lo limb for a outside
    ~[1e-30, 1e30] (f32's subnormal floor is 1e-38), degrading to ~1e-9
    absolute error exactly where the nonsymmetric cone barriers evaluate
    wide ratios.  Domain: a > 0; a <= 0 returns -inf on hi (mirrors
    cones/_logsafe guarding at call sites)."""
    pos = a.hi > 0
    safe = where(pos, a, DF(jnp.ones_like(a.hi)))
    # exponent of hi from its bits (clipped to the normal range: a
    # subnormal hi just leaves m < 1, which the Newton handles)
    e = ((jax.lax.bitcast_convert_type(safe.hi, jnp.int32) >> 23)
         & 0xFF) - 127
    e = jnp.clip(e, -126, 127).astype(jnp.float32)
    s1, s2 = _pow2_exact(-e)
    m = DF(safe.hi * s1 * s2, safe.lo * s1 * s2)   # exact scaling
    y = DF(jnp.log(m.hi))
    for _ in range(2):
        y = y + m * exp(-y) - 1.0
    y = y + DF.const(_LN2) * DF(e)
    neg_inf = jnp.full_like(a.hi, -np.inf)
    return DF(jnp.where(pos, y.hi, neg_inf),
              jnp.where(pos, y.lo, jnp.zeros_like(a.lo)))


def powc(a: DF, p: float) -> DF:
    """a**p for a trace-time-constant exponent, via exp(p·log a).
    Domain: a > 0 (pow-cone alphas scale positive arguments)."""
    return exp(log(a) * DF.const(float(p)))


def dsum(terms: Sequence[DF]) -> DF:
    """Pairwise (tree) sum of a python list of DF values."""
    items = list(terms)
    if not items:
        return DF.zeros(())
    while len(items) > 1:
        nxt = [items[i] + items[i + 1] for i in range(0, len(items) - 1, 2)]
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]


def ddot(a: Sequence[DF], b: Sequence[DF]) -> DF:
    return dsum([x * y for x, y in zip(a, b)])


# ---------------------------------------------------------------------------
# triple-float ("TF", f32-triple, ~2^-72) accumulation
#
# Purpose: the IPM's iterative refinement is limited by the PRECISION OF
# THE RESIDUAL EVALUATION — the limiting forward error of refined solves
# is ~eps_residual * kappa(K).  At df64's ~2^-49 that limit sits one
# digit short of the reference's native-f64 endgame (measured: 10-25% of
# exp/pow lanes stall ALMOST_SOLVED at gap ~1e-7 where f64 CPU reaches
# 1e-8 — docs/STATUS.md round 4).  Evaluating r = b - K x with TF
# products and accumulation pushes eps_residual to ~2^-72 and removes
# the stall (the correction solve itself stays df64; standard
# mixed-precision IR).  Only the ops the residual path needs exist:
# DFxDF -> TF exact-ish products, TF sums, TF -> DF rounding.
# (reference: src/kktsolvers/direct-ldl/directldl_defaults.jl runs
# native f64 throughout; this is the TPU-native equivalent headroom.)
# ---------------------------------------------------------------------------


class TF:
    """A triple-float value: elementwise hi + md + lo over f32 arrays,
    non-overlapping (renormalized after every operation)."""

    __slots__ = ("hi", "md", "lo")
    __array_priority__ = 1001

    def __init__(self, hi, md=None, lo=None):
        self.hi = _f32(hi)
        self.md = jnp.zeros_like(self.hi) if md is None else _f32(md)
        self.lo = jnp.zeros_like(self.hi) if lo is None else _f32(lo)

    @staticmethod
    def zeros(shape):
        z = jnp.zeros(shape, jnp.float32)
        return TF(z, z, z)

    @staticmethod
    def from_df(a: "DF") -> "TF":
        return TF(a.hi, a.lo)

    def to_df(self) -> "DF":
        s, e = _quick_two_sum(self.hi, self.md + self.lo)
        return DF(s, e)

    def __getitem__(self, idx):
        return TF(self.hi[idx], self.md[idx], self.lo[idx])

    @property
    def shape(self):
        return self.hi.shape

    def __neg__(self):
        return TF(-self.hi, -self.md, -self.lo)

    def __add__(self, other):
        o = other if isinstance(other, TF) else TF.from_df(_as_df(other))
        s0, e0 = _two_sum(self.hi, o.hi)
        s1, e1 = _two_sum(self.md, o.md)
        s2 = self.lo + o.lo
        t0, t1 = _two_sum(e0, s1)
        lo = (t1 + e1) + s2
        r0, r1 = _quick_two_sum(s0, t0)
        r1, r2 = _quick_two_sum(r1, lo)
        return TF(r0, r1, r2)

    __radd__ = __add__

    def __sub__(self, other):
        o = other if isinstance(other, TF) else TF.from_df(_as_df(other))
        return self + (-o)

    def __rsub__(self, other):
        return (-self) + other


def tf_prod(a: "DF", b: "DF") -> TF:
    """DF x DF -> TF with all cross terms error-free: the result carries
    the full ~2^-72 product (a plain DF product rounds at ~2^-49)."""
    a, b = _as_df(a), _as_df(b)
    p0, e0 = _two_prod(a.hi, b.hi)
    p1, e1 = _two_prod(a.hi, b.lo)
    p2, e2 = _two_prod(a.lo, b.hi)
    p3 = a.lo * b.lo
    t0, t1 = _two_sum(p1, p2)
    t0, t2 = _two_sum(t0, e0)
    lo = ((t1 + t2) + (e1 + e2)) + p3
    r0, r1 = _quick_two_sum(p0, t0)
    r1, r2 = _quick_two_sum(r1, lo)
    return TF(r0, r1, r2)


def tf_scale(t: TF, d: "DF") -> TF:
    """TF x DF -> TF with the three dominant cross terms error-free
    (the t.md*d.lo / t.lo*d.hi / t.lo*d.lo tail is ~2^-96 relative and
    accumulates in plain f32)."""
    d = _as_df(d)
    p0, e0 = _two_prod(t.hi, d.hi)
    p1, e1 = _two_prod(t.hi, d.lo)
    p2, e2 = _two_prod(t.md, d.hi)
    rest = (t.md * d.lo + t.lo * d.hi) + (e1 + e2)
    t0, t1 = _two_sum(p1, p2)
    t0, t2 = _two_sum(t0, e0)
    lo = (t1 + t2) + rest
    r0, r1 = _quick_two_sum(p0, t0)
    r1, r2 = _quick_two_sum(r1, lo)
    return TF(r0, r1, r2)


def tf_sum(terms) -> TF:
    """Pairwise (tree) sum of a python list of TF values."""
    items = [t if isinstance(t, TF) else TF.from_df(_as_df(t))
             for t in terms]
    if not items:
        return TF.zeros(())
    while len(items) > 1:
        nxt = [items[i] + items[i + 1]
               for i in range(0, len(items) - 1, 2)]
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0]


# ---------------------------------------------------------------------------
# XLA-side conversions (outside the kernel)
# ---------------------------------------------------------------------------

def split_f64(x):
    """f64 array -> (hi, lo) f32 pair, exactly (XLA side, not in-kernel)."""
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    """(hi, lo) f32 pair -> f64 array (XLA side, not in-kernel)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
