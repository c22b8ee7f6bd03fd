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
    r = a - DF.const(_LN2) * DF(k)
    # Horner in df: sum_{i=0..N} r^i / i!
    acc = DF.const(1.0 / float(math.factorial(_EXP_TERMS)))
    for i in range(_EXP_TERMS - 1, -1, -1):
        acc = acc * r + DF.const(1.0 / float(math.factorial(i)))
    s1, s2 = _pow2_exact(k)
    out = DF(acc.hi * s1 * s2, acc.lo * s1 * s2)
    # saturate outside the reduced range instead of trusting the series
    out = where(a.hi >= 89.0, DF(jnp.full_like(a.hi, np.inf)), out)
    out = where(a.hi <= -87.0, DF.zeros(a.hi.shape), out)
    return out


def log(a: DF) -> DF:
    """Double-float log by Newton refinement of the f32 estimate against
    the df exp: y ← y + a·exp(−y) − 1.  Two iterations take the f32
    estimate's ~1e-7 relative error to ~1e-14 and then below the df ulp
    (quadratic convergence).  Domain: a > 0; a <= 0 returns -inf on hi
    (mirrors cones/_logsafe guarding at call sites)."""
    pos = a.hi > 0
    safe = where(pos, a, DF(jnp.ones_like(a.hi)))
    y = DF(jnp.log(jnp.where(pos, a.hi, 1.0)))
    for _ in range(2):
        y = y + safe * exp(-y) - 1.0
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
