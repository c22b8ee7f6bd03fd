"""Double-float (f32-pair) arithmetic: precision vs native f64.

The megakernel (ipm/megakernel.py) runs the whole IPM in f32-pair
arithmetic inside one Pallas kernel; these tests pin the library's
accuracy at the ~2^-45-or-better level every operation must hold for the
IPM to reach 1e-8 tolerances (the same class as XLA's own f64-on-TPU
float-float emulation, ~2^-49).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from clarabel_tpu.linalg import df64
from clarabel_tpu.linalg.df64 import DF


def _mk(vals):
    hi, lo = df64.split_f64(np.asarray(vals, np.float64))
    return DF(hi, lo)


def _val(d):
    return np.asarray(df64.join_f64(d.hi, d.lo))


def _relerr(approx, exact):
    exact = np.asarray(exact)
    scale = np.maximum(np.abs(exact), 1e-300)
    return np.max(np.abs(approx - exact) / scale)


RNG = np.random.default_rng(7)


def _rand(n, scale=1.0):
    # mantissa-rich values spanning several magnitudes
    return (RNG.standard_normal(n) * 10.0 ** RNG.uniform(-6, 6, n)) * scale


def test_split_join_roundtrip():
    # representation carries ~49 bits (2x24-bit words + roundoff), the
    # same class as XLA's f64-on-TPU float-float emulation (~2^-49)
    x = _rand(512)
    d = _mk(x)
    assert _relerr(_val(d), x) < 2.0 ** -47


def test_add_sub_mul_precision():
    a, b = _rand(512), _rand(512)
    assert _relerr(_val(_mk(a) + _mk(b)), a + b) < 1e-13 * 32
    assert _relerr(_val(_mk(a) - _mk(b)), a - b) < 1e-13 * 32
    assert _relerr(_val(_mk(a) * _mk(b)), a * b) < 2e-14


def test_add_cancellation():
    # catastrophic cancellation: (a + eps) - a must recover eps exactly
    a = np.full(8, 1.0)
    eps = np.full(8, 1e-12)
    out = _val((_mk(a) + _mk(eps)) - _mk(a))
    # the low word is f32, so the recovered small part carries f32
    # relative precision -- identical to XLA's float-float f64 on TPU
    assert _relerr(out, eps) < 1e-6


def test_div_precision():
    a, b = _rand(512), _rand(512)
    assert _relerr(_val(_mk(a) / _mk(b)), a / b) < 2e-14


def test_sqrt_precision():
    a = np.abs(_rand(512))
    assert _relerr(_val(df64.sqrt(_mk(a))), np.sqrt(a)) < 2e-14
    # zero maps to zero (guarded domain)
    assert _val(df64.sqrt(_mk(np.zeros(4))))[0] == 0.0


def test_dot_precision():
    n = 64
    a, b = _rand(n, 1.0), _rand(n, 1.0)
    da = [_mk(np.full(4, v)) for v in a]
    db = [_mk(np.full(4, v)) for v in b]
    out = _val(df64.ddot(da, db))[0]
    exact = float(np.dot(a, b))
    assert abs(out - exact) <= 1e-12 * float(np.sum(np.abs(a * b)))


def test_comparisons_and_selects():
    a, b = _rand(256), _rand(256)
    da, db = _mk(a), _mk(b)
    av, bv = _val(da), _val(db)  # compare on the representable values
    assert np.array_equal(np.asarray(da < db), av < bv)
    assert np.array_equal(np.asarray(da >= db), av >= bv)
    assert np.array_equal(_val(df64.dmax(da, db)), np.maximum(av, bv))
    assert np.array_equal(_val(df64.dmin(da, db)), np.minimum(av, bv))
    assert np.array_equal(_val(df64.dabs(da)), np.abs(av))
    # lo-part tiebreak: identical hi, differing lo
    x = _mk(np.asarray([1.0]))
    y = x + _mk(np.asarray([1e-12]))
    assert bool(x < y) and not bool(y < x)


def test_scalar_mixing():
    a = _rand(64)
    da = _mk(a)
    assert _relerr(_val(2.0 * da + 1.0), 2.0 * a + 1.0) < 1e-13
    assert _relerr(_val((da - 0.5) / 3.0), (a - 0.5) / 3.0) < 1e-13
    # python-float constants split exactly
    c = DF.const(0.1)
    assert abs(float(np.float64(c.hi) + np.float64(c.lo)) - 0.1) < 1e-14


def test_under_jit():
    @jax.jit
    def f(ahi, alo, bhi, blo):
        out = DF(ahi, alo) * DF(bhi, blo) + df64.sqrt(DF(bhi, blo) * DF(bhi, blo))
        return out.hi, out.lo

    a, b = _rand(128), _rand(128)
    da, db = _mk(a), _mk(b)
    hi, lo = f(da.hi, da.lo, db.hi, db.lo)
    exact = a * b + np.abs(b)
    assert _relerr(np.asarray(df64.join_f64(hi, lo)), exact) < 1e-12


def test_exp_precision():
    # full df precision wherever the result's lo word stays normal
    # (|result| >~ 4e-31; below that XLA flushes the subnormal lo --
    # the same dynamic-range limit as XLA's own f64-on-TPU emulation)
    x = np.concatenate([RNG.uniform(-55.0, 80.0, 4000),
                        RNG.uniform(-0.5, 0.5, 2000),
                        np.array([0.0, 1.0, -1.0, 70.0, -50.0])])
    out = _val(df64.exp(_mk(x)))
    assert _relerr(out, np.exp(x)) < 5e-13
    # graceful degradation in the deep-underflow band, saturation below
    deep = _val(df64.exp(_mk(np.array([-70.0, -86.0, -100.0]))))
    assert abs(deep[0] / np.exp(-70.0) - 1.0) < 1e-7
    assert deep[2] == 0.0
    assert np.isinf(_val(df64.exp(_mk(np.array([95.0]))))[0])


def test_log_precision():
    y = np.exp(RNG.uniform(-60.0, 60.0, 4000))
    out = _val(df64.log(_mk(y)))
    want = np.log(y)
    assert np.max(np.abs(out - want)) < 1e-12
    # near 1: relative accuracy through the Newton polish
    y1 = 1.0 + RNG.uniform(-0.4, 0.4, 2000)
    out1 = _val(df64.log(_mk(y1)))
    assert np.max(np.abs(out1 - np.log(y1))) < 5e-14
    # domain guard mirrors cones/_logsafe call-site semantics
    bad = df64.log(_mk(np.array([0.0, -3.0])))
    assert np.all(np.isneginf(np.asarray(bad.hi)))


def test_powc_precision():
    z = np.exp(RNG.uniform(-20.0, 20.0, 2000))
    for p in (0.371, 2.0, -1.3, 0.5):
        out = _val(df64.powc(_mk(z), p))
        assert _relerr(out, z ** p) < 1e-12
