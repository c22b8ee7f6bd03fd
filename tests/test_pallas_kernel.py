"""Pallas lane-batched LDL kernel tests (interpreter mode here on CPU;
the kernel auto-enables on TPU for f32 factors — see docs/STATUS.md for
measured on-chip numbers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clarabel_tpu.linalg.pallas_ldl import batched_ldl_inverse, make_factor_inverse
from clarabel_tpu.linalg.ldl import ldl_factor, invert_unit_lower


def make_kkts(B, np_=5, nm=7, seed=0):
    rng = np.random.default_rng(seed)
    n = np_ + nm
    signs = np.concatenate([np.ones(np_), -np.ones(nm)])
    Ks = []
    for _ in range(B):
        P = rng.standard_normal((np_, np_))
        P = P @ P.T + np_ * np.eye(np_)
        A = rng.standard_normal((nm, np_))
        H = np.diag(rng.uniform(0.5, 2.0, nm))
        Ks.append(np.block([[P, A.T], [A, -H]]))
    return np.stack(Ks), signs


def test_kernel_matches_reference():
    K, signs = make_kkts(256)
    Kf = jnp.asarray(K, jnp.float32)
    Linv, d, ok = batched_ldl_inverse(
        Kf, jnp.asarray(signs, jnp.float32), interpret=True
    )
    assert bool(np.all(ok))
    for i in range(0, 256, 51):
        L, dd, _ = ldl_factor(jnp.asarray(K[i]), jnp.asarray(signs))
        Li = np.asarray(invert_unit_lower(L))
        assert np.abs(np.asarray(Linv[i]) - Li).max() < 1e-4
        assert np.abs(np.asarray(d[i]) - np.asarray(dd)).max() < 1e-4


def test_custom_vmap_rule_with_padding():
    """Batch size not a multiple of the lane width exercises the pad path."""
    K, signs = make_kkts(100)  # 100 % 128 != 0
    fi = make_factor_inverse(signs, 1e-13, 2e-7, True, interpret=True)
    Linv, d, ok = jax.vmap(fi)(jnp.asarray(K, jnp.float32))
    assert Linv.shape == (100, 12, 12)
    assert bool(np.all(ok))
    # solve check: Linv' D^-1 Linv applied = K^-1
    i = 7
    rng = np.random.default_rng(1)
    b = rng.standard_normal(12).astype(np.float32)
    y = np.asarray(Linv[i]) @ b / np.asarray(d[i])
    x = np.asarray(Linv[i]).T @ y
    assert np.abs(K[i] @ x - b).max() < 1e-2  # f32 kernel tolerance


def test_primitive_inside_cond_while_vmap():
    """The factor-inverse primitive must batch correctly when its call
    sits inside a lax.cond branch inside a lax.while_loop under vmap —
    the exact nesting of the IPM loop's status-gated factorizations
    (custom_vmap failed here with a consts_batched assertion)."""
    K, signs = make_kkts(8, np_=3, nm=2, seed=3)
    fi = make_factor_inverse(signs, 1e-9, 2e-7, True, interpret=True)

    def solve_one(K0):
        def body(c):
            i, K = c

            def do(K):
                Linv, d, ok = fi(K.astype(jnp.float32))
                return K + 0.01 * Linv.astype(K.dtype)

            K = jax.lax.cond(jnp.sum(K) < 1e9, do, lambda K: K, K)
            return (i + 1, K)

        _, Kf = jax.lax.while_loop(lambda c: c[0] < 2, body,
                                   (jnp.asarray(0), K0))
        return Kf

    out = jax.jit(jax.vmap(solve_one))(jnp.asarray(K))
    assert out.shape == K.shape
    assert np.all(np.isfinite(np.asarray(out)))

    # batched result equals per-instance unbatched results
    ref = np.stack([np.asarray(jax.jit(solve_one)(jnp.asarray(K[i])))
                    for i in range(K.shape[0])])
    assert np.allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
