"""Pallas lane-batched LDL kernel tests (interpreter mode — the kernel
is opt-in on hardware until the environment's Mosaic compiler accepts
kernels; see docs/STATUS.md)."""

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
