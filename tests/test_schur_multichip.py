"""Multi-device block-arrow Schur factorization tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh


def make_blockarrow(p=8, nb=12, nt=6, seed=0):
    rng = np.random.default_rng(seed)
    D = np.zeros((p, nb, nb))
    B = rng.standard_normal((p, nb, nt))
    for i in range(p):
        F = rng.standard_normal((nb, nb))
        D[i] = F @ F.T + nb * np.eye(nb)
    G = rng.standard_normal((nt, nt))
    # make the tail block dominant enough that the Schur complement stays
    # positive definite (signs default to +1 in this test)
    C = G @ G.T + (nt + p * nb) * np.eye(nt)
    return D, B, C


def dense_assemble(D, B, C):
    p, nb, _ = D.shape
    nt = C.shape[0]
    N = p * nb + nt
    K = np.zeros((N, N))
    for i in range(p):
        K[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb] = D[i]
        K[i * nb:(i + 1) * nb, p * nb:] = B[i]
        K[p * nb:, i * nb:(i + 1) * nb] = B[i].T
    K[p * nb:, p * nb:] = C
    return K


def test_blockarrow_matches_dense():
    from clarabel_tpu.parallel.schur import BlockArrowKKT

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, axis_names=("tp",))

    p, nb, nt = 8, 12, 6
    D, B, C = make_blockarrow(p, nb, nt)
    K = dense_assemble(D, B, C)

    solver = BlockArrowKKT(mesh, p, nb, nt)
    assert solver.factor(D, B, C)

    rng = np.random.default_rng(1)
    rhs_blocks = rng.standard_normal((p, nb))
    rhs_tail = rng.standard_normal(nt)

    x, y = solver.solve(rhs_blocks, rhs_tail)
    sol = np.concatenate([x.reshape(-1), y])
    ref = np.linalg.solve(K, np.concatenate([rhs_blocks.reshape(-1), rhs_tail]))
    assert np.linalg.norm(sol - ref) / np.linalg.norm(ref) < 1e-10


def test_blockarrow_multiple_blocks_per_device():
    from clarabel_tpu.parallel.schur import BlockArrowKKT

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("tp",))

    p, nb, nt = 16, 8, 4  # 4 blocks per device
    D, B, C = make_blockarrow(p, nb, nt, seed=2)
    K = dense_assemble(D, B, C)

    solver = BlockArrowKKT(mesh, p, nb, nt)
    assert solver.factor(D, B, C)

    rng = np.random.default_rng(3)
    rhs_blocks = rng.standard_normal((p, nb))
    rhs_tail = rng.standard_normal(nt)
    x, y = solver.solve(rhs_blocks, rhs_tail)
    sol = np.concatenate([x.reshape(-1), y])
    ref = np.linalg.solve(K, np.concatenate([rhs_blocks.reshape(-1), rhs_tail]))
    assert np.linalg.norm(sol - ref) / np.linalg.norm(ref) < 1e-10
