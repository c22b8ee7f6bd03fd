"""Native symbolic-analysis library tests: parity with the Python versions."""

import numpy as np
import pytest

from clarabel_tpu import native_symbolic
from clarabel_tpu.chordal import symbolic as py_symbolic


def random_graph(n, density, seed):
    rng = np.random.default_rng(seed)
    adj = [set() for _ in range(n)]
    for _ in range(int(density * n * n / 2)):
        i, j = rng.integers(0, n, 2)
        if i != j:
            adj[i].add(int(j))
            adj[j].add(int(i))
    return adj


def test_native_builds():
    assert native_symbolic.available(), "native symbolic library failed to build"


def test_symbolic_cholesky_parity():
    for seed in range(3):
        adj = random_graph(30, 0.1, seed)
        perm = native_symbolic.min_degree_ordering_native(adj)
        assert perm is not None
        assert sorted(perm.tolist()) == list(range(30))

        L_native = native_symbolic.symbolic_cholesky_native(adj, perm)
        L_py, _ = py_symbolic.symbolic_cholesky(adj, perm)
        assert [sorted(c) for c in L_native] == [sorted(c) for c in L_py]


def test_chordal_extension_is_chordal():
    """The filled graph must be chordal: every column pattern minus its
    first element must be contained in the first element's pattern."""
    adj = random_graph(25, 0.15, 7)
    perm = native_symbolic.min_degree_ordering_native(adj)
    L = native_symbolic.symbolic_cholesky_native(adj, perm)
    for j, patt in enumerate(L):
        if len(patt) > 1:
            p = patt[0]
            rest = set(patt[1:])
            assert rest <= set(L[p]) | {p}, f"column {j} violates chordality"
