"""ctypes binding to the native symbolic-analysis library.

Builds `native/libclarabel_symbolic.so` on demand (plain g++, no
dependencies) and exposes:

* `min_degree_ordering(adj)`  — fill-reducing ordering
* `symbolic_cholesky_native(adj, perm)` — L pattern of the permuted graph

Falls back transparently to the pure-Python implementations in
`chordal.symbolic` when no compiler is available.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Set

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclarabel_symbolic.so")

_lib = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.cl_min_degree_order.restype = ctypes.c_int
    lib.cl_min_degree_order.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
    lib.cl_symbolic_cholesky.restype = ctypes.c_int64
    lib.cl_symbolic_cholesky.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, i64p, i64p, ctypes.c_int64,
    ]
    try:
        lib.cl_multilevel_bisect.restype = ctypes.c_int
        lib.cl_multilevel_bisect.argtypes = [
            ctypes.c_int64, i64p, i64p, i64p, i64p, ctypes.c_uint64,
        ]
    except AttributeError:  # pragma: no cover - stale .so without the sym
        pass
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _adj_to_csr(adj: List[Set[int]]):
    n = len(adj)
    ptr = np.zeros(n + 1, dtype=np.int64)
    for v in range(n):
        ptr[v + 1] = ptr[v] + len(adj[v])
    idx = np.empty(ptr[-1], dtype=np.int64)
    for v in range(n):
        idx[ptr[v]:ptr[v + 1]] = sorted(adj[v])
    return ptr, idx


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def min_degree_ordering_native(adj: List[Set[int]]) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = len(adj)
    ptr, idx = _adj_to_csr(adj)
    perm = np.empty(n, dtype=np.int64)
    rc = lib.cl_min_degree_order(n, _p(ptr), _p(idx), _p(perm))
    return perm if rc == 0 else None


def multilevel_bisect_native(adj: List[Set[int]], weights,
                             seed: int = 1) -> Optional[np.ndarray]:
    """METIS-style multilevel bisection with vertex separator (heavy-edge
    matching coarsening + FM refinement + greedy weighted vertex cover).
    Returns side[v] in {0 left, 1 right, 2 separator}, or None when the
    native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "cl_multilevel_bisect"):
        return None
    n = len(adj)
    ptr, idx = _adj_to_csr(adj)
    wt = np.ascontiguousarray(weights, dtype=np.int64)
    side = np.empty(n, dtype=np.int64)
    rc = lib.cl_multilevel_bisect(
        n, _p(ptr), _p(idx), _p(wt), _p(side), ctypes.c_uint64(seed)
    )
    return side if rc == 0 else None


def symbolic_cholesky_native(adj: List[Set[int]], perm: np.ndarray):
    """Returns Lcols (list of sorted below-diag patterns) or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(adj)
    ptr, idx = _adj_to_csr(adj)
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    cap = max(16, 4 * len(idx) + 8 * n)
    for _ in range(8):
        lp = np.zeros(n + 1, dtype=np.int64)
        li = np.zeros(cap, dtype=np.int64)
        nnz = lib.cl_symbolic_cholesky(
            n, _p(ptr), _p(idx), _p(perm), _p(lp), _p(li), cap
        )
        if nnz >= 0:
            return [
                li[lp[j]:lp[j + 1]].tolist() for j in range(n)
            ]
        cap *= 4
    return None
