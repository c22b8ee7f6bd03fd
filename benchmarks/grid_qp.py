"""Grid-Laplacian QP benchmark: the nested-dissection (multifrontal)
backend's target problem class — a 2D mesh whose single-level separator
is too large for the block-arrow backend.

Usage: python benchmarks/grid_qp.py [g]   (grid side, default 60)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def grid_qp_sparse(g, seed=7):
    n = g * g
    rng = np.random.default_rng(seed)
    diag = 4.0 + rng.uniform(0.5, 1.5, n)
    rows, cols, vals = [], [], []

    def idx(i, j):
        return i * g + j

    for i in range(g):
        for j in range(g):
            rows.append(idx(i, j))
            cols.append(idx(i, j))
            vals.append(diag[idx(i, j)])
            for di, dj in ((0, 1), (1, 0)):
                if i + di < g and j + dj < g:
                    rows += [idx(i, j), idx(i + di, j + dj)]
                    cols += [idx(i + di, j + dj), idx(i, j)]
                    vals += [-1.0, -1.0]
    P = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    q = rng.standard_normal(n)
    A = -sp.eye(n).tocsr()
    b = np.zeros(n)
    return P, q, A, b


def main():
    import jax

    from clarabel_tpu import Solver, Settings, NonnegativeConeT

    g = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n = g * g
    P, q, A, b = grid_qp_sparse(g)
    print(f"grid {g}x{g}: n={n}, N={2*n}, platform="
          f"{jax.devices()[0].platform}", flush=True)

    t0 = time.perf_counter()
    s = Solver(P, q, A, b, [NonnegativeConeT(n)],
               settings=Settings(verbose=False))
    print(f"setup {time.perf_counter()-t0:.1f}s  sparse={s._sparse_mode} "
          f"plan={type(s._structure).__name__}", flush=True)
    if hasattr(s._structure, "levels"):
        print("levels:", [(lv.cnt, lv.nr, lv.nbd)
                          for lv in s._structure.levels], flush=True)
        print(f"flop est {s._structure.flop_estimate()/1e9:.2f} GF "
              f"(dense {(2*n)**3/3/1e9:.0f} GF)", flush=True)

    t0 = time.perf_counter()
    sol = s.solve()
    t_cold = time.perf_counter() - t0
    print(f"cold solve {t_cold:.1f}s status={sol.status} "
          f"iters={s.info.iterations}", flush=True)

    s.update_q(q * 1.01)
    t0 = time.perf_counter()
    sol = s.solve()
    t_warm = time.perf_counter() - t0
    print(f"warm solve {t_warm:.2f}s status={sol.status} "
          f"iters={s.info.iterations} "
          f"res_p={float(s.info.res_primal):.2e} "
          f"res_d={float(s.info.res_dual):.2e}", flush=True)


if __name__ == "__main__":
    main()
