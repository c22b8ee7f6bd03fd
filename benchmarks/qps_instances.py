"""Generate Maros–Mészáros-STYLE QPS instances as real .qps files.

The true CVXQP1-3 / AUG2DC files cannot be fetched in this environment
(zero egress), so structurally faithful instances are generated with
fixed seeds and written in QPS format; the benchmark then ingests them
through the QPS reader (clarabel_tpu/io/qps.py) — the same path a user
takes with the real files.  Instances are labelled "-style" everywhere
to make the distinction explicit.

Run as a script to (re)write benchmarks/data/*.qps deterministically.
"""

import os

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def qps_text_eq_box(name, P, q, Aeq, beq, lb=None, ub=None) -> str:
    """QPS text for  min ½x'Px + q'x  s.t. Aeq x = beq, lb <= x <= ub
    (None entries/arrays = unbounded; MPS default lower bound 0 is made
    explicit so the writer round-trips arbitrary bounds)."""
    n = len(q)
    m = 0 if Aeq is None else Aeq.shape[0]
    lines = [f"NAME          {name}", "ROWS", " N  obj"]
    for i in range(m):
        lines.append(f" E  c{i}")
    lines.append("COLUMNS")
    for j in range(n):
        ents = []
        if q[j] != 0.0:
            ents.append(("obj", q[j]))
        if m:
            for i in np.nonzero(Aeq[:, j])[0]:
                ents.append((f"c{i}", Aeq[i, j]))
        if not ents:
            ents.append(("obj", 0.0))
        for k in range(0, len(ents), 2):
            chunk = ents[k:k + 2]
            parts = "    ".join(f"{r}  {v:.17g}" for r, v in chunk)
            lines.append(f"    x{j}    {parts}")
    lines.append("RHS")
    for i in range(m):
        if beq[i] != 0.0:
            lines.append(f"    rhs    c{i}  {beq[i]:.17g}")
    lines.append("BOUNDS")
    for j in range(n):
        l = None if lb is None else lb[j]
        u = None if ub is None else ub[j]
        if l is None and u is None:
            lines.append(f" FR bnd  x{j}")
            continue
        if l is None:
            lines.append(f" MI bnd  x{j}")
        elif l != 0.0:
            lines.append(f" LO bnd  x{j}  {l:.17g}")
        if u is not None:
            lines.append(f" UP bnd  x{j}  {u:.17g}")
    lines.append("QUADOBJ")
    for j in range(n):
        for i in range(j + 1):
            if P[i, j] != 0.0:
                lines.append(f"    x{i}  x{j}  {P[i, j]:.17g}")
    lines.append("ENDATA")
    return "\n".join(lines) + "\n"


def cvxqp_style_qps(n=200, seed=0, name="CVXQP1-style") -> str:
    """CVXQP-family structure: tridiagonal-ish SPD P, m = n/2 sparse
    equalities each touching 3 variables, box bounds |x| <= 10."""
    rng = np.random.default_rng(seed)
    m_eq = n // 2
    P = np.diag(rng.uniform(1.0, 5.0, n))
    off = rng.uniform(-0.5, 0.5, n - 1)
    P += np.diag(off, 1) + np.diag(off, -1)
    P = P + n * 1e-3 * np.eye(n)
    q = rng.standard_normal(n)
    Aeq = np.zeros((m_eq, n))
    for i in range(m_eq):
        cols = rng.choice(n, 3, replace=False)
        Aeq[i, cols] = rng.standard_normal(3)
    beq = Aeq @ rng.uniform(-1, 1, n)
    lb = -10 * np.ones(n)
    ub = 10 * np.ones(n)
    return qps_text_eq_box(name, np.triu(P), q, Aeq, beq, lb, ub)


def aug2d_style_qps(grid=10, seed=0, name="AUG2DC-style") -> str:
    """AUG2DC-style expanded quadratic network problem on a 2-d grid:
    identity Hessian, sparse equality network, free variables."""
    rng = np.random.default_rng(seed)
    n = 2 * grid * grid
    m_eq = grid * grid
    P = np.eye(n)
    q = rng.standard_normal(n) * 0.1
    Aeq = np.zeros((m_eq, n))
    for i in range(m_eq):
        Aeq[i, 2 * i] = 1.0
        Aeq[i, 2 * i + 1] = -1.0
        if i + 1 < m_eq:
            Aeq[i, (2 * i + 2) % n] = 0.5
    beq = rng.standard_normal(m_eq) * 0.1
    return qps_text_eq_box(name, P, q, Aeq, beq, lb=None, ub=None)


INSTANCES = {
    "CVXQP1_style.qps": lambda: cvxqp_style_qps(200, 0, "CVXQP1-style"),
    "CVXQP2_style.qps": lambda: cvxqp_style_qps(200, 1, "CVXQP2-style"),
    "CVXQP3_style.qps": lambda: cvxqp_style_qps(200, 2, "CVXQP3-style"),
    "AUG2DC_style.qps": lambda: aug2d_style_qps(10, 0, "AUG2DC-style"),
}


def write_all(data_dir=DATA_DIR):
    os.makedirs(data_dir, exist_ok=True)
    for fname, gen in INSTANCES.items():
        with open(os.path.join(data_dir, fname), "w") as f:
            f.write(gen())
    return sorted(INSTANCES)


if __name__ == "__main__":
    for f in write_all():
        print("wrote", f)
