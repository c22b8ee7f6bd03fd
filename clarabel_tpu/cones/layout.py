"""Static cone layout — the TPU-side "composite cone" plan.

The reference's CompositeCone holds a vector of cone objects plus
`rng_cones` index ranges and fans every operation out with a dynamic
dispatch jump table (reference: src/cones/compositecone_type.jl:7-65,
src/cones/cone_dispatch.jl:34-47).  On TPU we invert that: the cone list is
lowered once, at setup time, into a *static layout* of structure-of-arrays
groups.  All cones of the same type (and, where shapes matter, the same
dimension) form one group with a static integer gather/scatter index array,
so that every cone operation becomes a single batched fixed-shape tensor op
per group instead of a per-cone loop.
"""

import dataclasses

import jax
import jax.numpy as jnp
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .api import (
    SupportedCone,
    ZeroConeT,
    NonnegativeConeT,
    SecondOrderConeT,
    ExponentialConeT,
    PowerConeT,
    GenPowerConeT,
    PSDTriangleConeT,
    nvars,
    cone_degree,
    cone_is_symmetric,
)


@dataclasses.dataclass
class ConeGroup:
    """One batched group of same-type (and same-shape) cones."""

    kind: str  # "zero" | "nn" | "soc" | "psd" | "exp" | "pow" | "genpow"
    # (count, width) gather indices into the length-m conic vector.  For the
    # elementwise kinds ("zero"/"nn") this is (1, k) — a single flat row.
    # SOC groups may be *bucketed*: cones of different dims padded to a
    # common width, with pad positions holding the out-of-bounds sentinel
    # m (gathers fill 0, scatters drop) — zero-padding an SOC is exact.
    idx: np.ndarray
    # matrix side-dimension for "psd" groups, else 0
    psd_n: int = 0
    # per-cone power parameters for "pow" groups: shape (count,)
    alpha: Optional[np.ndarray] = None
    # generalized power cone parameters: alpha (count, dim1), dim2
    dim1: int = 0
    dim2: int = 0
    # (count,) true cone dims when bucketed/padded; None = width exact
    true_dims: Optional[np.ndarray] = None

    @property
    def count(self) -> int:
        return self.idx.shape[0]

    @property
    def width(self) -> int:
        return self.idx.shape[1]


class ConeLayout:
    """Static plan for a Cartesian product of cones.

    Groups all cones by (type, shape) into batched index blocks.  Hashable
    via `.key` so jitted solver functions can be cached per problem
    structure.
    """

    def __init__(self, cones: Sequence[SupportedCone],
                 soc_bucketing: Optional[bool] = None,
                 psd_bucketing: Optional[bool] = None):
        self.cones: Tuple[SupportedCone, ...] = tuple(cones)
        self.m = int(sum(nvars(c) for c in self.cones))
        self.degree = int(sum(cone_degree(c) for c in self.cones))
        self.is_symmetric = all(cone_is_symmetric(c) for c in self.cones)

        # per-cone index ranges (rng_cones analogue)
        self.ranges: List[Tuple[int, int]] = []
        ofs = 0
        for c in self.cones:
            k = nvars(c)
            self.ranges.append((ofs, ofs + k))
            ofs += k

        # ---- build groups ----
        zero_idx: List[np.ndarray] = []
        nn_idx: List[np.ndarray] = []
        soc_by_dim: Dict[int, List[np.ndarray]] = defaultdict(list)
        psd_by_n: Dict[int, List[np.ndarray]] = defaultdict(list)
        exp_idx: List[np.ndarray] = []
        pow_idx: List[np.ndarray] = []
        pow_alpha: List[float] = []
        genpow_by_shape: Dict[Tuple[int, int], List[Tuple[np.ndarray, np.ndarray]]] = defaultdict(list)

        for cone, (lo, hi) in zip(self.cones, self.ranges):
            rng = np.arange(lo, hi, dtype=np.int32)
            if isinstance(cone, ZeroConeT):
                zero_idx.append(rng)
            elif isinstance(cone, NonnegativeConeT):
                nn_idx.append(rng)
            elif isinstance(cone, SecondOrderConeT):
                soc_by_dim[cone.dim].append(rng)
            elif isinstance(cone, PSDTriangleConeT):
                psd_by_n[cone.dim].append(rng)
            elif isinstance(cone, ExponentialConeT):
                exp_idx.append(rng)
            elif isinstance(cone, PowerConeT):
                pow_idx.append(rng)
                pow_alpha.append(cone.alpha)
            elif isinstance(cone, GenPowerConeT):
                a = np.asarray(cone.alpha, dtype=np.float64)
                genpow_by_shape[(len(cone.alpha), cone.dim2)].append((rng, a))
            else:
                raise TypeError(f"unsupported cone: {cone}")

        self.groups: Dict[str, ConeGroup] = {}
        if zero_idx:
            self.groups["zero"] = ConeGroup("zero", np.concatenate(zero_idx)[None, :])
        if nn_idx:
            self.groups["nn"] = ConeGroup("nn", np.concatenate(nn_idx)[None, :])

        # SOC bucketing: many distinct dims would each compile their own
        # group of kernels; pad to power-of-two buckets instead (zero-pad
        # of an SOC is exact: (s, 0) is interior iff s is).
        if soc_bucketing is None:
            soc_bucketing = len(soc_by_dim) > 2
        if soc_bucketing and soc_by_dim:
            buckets: Dict[int, List[Tuple[np.ndarray, int]]] = defaultdict(list)
            for dim, rows in soc_by_dim.items():
                bdim = max(4, 1 << (dim - 1).bit_length())
                for r in rows:
                    buckets[bdim].append((r, dim))
            for bdim in sorted(buckets):
                entries = buckets[bdim]
                idx = np.full((len(entries), bdim), self.m, dtype=np.int32)
                tdims = np.zeros(len(entries), dtype=np.int32)
                for i, (r, dim) in enumerate(entries):
                    idx[i, :dim] = r
                    tdims[i] = dim
                exact = bool(np.all(tdims == bdim))
                self.groups[f"soc{bdim}b"] = ConeGroup(
                    "soc", idx, true_dims=None if exact else tdims
                )
        else:
            for dim in sorted(soc_by_dim):
                self.groups[f"soc{dim}"] = ConeGroup(
                    "soc", np.stack(soc_by_dim[dim])
                )
        # PSD clique-size bucketing: a chordal decomposition emits
        # cliques of DOZENS of distinct sizes, and each exact-size group
        # compiles and dispatches its own chain of gathers/chols/eigs
        # per IPM iteration — measured as the dominant while-loop SELF
        # time on the max-cut nv=500 BASELINE config (docs/PERF.md).
        # Pad cones to a handful of bucket sides chosen by a DP that
        # minimizes total padded O(side³) work; a cone of side k sits in
        # the leading k×k block of the bucket-side matrix and the pad
        # block is pinned to the identity inside every factorization
        # (exact: blkdiag(S, I) — see cones/psd.py pad handling).
        if psd_bucketing is None:
            psd_bucketing = len(psd_by_n) > 4
        if psd_bucketing and psd_by_n:
            for bside, sizes in _psd_buckets(psd_by_n).items():
                entries = [(r, k) for k in sizes for r in psd_by_n[k]]
                tb = bside * (bside + 1) // 2
                idx = np.full((len(entries), tb), self.m, dtype=np.int32)
                tdims = np.zeros(len(entries), dtype=np.int32)
                for i, (r, k) in enumerate(entries):
                    # Both triangles use column-major triu ordering, so
                    # the leading k×k block of the side-bside bucket
                    # occupies svec positions 0..t_k-1 verbatim: bucket
                    # position col(col+1)/2+row equals the cone position
                    # for every col < k.  Embedding is a plain prefix.
                    t_k = k * (k + 1) // 2
                    idx[i, :t_k] = r
                    tdims[i] = t_k
                exact = bool(np.all(tdims == tb))
                self.groups[f"psd{bside}b"] = ConeGroup(
                    "psd", idx, psd_n=bside,
                    true_dims=None if exact else tdims,
                )
        else:
            for n in sorted(psd_by_n):
                self.groups[f"psd{n}"] = ConeGroup(
                    "psd", np.stack(psd_by_n[n]), psd_n=n)
        if exp_idx:
            self.groups["exp"] = ConeGroup("exp", np.stack(exp_idx))
        if pow_idx:
            self.groups["pow"] = ConeGroup(
                "pow", np.stack(pow_idx), alpha=np.asarray(pow_alpha, dtype=np.float64)
            )
        for (d1, d2) in sorted(genpow_by_shape):
            entries = genpow_by_shape[(d1, d2)]
            self.groups[f"genpow{d1}_{d2}"] = ConeGroup(
                "genpow",
                np.stack([e[0] for e in entries]),
                alpha=np.stack([e[1] for e in entries]),
                dim1=d1,
                dim2=d2,
            )

        # structure key for jit caching.  Must hash the idx CONTENTS, not
        # just shapes: the same cone multiset in a different order (e.g.
        # [PSD(3), Zero(3)] vs [Zero(3), PSD(3)]) yields identical group
        # shapes but different row maps, and the row maps are baked into
        # the compiled program as constants — a shape-only key silently
        # reuses the wrong executable (caught by test_cbf_reader).
        import hashlib

        h = hashlib.sha1()
        for name, g in self.groups.items():
            h.update(name.encode())
            h.update(np.ascontiguousarray(g.idx).tobytes())
            if getattr(g, "alpha", None) is not None:
                h.update(np.ascontiguousarray(g.alpha).tobytes())
        self.key = (
            tuple(
                (name, g.kind, g.idx.shape, g.psd_n, g.dim1, g.dim2)
                for name, g in self.groups.items()
            ),
            h.hexdigest(),
        )

    # convenience predicates ------------------------------------------------
    @property
    def has_nonsymmetric(self) -> bool:
        return not self.is_symmetric

    def type_counts(self) -> Dict[str, int]:
        """Cone census for the configuration printout
        (reference: src/info_print.jl)."""
        counts: Dict[str, int] = defaultdict(int)
        for c in self.cones:
            counts[type(c).__name__] += 1
        return dict(counts)


# ---------------------------------------------------------------------------
# static index helpers: slice instead of gather for contiguous groups
# ---------------------------------------------------------------------------

def _psd_buckets(psd_by_n, max_buckets: int = 4):
    """Partition the distinct PSD sides into <= max_buckets contiguous
    segments (bucket side = segment max) minimizing total padded
    O(side³) factorization work, by a standard 1-D clustering DP.
    Returns {bucket_side: [sizes in the bucket, ascending]}."""
    sizes = sorted(psd_by_n)
    counts = [len(psd_by_n[k]) for k in sizes]
    D = len(sizes)
    B = min(max_buckets, D)

    # seg_cost[i][j]: cost of sizes[i..j] padded to sizes[j]
    seg = [[0.0] * D for _ in range(D)]
    for i in range(D):
        for j in range(i, D):
            w = float(sizes[j]) ** 3
            seg[i][j] = w * sum(counts[i:j + 1])

    INF = float("inf")
    # dp[b][j]: min cost of covering sizes[0..j] with b segments
    dp = [[INF] * D for _ in range(B + 1)]
    back = [[-1] * D for _ in range(B + 1)]
    for j in range(D):
        dp[1][j] = seg[0][j]
    for b in range(2, B + 1):
        for j in range(b - 1, D):
            for i in range(b - 1, j + 1):
                c = dp[b - 1][i - 1] + seg[i][j]
                if c < dp[b][j]:
                    dp[b][j] = c
                    back[b][j] = i
    best_b = min(range(1, B + 1), key=lambda b: dp[b][D - 1])
    # walk back the segment boundaries
    bounds = []
    j, b = D - 1, best_b
    while b >= 1:
        i = 0 if b == 1 else back[b][j]
        bounds.append((i, j))
        j, b = i - 1, b - 1
    out = {}
    for i, j in reversed(bounds):
        out[sizes[j]] = sizes[i:j + 1]
    return out


def _contig_start(g: ConeGroup):
    """Trace-time check: group indices are one contiguous range (the
    common case — cones are laid out consecutively).  Contiguous groups
    use static slices instead of gathers: on TPU a vmapped gather carries
    broadcast index tensors through the loop (profiled at ~1 ms/copy),
    while a slice is free."""
    cached = getattr(g, "_contig_cache", "unset")
    if cached != "unset":
        return cached
    flat = np.asarray(g.idx).ravel()
    start = int(flat[0]) if flat.size else 0
    padded = g.true_dims is not None and bool(
        np.any(np.asarray(g.true_dims) != g.idx.shape[1])
    )
    val = (
        start
        if flat.size and not padded and np.array_equal(
            flat, np.arange(start, start + flat.size)
        )
        else None
    )
    g._contig_cache = val
    return val


def _gather(vec, g: ConeGroup):
    start = _contig_start(g)
    if start is not None:
        sl = jax.lax.slice_in_dim(vec, start, start + g.count * g.width,
                                  axis=0)
        return sl.reshape((g.count, g.width) + vec.shape[1:])
    # bucketed groups carry out-of-bounds pad indices: gather fills 0
    # (exact for SOC zero-padding), scatters drop them
    return vec.at[g.idx].get(mode="fill", fill_value=0.0)


def _scatter(out, g: ConeGroup, vals):
    start = _contig_start(g)
    if start is not None:
        flat = vals.reshape((g.count * g.width,) + vals.shape[2:])
        return jax.lax.dynamic_update_slice_in_dim(
            out, flat.astype(out.dtype), start, axis=0
        )
    # Non-contiguous group: XLA lowers an f64 TPU scatter to a
    # sequential per-row dynamic-update-slice loop (measured 227 us vs
    # 49 us for the equivalent select+gather at m=2600, docs/PERF.md
    # round 4).  Group rows are DISJOINT by construction and sentinel
    # (out-of-range) entries must drop, so the scatter is exactly an
    # inverse-permutation gather masked to the covered rows.
    M = out.shape[0]
    maps = getattr(g, "_scatter_maps", None)
    if maps is None or maps[1].shape[0] != M:
        idx = np.asarray(g.idx).ravel()
        valid = (idx >= 0) & (idx < M)
        pos = np.zeros(M, np.int32)
        cov = np.zeros(M, bool)
        pos[idx[valid]] = np.arange(idx.size, dtype=np.int32)[valid]
        cov[idx[valid]] = True
        maps = (pos, cov)
        g._scatter_maps = maps
    pos, cov = maps
    flat = vals.reshape((g.count * g.width,) + vals.shape[2:])
    covb = cov.reshape((M,) + (1,) * (vals.ndim - 2))
    return jnp.where(covb, flat[pos].astype(out.dtype), out)


def _row_range(g: ConeGroup):
    """Contiguous range of a flat (1, k) elementwise group, or None."""
    row = np.asarray(g.idx[0])
    start = int(row[0]) if row.size else 0
    if row.size and np.array_equal(row, np.arange(start, start + row.size)):
        return start, start + row.size
    return None


def _grow(vec, g: ConeGroup):
    """vec[g.idx[0]] as a slice when contiguous."""
    rng = _row_range(g)
    if rng is not None:
        return jax.lax.slice_in_dim(vec, rng[0], rng[1], axis=0)
    return vec[g.idx[0]]


def _srow_set(out, g: ConeGroup, vals):
    """out.at[g.idx[0]].set(vals) as a slice-update when contiguous."""
    rng = _row_range(g)
    if rng is not None:
        return jax.lax.dynamic_update_slice_in_dim(
            out, vals.astype(out.dtype), rng[0], axis=0
        )
    return out.at[g.idx[0]].set(vals)
