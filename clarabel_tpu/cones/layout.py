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
    idx: np.ndarray
    # matrix side-dimension for "psd" groups, else 0
    psd_n: int = 0
    # per-cone power parameters for "pow" groups: shape (count,)
    alpha: Optional[np.ndarray] = None
    # generalized power cone parameters: alpha (count, dim1), dim2
    dim1: int = 0
    dim2: int = 0

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

    def __init__(self, cones: Sequence[SupportedCone]):
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
        for dim in sorted(soc_by_dim):
            self.groups[f"soc{dim}"] = ConeGroup("soc", np.stack(soc_by_dim[dim]))
        for n in sorted(psd_by_n):
            self.groups[f"psd{n}"] = ConeGroup("psd", np.stack(psd_by_n[n]), psd_n=n)
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

        # structure key for jit caching
        self.key = tuple(
            (name, g.kind, g.idx.shape, g.psd_n, g.dim1, g.dim2)
            for name, g in self.groups.items()
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
