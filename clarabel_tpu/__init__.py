"""clarabel_tpu — a TPU-native interior-point conic solver.

A from-scratch JAX/XLA/Pallas implementation of a homogeneous-embedding
interior-point method for convex conic programs

    min  (1/2) x'Px + q'x   s.t.  Ax + s = b,  s in K

with K a Cartesian product of zero, nonnegative, second-order, PSD-triangle,
exponential, power, and generalized power cones.

Feature-parity blueprint: oxfordcontrol/Clarabel.jl (see SURVEY.md).  The
design is TPU-first: every per-iteration operation is a fixed-shape, jitted
tensor program; problems can be vmapped in batches of thousands; large
structured KKT systems shard over a device mesh.

The solver requires 64-bit floats for its default 1e-8 tolerances, so this
package enables jax x64 mode on import (f32 paths remain available through
Settings).
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# TPU matmuls default to reduced internal precision (bf16 passes); a
# 1e-8-tolerance solver needs true f32 accumulation in its f32 phases.
_jax.config.update("jax_default_matmul_precision", "highest")

from .settings import Settings
from .statuscodes import SolverStatus
from .cones.api import (
    ZeroConeT,
    NonnegativeConeT,
    SecondOrderConeT,
    ExponentialConeT,
    PowerConeT,
    GenPowerConeT,
    PSDTriangleConeT,
)
from .api import Solver, DefaultSolution, DefaultInfo
from . import modeling
from . import precompile
from .parallel.batch_impl import BatchSolver
from .io.json_io import save_to_file, load_from_file

__version__ = "0.1.0"


def version() -> str:
    """reference: src/version.jl:1-16"""
    return __version__

# mirrors Clarabel.jl's module-level get/set infinity
# (reference: src/Clarabel.jl:14-20)
_INFINITY_DEFAULT = 1e20
_infinity = _INFINITY_DEFAULT


def get_infinity() -> float:
    return _infinity


def set_infinity(v: float) -> None:
    global _infinity
    _infinity = float(v)


def default_infinity() -> None:
    set_infinity(_INFINITY_DEFAULT)
