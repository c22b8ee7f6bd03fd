"""Exponential / power / generalized power cone operations.

Implemented incrementally; see coneops_{expcone,powcone,genpowcone}.jl and
coneops_nonsymmetric_common.jl in the reference.
"""


def _nyi(*a, **k):
    raise NotImplementedError("nonsymmetric cone support is not implemented yet")


identity_scaling = _nyi
unit_initialization = _nyi
update_scaling = _nyi
hs_dense_scatter = _nyi
mul_Hs = _nyi
combined_ds_shift = _nyi
step_length = _nyi
compute_barrier = _nyi
