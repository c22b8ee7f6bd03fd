"""PSD triangle cone operations (batched over same-size cone groups).

Implemented incrementally; see coneops_psdtrianglecone.jl in the reference.
"""

from typing import Dict, Tuple


def _nyi(*a, **k):
    raise NotImplementedError("PSD cone support is not implemented yet")


identity_scaling = _nyi
unit_initialization = _nyi
margins = _nyi
scaled_unit_shift = _nyi
update_scaling = _nyi
hs_dense_scatter = _nyi
mul_Hs = _nyi
affine_ds = _nyi
combined_ds_shift = _nyi
ds_from_dz_offset = _nyi
step_length = _nyi
compute_barrier = _nyi
