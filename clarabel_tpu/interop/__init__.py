"""Interop adapters onto external modeling tools (the analogue of the
reference's L7 interop layer, reference: src/MOI_wrapper/).

Optional dependencies are gated at import time: `cvxpy_interface`
provides a CVXPY conic solver when cvxpy is installed.
"""
