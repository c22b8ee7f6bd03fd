from .ldl import ldl_factor, ldl_solve
