'''
zephyr_tpu solver: hybrid spectral + multigrid CSLP-preconditioned Krylov
Helmholtz solves with implicit differentiation.
'''

from .helmholtz import (SolverConfig, HelmholtzOperator, prepare_operator,
                        shifted_velocity, solve, solve_batched,
                        solve_batched_jit, solve_info, make_chunked_solver)
from .krylov import bicgstab, bicgstab_batched, gmres, gmres_cycle
from .multigrid import build_hierarchy, transpose_hierarchy, v_cycle
