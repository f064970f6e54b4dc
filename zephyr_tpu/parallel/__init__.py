'''
zephyr_tpu parallel: device-mesh sharding of the modelling/inversion axes.
'''

from .mesh import make_mesh, freq_src_sharding, replicated
from .multifreq import (viscous_velocity, build_multifreq_ops,
                        multifreq_solve, multifreq_dpred,
                        multifreq_dpred_25d, multifreq_dpred_chunked,
                        fwi_misfit,
                        make_sharded_fwi_step)
from .spatial import (halo_exchange_x, apply_stencil_sharded,
                      make_sharded_apply, make_dd_solver)
