'''
Probe the MG coarse-level dense inverse quality on the current platform
for the Eurus TTI block hierarchy: computes || A @ inv(A) - I || for the
coarsest-level dense operator, plus the same for lu_factor/lu_solve —
isolates whether TPU-side jnp.linalg.inv (blocked LU at MXU default
precision) is the source of the layered-TTI divergence on TPU.

Usage: [EXP_TPU=1] python tools/exp_tti_coarse.py [n]
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

import jax
if os.environ.get('EXP_TPU', '0') != '1':
    jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

from zephyr_tpu.core.realio import realio_jit
from zephyr_tpu.ops.eurus_coeff import eurus_planes
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         shifted_velocity)
from bench import _layered_c


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    freq = 1500.0 / 16.0
    cfg = SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2,
                       gmres_restart=20, mg_nu1=1, mg_nu2=1)
    c_np = _layered_c(n, np.float32)

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        aniso = dict(theta=jnp.full((n, n), 0.3, jnp.float32),
                     eps=jnp.full((n, n), 0.2, jnp.float32),
                     delta=jnp.full((n, n), 0.1, jnp.float32))
        planes = eurus_planes(c, rho, freq, **aniso)
        pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho,
                               freq, pml_cap=cfg.pml_cap, **aniso)
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    op = realio_jit(prep_fn)(jnp.asarray(c_np))   # device C-pair tree
    # materialize the dense coarse operator and the stored inverse
    # through the realio boundary (host_output re/im pairs) — a direct
    # np.asarray of complex device arrays is a complex d->h transfer
    # the axon TPU runtime cannot perform
    from zephyr_tpu.ops.stencil import planes_to_dense_jax

    def coarse_parts(op_in):
        hier = op_in.hier
        return {'nlevels': len(hier.levels),
                'dense': planes_to_dense_jax(hier.levels[-1].planes),
                'cinv': hier.coarse_inv}

    parts = realio_jit(coarse_parts, host_output=True)(op)
    print('backend', jax.default_backend(), 'levels',
          int(parts['nlevels']), flush=True)
    dense = np.asarray(parts['dense'])
    N = dense.shape[0]
    print('coarse dense N =', N, 'cond estimate (svd on host, f64):',
          flush=True)
    sv = np.linalg.svd(dense.astype(np.complex128), compute_uv=False)
    print('  sigma_max %.3e sigma_min %.3e cond %.3e'
          % (sv[0], sv[-1], sv[0] / sv[-1]), flush=True)

    if parts['cinv'] is not None:
        cinv = np.asarray(parts['cinv'])
        resid = np.linalg.norm(
            dense.astype(np.complex128) @ cinv.astype(np.complex128)
            - np.eye(N)) / np.sqrt(N)
        print('stored coarse_inv: ||A Ainv - I||_F/sqrt(N) = %.3e'
              % resid, flush=True)
        print('  finite:', np.isfinite(cinv).all(),
              'max', np.abs(cinv).max(), flush=True)
    # host f64 reference inverse
    inv_host = np.linalg.inv(dense.astype(np.complex128))
    r_host = np.linalg.norm(dense.astype(np.complex128) @ inv_host
                            - np.eye(N)) / np.sqrt(N)
    print('host f64 inverse:  ||A Ainv - I||_F/sqrt(N) = %.3e' % r_host,
          flush=True)


if __name__ == '__main__':
    main()
