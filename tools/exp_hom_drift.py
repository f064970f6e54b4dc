'''
Headline-drift probe (VERDICT round-3 item 7): iteration count and
throughput of the production config at 2048^2 homogeneous across chunk
sizes and chunk-tolerance margins, to pin where the 48 -> 55 iteration
drift between rounds 2 and 3 came from.

Usage: EXP_TPU=1 python tools/exp_hom_drift.py [n] [nsrc]
'''

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

import jax
if os.environ.get('EXP_TPU', '0') != '1':
    jax.config.update('jax_platforms', 'cpu')
try:
    if jax.default_backend() in ('tpu', 'axon'):
        # TPU-only: /tmp cache can survive snapshot/restore onto a host
        # with different CPU features; XLA:CPU then loads foreign AOT
        # results (SIGILL risk). TPU executables are host-agnostic.
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('ZT_JAX_CACHE',
                                         '/tmp/zephyr_tpu_jaxcache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
except Exception:
    pass

import jax.numpy as jnp

from zephyr_tpu.core.realio import realio_jit
from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         make_chunked_solver,
                                         shifted_velocity)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nsrc = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cval = 1500.0
    freq = cval / 16.0
    cfg = SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2,
                       hybrid_comp='fused', mg_nu1=2, mg_nu2=1)

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        planes = minizephyr_planes(c, rho, freq)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap)[None, None]
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    c_real = cval * np.ones((n, n), dtype=np.float32)
    op = realio_jit(prep_fn)(jnp.asarray(c_real))

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 1, n, n), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0],
                    pos[:, 1]].set(1.0 + 0.0j)

    rng = np.random.default_rng(0)
    pos = rng.integers(n // 8, 7 * n // 8, size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)

    for chunk, margin in ((16, '0.7'), (16, '1.0'), (16, 'rel'),
                          (8, '0.7'), (24, '0.7'), (32, '0.7')):
        os.environ['ZT_CHUNK_TOL_MARGIN'] = margin
        solver = make_chunked_solver(cfg, chunk=chunk)
        _, iters, relres = solver(op, b)     # compile + converge
        t0 = time.time()
        _, iters, relres = solver(op, b)
        t = time.time() - t0
        print('chunk=%-3d margin=%-4s iters=%4d relres=%.2e  %.2f '
              'solves/s' % (chunk, margin, iters, relres, nsrc / t),
              flush=True)


if __name__ == '__main__':
    main()
