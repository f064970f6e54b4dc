'''
Iteration-count probe at the bench configuration on the current device:
one chunked solve per SolverConfig variant. Usage:
    python tools/iters_probe.py [N] [NSRC]
'''

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NSRC = int(sys.argv[2]) if len(sys.argv) > 2 else 16

cache_dir = os.environ.get('ZT_JAX_CACHE', '/tmp/zephyr_tpu_jaxcache')
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

from zephyr_tpu.core.realio import realio_jit
from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         make_chunked_solver,
                                         shifted_velocity)


def run(tag, cfg, medium='hom'):
    cval = 1500.0
    freq = cval / 16.0

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        planes = minizephyr_planes(c, rho, freq)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap)[None, None]
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    if medium == 'hom':
        c_real = cval * np.ones((N, N), dtype=np.float32)
    else:
        c_real = np.zeros((N, N), np.float32)
        for i, v in enumerate([1500., 2000., 2500., 3000.]):
            c_real[i * N // 4:(i + 1) * N // 4] = v
    op = realio_jit(prep_fn)(jnp.asarray(c_real))

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 1, N, N), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0],
                    pos[:, 1]].set(1.0 + 0.0j)

    rng = np.random.default_rng(0)
    pos = rng.integers(N // 8, 7 * N // 8, size=(NSRC, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)
    solver = make_chunked_solver(cfg, chunk=8)
    x, iters, relres = solver(op, b)    # includes compile
    t0 = time.time()
    x, iters, relres = solver(op, b)
    t = time.time() - t0
    print('%-34s %s iters %4d relres %.1e  %.2f solves/s'
          % (tag, medium, iters, relres, NSRC / t), flush=True)


def main():
    base = dict(tol=1e-5, maxiter=2000, mg_coarse='inv', mg_min_size=32,
                fft_mode='strat', fft_scale=2)
    run('prod (auto shift)', SolverConfig(**base))
    for s in (0.015j, 0.06j):
        run('fft_shift=%s' % s, SolverConfig(fft_shift=s, **base))
    run('fft_delta=3e-4', SolverConfig(fft_delta=3e-4, **base))
    run('fft_delta=3e-3', SolverConfig(fft_delta=3e-3, **base))
    run('pml_cap=2.0', SolverConfig(pml_cap=2.0, **base))
    run('shift=0.3j', SolverConfig(shift=0.3j, **base))
    run('prod (auto)', SolverConfig(**base), medium='lay')
    run('fft_shift=0.15j', SolverConfig(fft_shift=0.15j, **base),
        medium='lay')


if __name__ == '__main__':
    main()
