'''
Iteration-count experiments on the Eurus TTI block system (layered and
homogeneous media): find solver-config changes that cut the
restart-limited layered-TTI tail (VERDICT round-3 item 4: target <= 300
iterations at 256^2, tol 1e-5).

Usage: EXP_MEDIA=layered python tools/exp_tti_iters.py [n] [variant ...]
Set EXP_TPU=1 to run on the default (TPU) platform.
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
from zephyr_tpu.ops.eurus_coeff import eurus_planes
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         make_chunked_solver,
                                         shifted_velocity)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from bench import _layered_c  # noqa: E402

WAVELEN = 16.0


def run(n, medium, cfg, nsrc=2, chunk=None, label='', iso=False):
    'iso=True zeroes the Thomsen parameters (isotropic block system).'
    freq = 1500.0 / WAVELEN
    if medium == 'layered':
        c_np = _layered_c(n, np.float32)
    else:
        c_np = 1500. * np.ones((n, n), np.float32)
    if chunk is None:
        chunk = cfg.gmres_restart

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        a = 0.0 if iso else 1.0
        aniso = dict(theta=jnp.full((n, n), a * 0.3, jnp.float32),
                     eps=jnp.full((n, n), a * 0.2, jnp.float32),
                     delta=jnp.full((n, n), a * 0.1, jnp.float32))
        planes = eurus_planes(c, rho, freq, **aniso)
        pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho, freq,
                               pml_cap=cfg.pml_cap, **aniso)
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 2, n, n), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0],
                    pos[:, 1]].set(1.0 + 0.0j)

    op = realio_jit(prep_fn)(jnp.asarray(c_np))
    rng = np.random.default_rng(0)
    pos = rng.integers(n // 8, 7 * n // 8, size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)
    solver = make_chunked_solver(cfg, chunk=chunk)
    _, iters, relres = solver(op, b)       # compile + converge
    t0 = time.time()
    _, iters, relres = solver(op, b)       # steady-state timing
    print('%-28s %-9s n=%d iters=%4d relres=%.2e wall=%.1fs'
          % (label, medium, n, iters, relres, time.time() - t0),
          flush=True)
    return iters


BASE = dict(tol=1e-5, maxiter=2000, mg_coarse='inv', mg_min_size=32,
            fft_mode='strat', fft_scale=2, gmres_restart=20,
            mg_nu1=1, mg_nu2=1)

VARIANTS = {
    'base': {},
    'restart40': dict(gmres_restart=40),
    'restart60': dict(gmres_restart=60),
    'fgmres2': dict(krylov='fgmres', fgmres_inner=2),
    'fgmres4': dict(krylov='fgmres', fgmres_inner=4),
    'fgmres8': dict(krylov='fgmres', fgmres_inner=8),
    'fgmres4_r10': dict(krylov='fgmres', fgmres_inner=4,
                        gmres_restart=10),
    'fgmres8_r10': dict(krylov='fgmres', fgmres_inner=8,
                        gmres_restart=10),
    'nu22': dict(mg_nu1=2, mg_nu2=2),
    'shift_lo': dict(fft_shift=0.15j),
    'shift_hi': dict(fft_shift=0.4j),
    'shiftbeta_lo': dict(shift=0.3j),
    'fgmres4_nu22': dict(krylov='fgmres', fgmres_inner=4,
                         mg_nu1=2, mg_nu2=2),
    'shift_lo2': dict(fft_shift=0.1j),
    'fgmres4_slo': dict(krylov='fgmres', fgmres_inner=4,
                        fft_shift=0.15j, gmres_restart=10),
    'fgmres8_slo': dict(krylov='fgmres', fgmres_inner=8,
                        fft_shift=0.15j, gmres_restart=10),
    'bicg': dict(krylov='bicgstab'),
    'bicg_slo': dict(krylov='bicgstab', fft_shift=0.15j),
    # --- TPU-divergence bisection variants (round 4): layered TTI
    # diverges on TPU at 128^2 where CPU converges; these isolate the
    # coarse dense inverse, the stratified block interior solve, and
    # the 2d spectral path respectively ---
    'coarse_lu': dict(mg_coarse='lu'),
    'mg_only': dict(precond='mg'),
    'fft2d': dict(fft_mode='2d'),
    'short': dict(maxiter=40),
    # isotropic medium routed through the block op: the physics flag is
    # carried explicitly ('_iso': popped before SolverConfig), not
    # inferred from the display label
    'iso': {'_iso': True},
    'jacobi': dict(mg_smoother='jacobi'),
    'mgjac': dict(precond='mg', mg_smoother='jacobi'),
    'min64': dict(mg_min_size=64),
    'min64jac': dict(mg_min_size=64, mg_smoother='jacobi'),
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    names = sys.argv[2:] or ['base']
    media = os.environ.get('EXP_MEDIA', 'layered').split(',')
    for name in names:
        opts = dict(BASE, **VARIANTS[name])
        iso = opts.pop('_iso', False)
        cfg = SolverConfig(**opts)
        for medium in media:
            run(n, medium, cfg, label=name, iso=iso)


if __name__ == '__main__':
    main()
