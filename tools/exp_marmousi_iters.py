'''
Iteration-count experiments on the Marmousi-style medium (CPU, small
grids): find solver-config changes that cut heterogeneous-but-not-
layered iteration counts (VERDICT round-2 item 5).

Usage: python tools/exp_marmousi_iters.py [n] [variant ...]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from bench import _marmousi_c, _layered_c  # noqa: E402

WAVELEN = 16.0


def run(n, medium, cfg, nsrc=2, chunk=16, label=''):
    freq = 1500.0 / WAVELEN
    if medium == 'marmousi':
        c_np = _marmousi_c(n, np.float32)
    elif medium == 'layered':
        c_np = _layered_c(n, np.float32)
    else:
        c_np = 1500. * np.ones((n, n), np.float32)

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        planes = minizephyr_planes(c, rho, freq)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap)[None, None]
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 1, n, n), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0],
                    pos[:, 1]].set(1.0 + 0.0j)

    op = realio_jit(prep_fn)(jnp.asarray(c_np))
    rng = np.random.default_rng(0)
    pos = rng.integers(n // 8, 7 * n // 8, size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)
    solver = make_chunked_solver(cfg, chunk=chunk)
    t0 = time.time()
    _, iters, relres = solver(op, b)
    print('%-28s %-9s n=%d iters=%4d relres=%.2e wall=%.1fs'
          % (label, medium, n, iters, relres, time.time() - t0),
          flush=True)
    return iters


BASE = dict(tol=1e-5, maxiter=2000, mg_coarse='inv', mg_min_size=32,
            fft_mode='strat', fft_scale=2, hybrid_comp='fused',
            mg_nu1=2, mg_nu2=1)

VARIANTS = {
    'base': {},
    'mult': dict(hybrid_comp='mult'),
    'fftscale1': dict(fft_scale=1),
    'shift_hi': dict(fft_shift=0.5j),
    'shift_lo': dict(fft_shift=0.1j),
    'nu22': dict(mg_nu2=2),
    'nu33': dict(mg_nu1=3, mg_nu2=2),
    'mode2d': dict(fft_mode='2d'),
    'line': dict(mg_smoother='line'),
    'panels2': dict(strat_panels=2),
    'panels4': dict(strat_panels=4),
    'panels8': dict(strat_panels=8),
    'panels4_ov32': dict(strat_panels=4, strat_overlap=32),
    'panels4_mult': dict(strat_panels=4, hybrid_comp='mult'),
    'shift25': dict(fft_shift=0.25j),
    'panels4_shift25': dict(strat_panels=4, fft_shift=0.25j),
    'panels4_shift10': dict(strat_panels=4, fft_shift=0.10j),
    'panels8_shift25': dict(strat_panels=8, fft_shift=0.25j),
    'panels4_ov32_s25': dict(strat_panels=4, strat_overlap=32,
                             fft_shift=0.25j),
    'panels4_out': dict(strat_panels=4, strat_taper='out'),
    'panels4_in': dict(strat_panels=4, strat_taper='in'),
    'panels4_sym': dict(strat_panels=4, strat_taper='sym'),
    'panels4_dst': dict(strat_panels=4, strat_taper='dst'),
    'panels4_in_ov32': dict(strat_panels=4, strat_taper='in',
                            strat_overlap=32),
    'panels8_in': dict(strat_panels=8, strat_taper='in'),
    'panels8_dst': dict(strat_panels=8, strat_taper='dst'),
    'panels8_in_ov32': dict(strat_panels=8, strat_taper='in',
                            strat_overlap=32),
    'panels2_in_ov32': dict(strat_panels=2, strat_taper='in',
                            strat_overlap=32),
    'panels4_in_ov48': dict(strat_panels=4, strat_taper='in',
                            strat_overlap=48),
    'panels16_in_ov32': dict(strat_panels=16, strat_taper='in',
                             strat_overlap=32),
    'panels8_in_ov48': dict(strat_panels=8, strat_taper='in',
                            strat_overlap=48),
    'panels8_in_ov64': dict(strat_panels=8, strat_taper='in',
                            strat_overlap=64),
    'panels8_dst_ov32': dict(strat_panels=8, strat_taper='dst',
                             strat_overlap=32),
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = sys.argv[2:] or ['base']
    media = os.environ.get('EXP_MEDIA', 'marmousi').split(',')
    for name in names:
        cfg = SolverConfig(**dict(BASE, **VARIANTS[name]))
        for medium in media:
            run(n, medium, cfg, label=name)


if __name__ == '__main__':
    main()
