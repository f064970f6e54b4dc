'''
Micro-benchmark of the fused PCR sweep kernel (ops/pallas_pcr.py) at
the production half-grid shape: wall per batched apply vs the modeled
HBM traffic, for tuning the small-shift level strategy
(ZT_PCR_ROLL_MAX: 0 = banded slices everywhere, 8 = rolls below the
f32 sublane granularity, large = rolls at every level).

Usage: EXP_TPU=1 ZT_PCR_ROLL_MAX=8 python tools/exp_pcr_kernel.py [nz nx R]
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

from zephyr_tpu.solver.stratified import pcr_precompute, _pcr_sweep_bf16_jnp
from zephyr_tpu.ops.pallas_pcr import pcr_sweep_pallas, pcr_pallas_applicable


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray((rng.standard_normal(s)
                                 + 1j * rng.standard_normal(s)
                                 ).astype(np.complex64))
    l, u = mk(nz, nx), mk(nz, nx)
    d = mk(nz, nx) + 4.0
    pcr = pcr_precompute(l, d, u, quantize=True)
    b = mk(R, nz, nx)
    assert pcr_pallas_applicable(pcr.alphas, pcr.dinv, b)

    ref = jax.vmap(lambda x: _pcr_sweep_bf16_jnp(
        pcr.alphas, pcr.gammas, pcr.dinv, x))(b)
    out = pcr_sweep_pallas(pcr.alphas, pcr.gammas, pcr.dinv, b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    print('parity rel=%.2e' % rel, flush=True)
    assert rel < 1e-5, rel

    nreps = 20
    out.block_until_ready()
    t0 = time.time()
    for _ in range(nreps):
        out = pcr_sweep_pallas(pcr.alphas, pcr.gammas, pcr.dinv, b)
    out.block_until_ready()
    dt = (time.time() - t0) / nreps
    nsteps = pcr.alphas.shape[0]
    traffic = (R * nz * nx * 8 * 2                 # field in + out (c64)
               + nsteps * 2 * 2 * nz * nx * 2      # bf16 a+g, re/im
               + 2 * nz * nx * 2)                  # bf16 dinv
    print('ZT_PCR_ROLL_MAX=%s (%d,%d)xR%d nsteps=%d: %.2f ms/apply, '
          'traffic %.1f MB -> %.1f GB/s'
          % (os.environ.get('ZT_PCR_ROLL_MAX', '8'), nz, nx, R, nsteps,
             dt * 1e3, traffic / 1e6, traffic / dt / 1e9), flush=True)


if __name__ == '__main__':
    main()
