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
from zephyr_tpu.ops.pallas_pcr import (pcr_sweep_pallas,
                                       pcr_pallas_applicable,
                                       pcr_sweep_pallas_rb,
                                       pcr_rb_applicable)


@jax.jit
def _relerr(a, b):
    d = a - b
    return jnp.sqrt(jnp.real(jnp.vdot(d, d))
                    / jnp.maximum(jnp.real(jnp.vdot(b, b)), 1e-30))


@jax.jit
def _probe(x):
    return jnp.sum(jnp.abs(jnp.real(x).ravel()[:8]))


def _sync(x):
    # axon block_until_ready does not fence remoted computations; a
    # real-scalar fetch does (device ops execute in order). Jitted:
    # eager op-by-op chains on complex arrays hit UNIMPLEMENTED paths
    # on this runtime.
    return float(np.asarray(_probe(x)))


def main():
    nz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rng = np.random.default_rng(0)

    def mk(*s):
        # complex built ON device from real uploads (the axon runtime
        # cannot transfer complex arrays — core/realio.py)
        return jax.jit(jax.lax.complex)(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)),
            jnp.asarray(rng.standard_normal(s).astype(np.float32)))
    l, u = mk(nz, nx), mk(nz, nx)
    # every step of the setup runs under jit: eager op-by-op chains on
    # complex arrays fail with UNIMPLEMENTED on the axon runtime
    d = jax.jit(lambda x: x + 4.0)(mk(nz, nx))
    pcr = jax.jit(lambda l, d, u: pcr_precompute(l, d, u,
                                                 quantize=True))(l, d, u)
    b = mk(R, nz, nx)
    assert pcr_pallas_applicable(pcr.alphas, pcr.dinv, b)

    ref = jax.jit(jax.vmap(lambda x: _pcr_sweep_bf16_jnp(
        pcr.alphas, pcr.gammas, pcr.dinv, x)))(b)

    nsteps = pcr.alphas.shape[0]
    traffic = (R * nz * nx * 8 * 2                 # field in + out (c64)
               + nsteps * 2 * 2 * nz * nx * 2      # bf16 a+g, re/im
               + 2 * nz * nx * 2)                  # bf16 dinv

    variants = [('grid', pcr_sweep_pallas)]
    if pcr_rb_applicable(pcr.alphas, pcr.dinv, b):
        variants.append(('rb', pcr_sweep_pallas_rb))

    nreps = 20
    for name, fn in variants:
        out = fn(pcr.alphas, pcr.gammas, pcr.dinv, b)
        rel = float(np.asarray(_relerr(out, ref)))
        print('%s parity rel=%.2e' % (name, rel), flush=True)
        assert rel < 1e-5, (name, rel)
        _sync(out)
        t0 = time.time()
        for _ in range(nreps):
            out = fn(pcr.alphas, pcr.gammas, pcr.dinv, b)
        _sync(out)
        dt = (time.time() - t0) / nreps
        print('%-5s ZT_PCR_ROLL_MAX=%s (%d,%d)xR%d nsteps=%d: '
              '%.2f ms/apply, traffic %.1f MB -> %.1f GB/s'
              % (name, os.environ.get('ZT_PCR_ROLL_MAX', '8'), nz, nx,
                 R, nsteps, dt * 1e3, traffic / 1e6,
                 traffic / dt / 1e9), flush=True)


if __name__ == '__main__':
    main()
