'''
Micro-benchmark of restrict/prolong implementations on the current
device: the production separable formulation vs a conv-based single
pass (lax.conv_general_dilated with stride / input dilation).

Usage: python tools/bench_transfers.py [N] [R] [REPS]
'''

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20

cache_dir = os.environ.get('ZT_JAX_CACHE', '/tmp/zephyr_tpu_jaxcache')
try:
    if jax.default_backend() in ('tpu', 'axon'):
        # TPU-only: /tmp cache can survive snapshot/restore onto a host
        # with different CPU features; XLA:CPU then loads foreign AOT
        # results (SIGILL risk). TPU executables are host-agnostic.
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
except Exception:
    pass

from zephyr_tpu.core.realio import realio_jit
from zephyr_tpu.solver.multigrid import restrict, prolong

TENT = np.array([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]],
                np.float32) * 0.25


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jnp.real(jnp.sum(leaves[0]))))


def timeit(name, fn, *args):
    _fetch(fn(*args))
    t0 = time.time()
    _fetch(fn(*args))
    print('%-30s %8.2f ms' % (name, 1e3 * (time.time() - t0) / REPS),
          flush=True)


def loop(fn):
    def run(x):
        def body(_, x):
            return fn(x)
        return lax.fori_loop(0, REPS, body, x)
    return run


def restrict_conv(v):
    'Single-pass restriction: 3x3 tent conv with stride 2, zero padding.'
    lead = v.shape[:-2]
    nz, nx = v.shape[-2:]
    x = v.reshape((-1, 1) + v.shape[-2:])
    k = jnp.asarray(TENT).astype(v.dtype)[None, None]
    out = lax.conv_general_dilated(x, k, window_strides=(2, 2),
                                   padding=((1, 1), (1, 1)),
                                   precision=lax.Precision.HIGHEST)
    return out.reshape(lead + out.shape[-2:])


def prolong_conv(vc, nz, nx):
    'Single-pass prolongation: transposed conv (input dilation 2).'
    lead = vc.shape[:-2]
    x = vc.reshape((-1, 1) + vc.shape[-2:])
    k = (4.0 * jnp.asarray(TENT)).astype(vc.dtype)[None, None]
    out = lax.conv_general_dilated(x, k, window_strides=(1, 1),
                                   padding=((1, 2), (1, 2)),
                                   lhs_dilation=(2, 2),
                                   precision=lax.Precision.HIGHEST)
    return out.reshape(lead + out.shape[-2:])[..., :nz, :nx]


def main():
    rng = np.random.default_rng(0)
    u = rng.standard_normal((R, N, N)).astype(np.float32)
    uj = jax.device_put(u)

    # correctness first (real planes; complex handled as pairs)
    a = np.asarray(restrict(uj))
    b = np.asarray(restrict_conv(uj))
    print('restrict conv vs separable maxdiff: %.2e'
          % np.abs(a - b).max())
    nzc = a.shape[-2]
    vc = jax.device_put(
        rng.standard_normal((R, nzc, nzc)).astype(np.float32))
    p1 = np.asarray(prolong(vc, N, N))
    p2 = np.asarray(prolong_conv(vc, N, N))
    print('prolong conv vs separable maxdiff: %.2e'
          % np.abs(p1 - p2).max())

    timeit('restrict separable', realio_jit(
        lambda u: loop(lambda x: restrict(x) .sum() * 0 + x)(u)), uj)
    timeit('restrict+prolong separable', realio_jit(
        lambda u: loop(lambda x: x + prolong(restrict(x), N, N))(u)), uj)
    timeit('restrict+prolong conv', realio_jit(
        lambda u: loop(lambda x: x + prolong_conv(restrict_conv(x), N,
                                                  N))(u)), uj)


if __name__ == '__main__':
    main()
