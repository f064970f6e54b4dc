'''
Iteration-count experiment: two-level deflation on heterogeneous media.
CPU (x64). Usage: python tools/defl_experiment.py [N] [FREQ_CELLS]
'''

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp

from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         shifted_velocity, solve_info)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
WLC = float(sys.argv[2]) if len(sys.argv) > 2 else 16.0


def layered_c(n):
    c = np.zeros((n, n))
    vals = [1500., 2000., 2500., 3000.]
    for i, v in enumerate(vals):
        c[i * n // 4:(i + 1) * n // 4] = v
    return c


def run(tag, c, cfg):
    cj = jnp.asarray(c, jnp.complex128)
    rho = jnp.ones((N, N))
    freq = 1500.0 / WLC
    planes = minizephyr_planes(cj, rho, freq)[None, None]
    pplanes = minizephyr_planes(shifted_velocity(cj, cfg.shift), rho, freq,
                                pml_cap=cfg.pml_cap)[None, None]
    op = prepare_operator(planes, pplanes, cfg, with_transpose=False)
    q = np.zeros((1, N, N), np.complex128)
    q[0, N // 3, N // 3] = 1.0
    t0 = time.time()
    x, iters, relres = solve_info(op, jnp.asarray(q), cfg)
    x = np.asarray(x)
    dt = time.time() - t0
    print('%-28s iters=%4d relres=%.2e  (%.1f s)'
          % (tag, int(iters), float(relres), dt), flush=True)
    return np.asarray(x)


def main():
    base = dict(tol=1e-5, maxiter=2000, mg_coarse='iterative',
                mg_min_size=32)
    c = layered_c(N)
    x0 = run('layered hybrid', c, SolverConfig(**base))
    for k in (4, 8, 12):
        xd = run('layered +deflate k=%d' % k,
                 c, SolverConfig(deflate=True, defl_sweeps=k, **base))
        rel = np.linalg.norm(xd - x0) / np.linalg.norm(x0)
        print('   solution rel.diff vs non-deflated: %.2e' % rel)

    ch = 1500. * np.ones((N, N))
    run('homog hybrid', ch, SolverConfig(**base))
    run('homog +deflate k=8', ch,
        SolverConfig(deflate=True, defl_sweeps=8, **base))


if __name__ == '__main__':
    main()
