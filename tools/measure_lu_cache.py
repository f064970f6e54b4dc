'''
Measure the single-core SciPy SuperLU baseline ONCE and persist it to
LU_CACHE.json at the repo root. bench.py loads this cache instead of
re-measuring (the factorization is deterministic per grid; round-4
postmortem: the in-run LU measurement + extrapolation overhead ran
BEFORE any extras row and ate driver budget every round).

Measures at 512^2 and 1024^2 so the large-grid extrapolation rests on
two points: the factor-time exponent p in t(N) = a N^p is fitted from
the pair instead of assumed 1.5 (VERDICT r4 weak #7).

Usage: python tools/measure_lu_cache.py [grids...]
'''

import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

CACHE_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'LU_CACHE.json')


def measure_lu(lu_n, nsrc=16):
    '''
    One SuperLU factor + batched-solve measurement of the bench physics
    (reference solver path: problemo.BestSolver -> scipy splu,
    /root/reference/zephyr/backend/discretization.py:79-85) at lu_n^2.
    '''

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.ops.stencil import OFFSETS

    cval = 1500.0
    freq = cval / 16.0
    planes = np.asarray(minizephyr_planes(
        (cval * jnp.ones((lu_n, lu_n))).astype(jnp.complex64),
        jnp.ones((lu_n, lu_n), jnp.float32), freq))

    nz = nx = lu_n
    N0 = nz * nx
    I, J = np.mgrid[0:nz, 0:nx]
    rows = (I * nx + J).ravel()
    rr, cc, vv = [], [], []
    for k, (dz, dx) in enumerate(OFFSETS):
        In, Jn = I + dz, J + dx
        valid = ((In >= 0) & (In < nz) & (Jn >= 0) & (Jn < nx)).ravel()
        cols = (np.clip(In, 0, nz - 1) * nx
                + np.clip(Jn, 0, nx - 1)).ravel()
        rr.append(rows[valid])
        cc.append(cols[valid])
        vv.append(planes[k].ravel()[valid])
    A = sp.coo_matrix((np.concatenate(vv),
                       (np.concatenate(rr), np.concatenate(cc))),
                      shape=(N0, N0)).tocsc()

    t0 = time.time()
    lu = spla.splu(A)
    t_factor = time.time() - t0

    b = np.zeros((N0, nsrc), dtype=np.complex64)
    for i in range(nsrc):
        b[(lu_n // 2) * lu_n + lu_n // 2 + i, i] = 1.0
    t0 = time.time()
    lu.solve(b)
    t_solve = (time.time() - t0) / nsrc
    return t_factor, t_solve


def main():
    grids = [int(a) for a in sys.argv[1:]] or [512, 1024]
    cache = {}
    if os.path.exists(CACHE_PATH):
        with open(CACHE_PATH) as f:
            cache = json.load(f)
    entries = cache.setdefault('grids', {})
    for g in grids:
        print('measuring %d^2 ...' % g, flush=True)
        tf, ts = measure_lu(g)
        entries[str(g)] = {'t_factor': tf, 't_solve': ts}
        print('  factor %.3f s  solve %.4f s/rhs' % (tf, ts), flush=True)
    cache['host'] = platform.node()
    cache['cpu'] = platform.processor() or platform.machine()
    # fitted factor exponent from the smallest/largest measured pair:
    # t = a N^p with N = grid^2
    gs = sorted(int(k) for k in entries)
    if len(gs) >= 2:
        g0, g1 = gs[0], gs[-1]
        r = entries[str(g1)]['t_factor'] / entries[str(g0)]['t_factor']
        p = np.log(r) / np.log((g1 / g0) ** 2)
        cache['factor_exponent'] = float(p)
        rs = entries[str(g1)]['t_solve'] / entries[str(g0)]['t_solve']
        ps = np.log(rs) / np.log((g1 / g0) ** 2)
        cache['solve_exponent'] = float(ps)
        print('fitted factor exponent p = %.3f (model: 1.5), '
              'solve exponent = %.3f (model: ~1+log)' % (p, ps))
    with open(CACHE_PATH, 'w') as f:
        json.dump(cache, f, indent=1)
    print('wrote', CACHE_PATH)


if __name__ == '__main__':
    main()
