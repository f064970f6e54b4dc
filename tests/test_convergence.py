'''
Spatial convergence order of the MiniZephyr stencil, mirroring the
reference's notebooks/Confirm Operator Order - MiniZephyr.ipynb (error vs
dx on a log-log slope against dx^2) as a hard assertion, plus the
chunked/restarted solver's single-precision refinement behaviour.
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zephyr_tpu.backend import (MiniZephyr, SparseKaiserSource,
                                AnalyticalHelmholtz)


def _oracle_error(dx, base_n=60, freq=120., cval=2400.):
    '''
    Solve on a grid with spacing dx over a fixed physical domain and
    return the interior-window element-norm error vs the oracle.
    '''

    scale = 1.0 / dx
    nx = int(round(base_n * scale)) + 1
    nz = int(round(2 * base_n * scale)) + 1
    sc = {
        'c': cval, 'rho': 1., 'nx': nx, 'nz': nz,
        'dx': dx, 'dz': dx, 'freq': freq,
        'nPML': int(round(10 * scale)),
        'solverOpts': {'tol': 1e-9, 'maxiter': 900},
    }
    xs = zs = 15.0   # physical coordinates
    sloc = np.array([[xs, zs]])
    # Kaiser source scales 1/(dx*dz), keeping physical source strength
    # constant across grid refinements (reference source.py:229-231)
    u = (MiniZephyr(sc) * SparseKaiserSource(sc)(sloc)).ravel().reshape(nz, nx)
    uA = np.asarray(AnalyticalHelmholtz(sc)(sloc)).reshape(nz, nx)

    # fixed physical interior window
    i0, i1 = int(round(25 * scale)), int(round(105 * scale))
    j0, j1 = int(round(25 * scale)), int(round(50 * scale))
    seg_u, seg_a = u[i0:i1, j0:j1], uA[i0:i1, j0:j1]
    err = (seg_a - seg_u) / np.abs(seg_a)
    return np.sqrt((err.conj() * err).sum()).real / err.size


@pytest.mark.slow
def test_operator_order_is_second():
    'Halving dx must reduce the oracle error by ~4x (2nd-order stencil).'

    dxs = np.array([1.0, 0.5])
    errs = np.array([_oracle_error(dx) for dx in dxs])
    order = np.log(errs[0] / errs[1]) / np.log(dxs[0] / dxs[1])
    assert order > 1.6, 'observed order %.2f (errors: %s)' % (order, errs)


@pytest.mark.slow
def test_chunked_solver_refines_f32():
    'Restarted chunks must push f32 solves past the recursion drift.'
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.solver.helmholtz import (SolverConfig,
                                             prepare_operator,
                                             make_chunked_solver,
                                             shifted_velocity)

    n = 128
    freq = 1500. / 16.
    cfg = SolverConfig(tol=1e-6, maxiter=512, mg_coarse='iterative',
                       mg_min_size=32)
    c = (1500. * jnp.ones((n, n))).astype(jnp.complex64)
    rho = jnp.ones((n, n), jnp.float32)
    planes = minizephyr_planes(c, rho, freq)[None, None]
    pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho, freq,
                                pml_cap=cfg.pml_cap)[None, None]
    op = prepare_operator(planes, pplanes, cfg, with_transpose=False)

    q = np.zeros((2, 1, n, n), dtype=np.complex64)
    q[0, 0, n // 2, n // 2] = 1.0
    q[1, 0, n // 4, n // 4] = 1.0

    solver = make_chunked_solver(cfg, chunk=32)
    x, chunks, relres = solver(op, jnp.asarray(q))
    assert relres < 2e-6  # f32 true-residual floor
    assert np.isfinite(np.asarray(x)).all()
