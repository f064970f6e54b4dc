'''
Eurus TTI forward modelling, mirroring the reference's
zephyr/backend/Tests/test_Eurus.py: clean execution with a stacked source,
and accuracy against the (stretched) analytical oracle at the reference's
3e-2 tolerance.
'''

import numpy as np
import pytest

from zephyr_tpu.backend import (Eurus, StackedSimpleSource,
                                AnalyticalHelmholtz)


def _elementNorm(arr):
    return np.sqrt((arr.conj() * arr).sum()).real / arr.size


def _config(epsval, deltaval):
    nx, nz = 100, 200
    return {
        'c':        2000. * np.ones((nz, nx)),
        'rho':      1. * np.ones((nz, nx)),
        'freq':     2e2,
        'nx':       nx,
        'nz':       nz,
        'dx':       1.,
        'dz':       1.,
        'theta':    0. * np.ones((nz, nx)),
        'eps':      epsval * np.ones((nz, nx)),
        'delta':    deltaval * np.ones((nz, nx)),
        'nPML':     10,
        'cPML':     1e3,
        'freeSurf': (False, False, False, False),
    }


@pytest.mark.slow
def test_cleanExecution():
    systemConfig = _config(0., 0.)
    Ainv = Eurus(systemConfig)
    src = StackedSimpleSource(systemConfig)
    sloc = np.array([50, 100]).reshape((1, 2))
    q = src(sloc)
    u = Ainv * q
    assert np.isfinite(u).all()


@pytest.mark.slow
def test_compareAnalytical_Isotropic():
    systemConfig = _config(0., 0.)
    sloc = np.array([25, 25]).reshape((1, 2))
    Ainv = Eurus(systemConfig)
    src = StackedSimpleSource(systemConfig)
    uE = (Ainv * src(sloc)).ravel()

    AH = AnalyticalHelmholtz(systemConfig)
    uAH = np.asarray(AH(sloc))

    nz, nx = 200, 100
    segA = uAH.reshape((nz, nx))[40:180, 40:80]
    segE = uE[:nx * nz].reshape((nz, nx))[40:180, 40:80]
    error = _elementNorm((segA - segE) / abs(segA))
    assert error < 3e-2


@pytest.mark.slow
def test_compareAnalytical_Elliptical():
    systemConfig = _config(0.2, 0.2)
    sloc = np.array([25, 25]).reshape((1, 2))
    Ainv = Eurus(systemConfig)
    src = StackedSimpleSource(systemConfig)
    uE = (Ainv * src(sloc)).ravel()

    AH = AnalyticalHelmholtz(systemConfig)
    uAH = np.asarray(AH(sloc))

    nz, nx = 200, 100
    segA = uAH.reshape((nz, nx))[40:180, 40:80]
    segE = uE[:nx * nz].reshape((nz, nx))[40:180, 40:80]
    error = _elementNorm((segA - segE) / abs(segA))
    assert error < 3e-2


@pytest.mark.slow
def test_layered_tti_converges_with_line_smoother():
    '''
    Heterogeneous TTI convergence pin: with damped block-Jacobi
    smoothing a layered 2:1-contrast TTI solve at 128^2 STALLS at
    ~1e-2 relres (the undamped error modes are PML-stretch-coupled);
    the alternating z/x line smoother (mg_smoother='auto' for B=2)
    must converge it. Regression guard for the line-smoother path.
    '''

    import jax.numpy as jnp
    from zephyr_tpu.ops.eurus_coeff import eurus_planes
    from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                             solve_info, shifted_velocity)

    n = 128
    freq = 1500.0 / 16.0
    rho = jnp.ones((n, n), jnp.float32)
    aniso = dict(theta=jnp.full((n, n), 0.3, jnp.float32),
                 eps=jnp.full((n, n), 0.2, jnp.float32),
                 delta=jnp.full((n, n), 0.1, jnp.float32))
    cl = np.zeros((n, n), np.float32)
    for i, v in enumerate([1500., 2000., 2500., 3000.]):
        cl[i * n // 4:(i + 1) * n // 4] = v
    c = jnp.asarray(cl).astype(jnp.complex64)

    cfg = SolverConfig(tol=1e-5, maxiter=280, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2,
                       hybrid_comp='fused', mg_nu1=1, mg_nu2=1,
                       gmres_restart=20, fft_shift=0.25j)
    planes = eurus_planes(c, rho, freq, **aniso)
    pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho, freq,
                           pml_cap=cfg.pml_cap, **aniso)
    op = prepare_operator(planes, pplanes, cfg, with_transpose=False)
    b = jnp.zeros((2, n, n), jnp.complex64).at[0, n // 2, n // 2].set(1.0)
    x, iters, relres = solve_info(op, b, cfg)
    # measured 200 iterations; 280 leaves headroom without masking a stall
    assert float(relres) < 1e-5
    assert np.isfinite(np.asarray(x)).all()
