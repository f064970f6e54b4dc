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
