'''
MiniZephyr forward modelling, mirroring the reference's
zephyr/backend/Tests/test_MiniZephyr.py: clean execution, 2.5D execution,
and accuracy against the analytical Green's function oracle at the
reference's tolerances (element-norm < 1e-2 on the interior window).
'''

import numpy as np
import pytest

from zephyr_tpu.backend import (MiniZephyr, MiniZephyr25D, SimpleSource,
                                AnalyticalHelmholtz)


def _elementNorm(arr):
    return np.sqrt((arr.conj() * arr).sum()).real / arr.size


def test_cleanExecution():

    systemConfig = {
        'c':        2500.,
        'rho':      1.,
        'nx':       100,
        'nz':       200,
        'freq':     2e2,
    }

    sloc = np.array([50, 100]).reshape((1, 2))
    Ainv = MiniZephyr(systemConfig)
    src = SimpleSource(systemConfig)
    q = src(sloc)
    u = Ainv * q
    assert u.shape == (200 * 100, 1)
    assert np.isfinite(u).all()


def test_compareAnalytical():

    systemConfig = {
        'c':        2500.,
        'rho':      1.,
        'nx':       100,
        'nz':       200,
        'freq':     2e2,
    }

    sloc = np.array([25, 25]).reshape((1, 2))
    Ainv = MiniZephyr(systemConfig)
    src = SimpleSource(systemConfig)
    q = src(sloc)
    uMZ = (Ainv * q).ravel()

    AH = AnalyticalHelmholtz(systemConfig)
    uAH = np.asarray(AH(sloc))

    uMZr = uMZ.reshape((200, 100))
    uAHr = uAH.reshape((200, 100))

    segAHr = uAHr[40:180, 40:80]
    segMZr = uMZr[40:180, 40:80]

    error = _elementNorm((segAHr - segMZr) / abs(segAHr))
    assert error < 1e-2


@pytest.mark.slow
def test_cleanExecution25D():

    systemConfig = {
        'c':        2500.,
        'rho':      1.,
        'nx':       100,
        'nz':       200,
        'freq':     2e2,
        'nky':      4,
        'parallel': False,
    }

    sloc = np.array([50, 100]).reshape((1, 2))
    Ainv = MiniZephyr25D(systemConfig)
    src = SimpleSource(systemConfig)
    q = src(sloc)
    u = Ainv * q
    assert u.shape == (200 * 100, 1)
    assert np.isfinite(u).all()


@pytest.mark.slow
def test_compareAnalytical25D():

    systemConfig = {
        'c':        2500.,
        'rho':      1.,
        'nx':       100,
        'nz':       200,
        'freq':     2e2,
        'nky':      20,
        '3D':       True,
    }

    sloc = np.array([25, 25]).reshape((1, 2))
    Ainv = MiniZephyr25D(systemConfig)
    src = SimpleSource(systemConfig)
    q = src(sloc)
    uMZ = (Ainv * q).ravel()

    AH = AnalyticalHelmholtz(systemConfig)
    uAH = np.asarray(AH(sloc))

    uMZr = uMZ.reshape((200, 100))
    uAHr = uAH.reshape((200, 100))

    segAHr = uAHr[40:180, 40:80]
    segMZr = uMZr[40:180, 40:80]

    error = _elementNorm((segAHr - segMZr) / abs(segAHr))
    assert error < 1e-2
