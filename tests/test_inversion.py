'''
End-to-end FWI: recover a velocity anomaly by inversion, mirroring the
reference's notebooks/Test Inversion.ipynb workflow (SimPEG
ProjectedGradient over a box-anomaly transmission setup) as a hard
assertion instead of an eyeball test.
'''

import numpy as np
import pytest

from zephyr_tpu.backend import MiniZephyr
from zephyr_tpu.middleware import (Helm2DProblem, Helm2DSurvey,
                                   l2_DataMisfit, BaseInvProblem,
                                   BaseInversion, LBFGS,
                                   FrequencyContinuation)

NX, NZ = 40, 50
C0 = 2000.


def _setup(freqs):
    srcs = np.array([[5., z] for z in np.linspace(5., 45., 6)])
    recs = np.array([[35., z] for z in np.linspace(5., 45., 10)])
    sc = {
        'Disc':     MiniZephyr,
        'nx':       NX,
        'nz':       NZ,
        'dx':       1.,
        'dz':       1.,
        'c':        C0 * np.ones((NZ, NX)),
        'rho':      1.,
        'freqs':    freqs,
        'geom':     {'src': srcs, 'rec': recs, 'mode': 'fixed'},
        'nPML':     8,
        'solverOpts': {'tol': 1e-7, 'maxiter': 500},
    }
    return sc


def _true_model():
    c = C0 * np.ones((NZ, NX))
    c[20:30, 15:25] -= 150.0   # slow box anomaly
    return c


def _observed(sc, c_true):
    sc_true = dict(sc)
    sc_true['c'] = c_true
    problem = Helm2DProblem(sc_true)
    survey = Helm2DSurvey(sc_true)
    problem.pair(survey)
    return survey.dpred()


@pytest.mark.slow
def test_fwi_reduces_misfit():
    sc = _setup([60., 100.])
    dobs = _observed(sc, _true_model())

    problem = Helm2DProblem(sc)
    survey = Helm2DSurvey(sc)
    problem.pair(survey)

    dmisfit = l2_DataMisfit(survey, dobs)
    f0 = dmisfit.eval()
    assert f0 > 0

    opt = LBFGS(maxIter=6, lower=C0 - 400., upper=C0 + 400.,
                print_progress=False)
    invProb = BaseInvProblem(dmisfit, opt=opt)
    inversion = BaseInversion(invProb)

    m = inversion.run(C0 * np.ones(NZ * NX))
    f_final = opt.f

    assert f_final < 0.35 * f0, \
        'FWI only reduced misfit from %g to %g' % (f0, f_final)

    # the recovered anomaly must be negative (slow) inside the true box
    dm = m.reshape(NZ, NX) - C0
    inner = dm[21:29, 16:24].mean()
    outer = np.abs(dm[:10, :]).mean()
    assert inner < -5.0
    assert abs(inner) > 3 * outer


@pytest.mark.slow
def test_frequency_continuation_runs():
    sc = _setup([60., 100.])
    dobs = _observed(sc, _true_model()).reshape(10, 6, 2)

    driver = FrequencyContinuation(
        Helm2DProblem, Helm2DSurvey, sc, dobs,
        blocks=[[0], [1]],
        optFactory=lambda: LBFGS(maxIter=2, print_progress=False))
    m = driver.run(C0 * np.ones(NZ * NX))
    assert m.shape == (NZ * NX,)
    assert np.isfinite(m).all()
    assert len(driver.history) == 2
