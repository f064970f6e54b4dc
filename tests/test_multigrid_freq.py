'''
Per-frequency computation grids (MultiGridMultiFreq machinery): the
reference's grid-coarsening-by-targetGPW path, exercised end to end
through the middleware (the reference validated this only via the
MultiScale notebooks).
'''

import numpy as np
import pytest

from zephyr_tpu.backend import MiniZephyrHD, MultiGridHelper
from zephyr_tpu.middleware import (Helm2DViscoProblem, Helm2DSurvey,
                                   Helm2DViscoMultiGridProblem,
                                   Helm2DMultiGridSurvey)

NZ, NX = 64, 48


def _config(**kw):
    sc = {
        'Disc': MiniZephyrHD,
        'nx': NX, 'nz': NZ, 'dx': 1., 'dz': 1.,
        'c': 2000. * np.ones((NZ, NX)), 'rho': 1.,
        'freqs': [100., 150.],
        'cMin': 2000., 'targetGPW': 10.,
        'geom': {'src': np.array([[10., 10.]]),
                 'rec': np.array([[38., 20.], [38., 40.]]),
                 'mode': 'fixed'},
        'nPML': 6,
        'solverOpts': {'tol': 1e-7, 'maxiter': 400},
    }
    sc.update(kw)
    return sc


def test_multigrid_helper_scales():
    sc = _config()
    helper = MultiGridHelper(sc)
    # scale = median(cMin/(freq dx targetGPW), maxScale, minScale)
    assert np.isclose(helper.scales[0], 2.0)   # 2000/(100*10)
    assert np.isclose(helper.scales[1], 2000. / 1500.)
    ds = helper.downScalers[0]
    assert ds.snx == NX // 2 and ds.snz == NZ // 2
    up = helper.upScalers[0]
    assert up.shape == (NX * NZ, (NX // 2) * (NZ // 2))


@pytest.mark.slow
def test_multigrid_dpred_approximates_uniform():
    '''
    Coarse-grid data must approximate the full-resolution data up to the
    receiver-density convention: the Kaiser receiver vectors carry a
    1/(dx*dz) amplitude scale (reference source.py:229-231), so data
    extracted on a scale-s grid is 1/s^2 of the native-grid data — a
    convention the reference's MultiGrid surveys share (its multiscale
    workflows always compare data produced through the same machinery).
    After correcting the density factor, agreement is at the coarse
    discretization level (scale 2 = 10 points/wavelength here).
    '''

    sc = _config()
    p_mg = Helm2DViscoMultiGridProblem(sc)
    s_mg = Helm2DMultiGridSurvey(sc)
    p_mg.pair(s_mg)
    nrec, nsrc, nf = 2, 1, 2
    d_mg = s_mg.dpred().reshape(nrec, nsrc, nf)
    scales = s_mg.mgHelper.scales

    p_u = Helm2DViscoProblem(_config())
    s_u = Helm2DSurvey(_config())
    p_u.pair(s_u)
    d_u = s_u.dpred().reshape(nrec, nsrc, nf)

    assert np.isfinite(d_mg).all()
    for f, scale in enumerate(scales):
        corrected = d_mg[:, :, f] * scale ** 2
        rel = np.linalg.norm(corrected - d_u[:, :, f]) \
            / np.linalg.norm(d_u[:, :, f])
        assert rel < 0.35, 'freq %d deviates %.3f' % (f, rel)


def _paired_mg(**kw):
    sc = _config(**kw)
    p = Helm2DViscoMultiGridProblem(sc)
    s = Helm2DMultiGridSurvey(sc)
    p.pair(s)
    return p, s


def test_multigrid_jvec_jtvec_dot_product():
    '''
    Exact adjoint identity Re<w, J v> == <J^T w, v> for the MultiGrid
    problem: Jvec/Jtvec must route through the per-frequency scaled
    grids (the reference composes them through the survey pre/post
    processors, zephyr/middleware/problem.py:87-163 + survey.py:209-330;
    here the chain rule runs through the differentiable resampler).
    '''

    p, s = _paired_mg(solverOpts={'tol': 1e-8, 'maxiter': 400})
    rng = np.random.default_rng(7)
    v = rng.standard_normal(NZ * NX)
    w = rng.standard_normal(s.nD) + 1j * rng.standard_normal(s.nD)

    Jv = p.Jvec(v=v)
    assert Jv.shape == (s.nD,)
    assert np.isfinite(Jv).all() and np.abs(Jv).max() > 0
    Jtw = p.Jtvec(v=w)
    assert Jtw.shape == (NZ * NX,)

    lhs = np.real(np.vdot(w, Jv))
    rhs = float(np.dot(Jtw, v))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-5


@pytest.mark.slow
def test_multigrid_misfit_gradient_finite_difference():
    'FD check of the fine-grid gradient through the scaled-grid solves.'

    p, s = _paired_mg(solverOpts={'tol': 1e-9, 'maxiter': 600})
    dobs = s.dpred()
    c0 = p.baseVelocity.ravel() + 15.0

    f0, g = p.misfit_and_gradient(c0.reshape(NZ, NX), dobs)
    assert f0 > 0 and np.isfinite(g).all()

    rng = np.random.default_rng(3)
    dm = rng.standard_normal(c0.size)
    dm /= np.linalg.norm(dm)
    eps = 0.5
    f_plus, _ = p.misfit_and_gradient((c0 + eps * dm).reshape(NZ, NX),
                                      dobs)
    f_minus, _ = p.misfit_and_gradient((c0 - eps * dm).reshape(NZ, NX),
                                       dobs)
    fd = (f_plus - f_minus) / (2 * eps)
    pred = float(np.dot(g, dm))
    assert abs(fd - pred) / abs(fd) < 1e-3


def test_dpred_fn_rebuilds_on_survey_change():
    '''
    The cached forward closure captures survey vectors at build time;
    re-pairing with different geometry must invalidate it (staleness
    hazard fixed in round 3).
    '''

    p, s = _paired_mg()
    fn1 = p._dpred_fn()
    assert p._dpred_fn() is fn1           # stable while survey unchanged

    sc2 = _config(geom={'src': np.array([[12., 14.]]),
                        'rec': np.array([[30., 20.], [30., 40.],
                                         [30., 30.]]),
                        'mode': 'fixed'})
    s2 = Helm2DMultiGridSurvey(sc2)
    p.pair(s2)
    fn2 = p._dpred_fn()
    assert fn2 is not fn1


@pytest.mark.slow
def test_multigrid_fields_upscaled():
    'fields() must return wavefields on the NATIVE grid (upscaled).'
    sc = _config()
    p_mg = Helm2DViscoMultiGridProblem(sc)
    s_mg = Helm2DMultiGridSurvey(sc)
    p_mg.pair(s_mg)
    u = p_mg.fields()
    assert u.shape == (NZ * NX, 1, 2)
    assert np.isfinite(u[:, 'u', 0]).all()
    assert np.abs(u[:, 'u', 0]).max() > 0
