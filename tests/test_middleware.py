'''
Middleware layer: problem/survey pairing, dpred, exact Jvec/Jtvec
(adjoint dot test + finite differences), fields container, maps.

The reference has NO automated middleware tests (its
zephyr/middleware/Tests/ is empty; validation was notebook-only —
SURVEY.md section 4). These tests convert the reference's eyeball
notebooks (Test Gradient Computation, Test Jacobian) into hard
assertions, as the survey prescribes.
'''

import numpy as np
import pytest

from zephyr_tpu.middleware import (Helm2DProblem, Helm2DSurvey,
                                   Helm2DViscoProblem, HelmFields,
                                   TensorMesh2D, NodalIdentityMap,
                                   l2_DataMisfit)
from zephyr_tpu.backend import MiniZephyr

NX, NZ = 50, 60
FREQS = [80., 120.]


def _config(**kw):
    sc = {
        'Disc':     MiniZephyr,
        'nx':       NX,
        'nz':       NZ,
        'dx':       1.,
        'dz':       1.,
        'c':        2000. * np.ones((NZ, NX)),
        'rho':      1.,
        'freqs':    FREQS,
        'geom': {
            'src':  np.array([[10., 10.], [25., 10.]]),
            'rec':  np.array([[10., 40.], [25., 40.], [40., 40.]]),
            'mode': 'fixed',
        },
        'nPML':     8,
        'solverOpts': {'tol': 1e-8, 'maxiter': 600},
    }
    sc.update(kw)
    return sc


def _paired(cls=Helm2DProblem, **kw):
    sc = _config(**kw)
    problem = cls(sc)
    survey = Helm2DSurvey(sc)
    problem.pair(survey)
    return problem, survey


@pytest.mark.slow
def test_dpred_shape_and_finite():
    problem, survey = _paired()
    d = survey.dpred()
    assert d.shape == (survey.nrec * survey.nsrc * survey.nfreq,)
    assert np.iscomplexobj(d)
    assert np.isfinite(d).all()
    assert np.abs(d).max() > 0


@pytest.mark.slow
def test_fields_container():
    problem, survey = _paired()
    u = problem.fields()
    assert u.shape == (NZ * NX, 2, 2)
    panel = u[survey.srcList[0], 'u', :]
    assert panel.shape == (NZ * NX, 2)
    d = survey.projectFields(u)
    assert d.shape == (survey.nrec, survey.nsrc, survey.nfreq)
    # projected fields match the lazy path
    d_lazy = survey.dpred().reshape(d.shape)
    assert np.allclose(d, d_lazy, rtol=1e-10)


@pytest.mark.slow
def test_jvec_jtvec_dot_product():
    'Exact adjoint identity: Re<w, J v> == <J^T w, v>.'
    problem, survey = _paired()
    rng = np.random.default_rng(5)
    v = rng.standard_normal(NZ * NX)
    w = rng.standard_normal(survey.nD) + 1j * rng.standard_normal(survey.nD)

    Jv = problem.Jvec(v=v)
    Jtw = problem.Jtvec(v=w)

    lhs = np.real(np.vdot(w, Jv))
    rhs = float(np.dot(Jtw, v))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-5


@pytest.mark.slow
def test_jvec_matches_finite_difference():
    problem, survey = _paired()
    c0 = problem.baseVelocity.ravel().copy()
    rng = np.random.default_rng(11)
    dm = rng.standard_normal(c0.size)
    dm /= np.linalg.norm(dm)

    Jv = problem.Jvec(v=dm)

    # eps is sized so the FD signal clears the iterative-solver noise
    # floor (tol 1e-8); relative model perturbation is still ~5e-4.
    eps = 1.0
    problem.updateModel((c0 + eps * dm).reshape(NZ, NX))
    d_plus = survey.dpred()
    problem.updateModel((c0 - eps * dm).reshape(NZ, NX))
    d_minus = survey.dpred()
    fd = (d_plus - d_minus) / (2 * eps)

    rel = np.linalg.norm(Jv - fd) / np.linalg.norm(fd)
    # Smoke-level threshold: FD truncation + iterative-solve noise in
    # d_pred(c +/- eps dm); Jvec exactness itself is pinned by
    # test_jvec_jtvec_dot_product. A wrong Jvec would be O(1) off.
    assert rel < 5e-3


@pytest.mark.slow
def test_misfit_gradient_finite_difference():
    problem, survey = _paired()
    dobs = survey.dpred()
    # perturb the model away from the observed-data model
    c0 = problem.baseVelocity.ravel() + 20.0

    f0, g = problem.misfit_and_gradient(c0.reshape(NZ, NX), dobs)
    assert f0 > 0

    rng = np.random.default_rng(2)
    dm = rng.standard_normal(c0.size)
    dm /= np.linalg.norm(dm)
    eps = 0.5   # clears the iterative-solver noise floor
    f_plus, _ = problem.misfit_and_gradient(
        (c0 + eps * dm).reshape(NZ, NX), dobs)
    f_minus, _ = problem.misfit_and_gradient(
        (c0 - eps * dm).reshape(NZ, NX), dobs)
    fd = (f_plus - f_minus) / (2 * eps)
    pred = float(np.dot(g, dm))
    assert abs(fd - pred) / abs(fd) < 1e-3


def test_fields_alias_machinery():
    '''
    Alias fields (reference fields.py:50-117): a declared alias reads as
    func(stored panels) per frequency with Fortran-order deflation, and
    is read-only.
    '''

    class Mesh:
        nN = 6

    class Survey:
        nSrc = 2
        nfreq = 3
        srcList = ['s0', 's1']

    class AliasedFields(HelmFields):
        aliasFields = {'phi': ('u', 'N', '_phi')}

        def _phi(self, u, srcs, ifreq):
            return (int(ifreq) + 1.0) * u

    f = AliasedFields(Mesh(), Survey())
    rng = np.random.default_rng(0)
    data = rng.standard_normal((6, 2, 3)) \
        + 1j * rng.standard_normal((6, 2, 3))
    f[:, 'u', :] = data
    assert np.allclose(f[:, 'u', :], data)

    # single-frequency alias read
    assert np.allclose(f[:, 'phi', 1], 2.0 * data[:, :, 1])
    # multi-frequency alias read: per-freq func + concat
    phi = f[:, 'phi', :]
    expected = np.stack([(i + 1.0) * data[:, :, i] for i in range(3)],
                        axis=2)
    assert phi.shape == (6, 2, 3)
    assert np.allclose(phi, expected)
    # alias with a source-instance key
    phi0 = f['s1', 'phi', 0]
    assert np.allclose(phi0.ravel(), data[:, 1, 0])

    # aliases are read-only; scalar sets work on stored fields
    with pytest.raises(KeyError):
        f[:, 'phi', 0] = 0.
    f[0, 'u', 0] = 3.0
    assert f[:, 'u', 0][0, 0] == 3.0
    assert 'phi' in f and 'u' in f


def test_precision_aware_tolerance_shared():
    '''
    The precision-aware default tolerance (complex64 -> 1e-5) is applied
    by ONE helper used by both the backend (discretization.solverConfig)
    and the middleware (problem.solverConfig) — round 2 fixed only the
    backend path; an unconfigured complex64 middleware Jvec would chase
    tol=1e-7 below f32 resolution for maxiter iterations.
    '''

    import jax
    from zephyr_tpu.solver.helmholtz import resolve_solver_config
    from zephyr_tpu.backend.minizephyr import MiniZephyr as MZ

    problem, _ = _paired(solverOpts={})
    disc = MZ({'nx': 8, 'nz': 8, 'c': 2000., 'freq': 100.})

    # x64 on (test default): full double-precision target everywhere
    assert resolve_solver_config({}).tol == 1e-7
    assert problem.solverConfig.tol == 1e-7
    assert disc.solverConfig.tol == 1e-7

    try:
        jax.config.update('jax_enable_x64', False)
        assert resolve_solver_config({}).tol == 1e-5
        assert problem.solverConfig.tol == 1e-5
        assert disc.solverConfig.tol == 1e-5
        # an explicit user tol always wins
        assert resolve_solver_config({'tol': 1e-8}).tol == 1e-8
    finally:
        jax.config.update('jax_enable_x64', True)


@pytest.mark.slow
def test_visco_dispersion_changes_data():
    p1, s1 = _paired(Helm2DViscoProblem)
    d_novisc = s1.dpred()
    p2, s2 = _paired(Helm2DViscoProblem, Q=20., freqBase=50.)
    d_visc = s2.dpred()
    assert not np.allclose(d_novisc, d_visc)


@pytest.mark.slow
def test_relative_mode_geometry():
    sc = _config()
    sc['geom'] = {
        'src':  np.array([[10., 10.], [25., 10.]]),
        'rec':  np.array([[0., 20.], [5., 20.]]),   # offsets
        'mode': 'relative',
    }
    problem = Helm2DProblem(sc)
    survey = Helm2DSurvey(sc)
    problem.pair(survey)
    d = survey.dpred()
    assert d.shape == (2 * 2 * 2,)
    assert np.isfinite(d).all()


def test_nodal_identity_map():
    mesh = TensorMesh2D(NX, NZ)
    m = NodalIdentityMap(mesh)
    vec = np.ones(mesh.nN)
    out = m * vec
    assert out.shape == (mesh.nC,)
    assert np.allclose(out, 1.0)


@pytest.mark.slow
def test_datamisfit_zero_at_truth():
    problem, survey = _paired()
    dobs = survey.dpred()
    dm = l2_DataMisfit(survey, dobs)
    assert dm.eval() < 1e-20


@pytest.mark.slow
def test_25d_problem_dot_test():
    'Helm25DProblem: exact adjoint identity through the ky summation.'
    from zephyr_tpu.middleware import Helm25DProblem, Helm25DSurvey
    from zephyr_tpu.backend import MiniZephyr25D

    sc = _config()
    # reference idiom: distributor chain via remDists; Disc = leaf solver
    sc['remDists'] = [MiniZephyr25D]
    sc['nky'] = 3
    sc['parallel'] = False
    sc['cmin'] = 2000.
    problem = Helm25DProblem(sc)
    survey = Helm25DSurvey(sc)
    problem.pair(survey)

    rng = np.random.default_rng(9)
    v = rng.standard_normal(NZ * NX)
    w = rng.standard_normal(survey.nD) + 1j * rng.standard_normal(survey.nD)
    Jv = problem.Jvec(v=v)
    Jtw = problem.Jtvec(v=w)
    lhs = np.real(np.vdot(w, Jv))
    rhs = float(np.dot(Jtw, v))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-5


def test_25d_scan_path_matches_vmap():
    '''
    Above the scan threshold the ky summation runs as a lax.scan with
    one prepared operator live at a time (memory-bounded at production
    nky); both paths must produce the same wavefield.
    '''

    import jax.numpy as jnp
    from zephyr_tpu.middleware import Helm25DProblem, Helm25DSurvey
    from zephyr_tpu.backend import MiniZephyr25D

    sc = _config(nx=28, nz=32, c=2000.,
                 solverOpts={'tol': 1e-9, 'maxiter': 300})
    sc['remDists'] = [MiniZephyr25D]
    sc['nky'] = 3
    sc['parallel'] = False
    sc['cmin'] = 2000.
    problem = Helm25DProblem(sc)
    survey = Helm25DSurvey(sc)
    problem.pair(survey)

    nz, nx = 32, 28
    ci = jnp.asarray(problem.baseVelocity + 0j)
    rho = jnp.ones((nz, nx))
    qf = np.zeros((nz * nx, 1), np.complex128)
    qf[16 * nx + 10] = 1.0
    cfg = problem.solverConfig
    kw = problem._planeKwargs()

    u_vmap = np.asarray(problem._solve_25d(
        ci, rho, 80., jnp.asarray(qf), cfg, kw, scan_threshold=8))
    u_scan = np.asarray(problem._solve_25d(
        ci, rho, 80., jnp.asarray(qf), cfg, kw, scan_threshold=1))
    assert np.isfinite(u_scan).all()
    rel = np.linalg.norm(u_scan - u_vmap) / np.linalg.norm(u_vmap)
    assert rel < 1e-8, rel


@pytest.mark.slow
def test_eurus_problem_dot_test():
    'Eurus-based problem: exact adjoint identity for the TTI operator.'
    from zephyr_tpu.backend import EurusHD

    sc = _config()
    sc['Disc'] = EurusHD
    sc['theta'] = 0.05 * np.ones((NZ, NX))
    sc['eps'] = 0.1 * np.ones((NZ, NX))
    sc['delta'] = 0.05 * np.ones((NZ, NX))
    sc['cPML'] = 1e3
    problem = Helm2DProblem(sc)
    survey = Helm2DSurvey(sc)
    problem.pair(survey)

    rng = np.random.default_rng(10)
    v = rng.standard_normal(NZ * NX)
    w = rng.standard_normal(survey.nD) + 1j * rng.standard_normal(survey.nD)
    Jv = problem.Jvec(v=v)
    Jtw = problem.Jtvec(v=w)
    lhs = np.real(np.vdot(w, Jv))
    rhs = float(np.dot(Jtw, v))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-5


@pytest.mark.slow
def test_nested_distributor_chain():
    '''
    remDists chaining (reference distributors.py:38-53): the outer
    (frequency) distributor pops the next distributor off the chain, so
    each frequency subproblem is itself a ky-summing MiniZephyr25D —
    the reference's multi-frequency 2.5D composition.
    '''
    from zephyr_tpu.backend import MultiFreq, MiniZephyr25D, MiniZephyr
    import numpy as np

    sc = {
        'Disc': MiniZephyr, 'nx': 30, 'nz': 24,
        'c': 2000. * np.ones((24, 30)), 'rho': 1.,
        'freqs': [60., 90.],
        'remDists': [MiniZephyr25D],
        'nky': 2, 'parallel': False, 'cmin': 2000.,
        'solverOpts': {'tol': 1e-6, 'maxiter': 300},
    }
    outer = MultiFreq(sc)
    subs = outer.subProblems
    assert all(isinstance(s, MiniZephyr25D) for s in subs)
    # inner wrappers carry the leaf discretization
    assert all(s.Disc is MiniZephyr for s in subs)
    q = np.zeros((24 * 30, 1), dtype=np.complex128)
    q[12 * 30 + 15] = 1.0
    fields = outer * q
    assert len(fields) == 2          # one ky-summed wavefield per freq
    for u in fields:
        u = np.asarray(u)
        assert u.shape == (24 * 30, 1)
        assert np.isfinite(u).all() and np.abs(u).max() > 0
