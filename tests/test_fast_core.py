'''
Fast core-contract coverage for the default (< 5 min) CI profile.

Each test here is a small-grid variant of a contract whose full-size
version lives in the slow suite (run with ``pytest -m ""``): LU parity,
transpose/adjoint exactness, Eurus block solve, middleware derivative
dot tests, chunked-vs-differentiable equality, sharded-vs-single-device
gradients.
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
from zephyr_tpu.ops.stencil import planes_to_dense, block_planes_to_dense
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         solve, solve_info,
                                         shifted_velocity)

NZ, NX, FREQ, CVAL = 48, 40, 150., 2500.
CFG = SolverConfig(tol=1e-9, maxiter=400)


def _mz_operator(cfg=CFG, with_transpose=False, c=None):
    if c is None:
        c = CVAL * jnp.ones((NZ, NX), dtype=jnp.complex128)
    rho = jnp.ones((NZ, NX))
    planes = minizephyr_planes(c, rho, FREQ)[None, None]
    pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho, FREQ,
                                pml_cap=cfg.pml_cap)[None, None]
    return prepare_operator(planes, pplanes, cfg,
                            with_transpose=with_transpose)


def _delta(z, x):
    q = np.zeros((1, NZ, NX), dtype=np.complex128)
    q[0, z, x] = 1.0
    return q


def test_matches_lu_small():
    'Iterative solve == dense LU at small size (full-size version: slow).'
    op = _mz_operator()
    q = _delta(20, 20)
    x = np.asarray(solve(op, jnp.asarray(q), CFG)).ravel()
    A = planes_to_dense(np.asarray(op.planes[0, 0]))
    x_lu = np.linalg.solve(A, q.ravel())
    assert np.linalg.norm(x - x_lu) / np.linalg.norm(x_lu) < 1e-6


def test_layered_matches_lu_small():
    'Heterogeneous (2:1 discontinuity) convergence with the inv coarse.'
    cfg = CFG._replace(mg_coarse='inv', tol=1e-8)
    c = np.full((NZ, NX), 1500.)
    c[NZ // 2:] = 3000.
    op = _mz_operator(cfg, c=jnp.asarray(c, jnp.complex128))
    q = _delta(16, 28)
    x, iters, relres = solve_info(op, jnp.asarray(q), cfg)
    A = planes_to_dense(np.asarray(op.planes[0, 0]))
    x_lu = np.linalg.solve(A, q.ravel())
    rel = np.linalg.norm(np.asarray(x).ravel() - x_lu) / np.linalg.norm(x_lu)
    assert rel < 1e-5
    assert int(iters) < 200


def test_transpose_vjp_small():
    'VJP of the solve is the transpose solve (full-size version: slow).'
    op = _mz_operator(with_transpose=True)
    qj = jnp.asarray(_delta(30, 25))
    f = lambda b: solve(op, b, CFG)
    x, vjp = jax.vjp(f, qj)
    g = _delta(20, 20) * (1.0 + 0.5j)
    (gb,) = vjp(jnp.asarray(g))
    A = planes_to_dense(np.asarray(op.planes[0, 0]))
    x_direct = np.linalg.solve(A.T, g.ravel())
    assert np.linalg.norm(np.asarray(gb).ravel() - x_direct) \
        / np.linalg.norm(x_direct) < 1e-6


def test_eurus_block_matches_lu_small():
    'TTI 2x2 block system solve == dense LU at small size.'
    from zephyr_tpu.ops.eurus_coeff import eurus_planes
    cfg = SolverConfig(tol=1e-9, maxiter=600)
    c = CVAL * jnp.ones((NZ, NX), dtype=jnp.complex128)
    rho = jnp.ones((NZ, NX))
    aniso = dict(theta=0.2 * jnp.ones((NZ, NX)),
                 eps=0.1 * jnp.ones((NZ, NX)),
                 delta=0.05 * jnp.ones((NZ, NX)))
    planes = eurus_planes(c, rho, FREQ, **aniso)
    pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho, FREQ,
                           pml_cap=cfg.pml_cap, **aniso)
    op = prepare_operator(planes, pplanes, cfg, with_transpose=False)
    q = np.zeros((2, NZ, NX), dtype=np.complex128)
    q[0, 20, 24] = 1.0
    x = np.asarray(solve(op, jnp.asarray(q), cfg)).ravel()
    A = block_planes_to_dense(np.asarray(op.planes))
    x_lu = np.linalg.solve(A, q.ravel())
    assert np.linalg.norm(x - x_lu) / np.linalg.norm(x_lu) < 1e-5


def test_middleware_dot_test_small():
    '<Jv, w> == <v, Jtw> through the middleware problem (small grid).'
    from zephyr_tpu.middleware import Helm2DProblem, Helm2DSurvey

    nz, nx = 40, 32
    sc = {
        'nx': nx, 'nz': nz, 'c': 2000. * np.ones((nz, nx)), 'rho': 1.,
        'freqs': [90.],
        'geom': {'src': np.array([[8., 10.]]),
                 'rec': np.array([[24., 8.], [24., 20.]]),
                 'mode': 'fixed'},
        'solverOpts': {'tol': 1e-9, 'maxiter': 400},
    }
    problem = Helm2DProblem(sc)
    survey = Helm2DSurvey(sc)
    problem.pair(survey)
    m = sc['c'].ravel()
    rng = np.random.default_rng(0)
    v = rng.standard_normal(m.size)
    w = rng.standard_normal(survey.nD) + 1j * rng.standard_normal(survey.nD)
    Jv = problem.Jvec(m, v)
    Jtw = problem.Jtvec(m, w)
    # the adjoint identity in the middleware's convention (matches
    # test_middleware.test_jvec_jtvec_dot_product): Re<w, Jv> == <Jtw, v>
    lhs = np.real(np.vdot(w, Jv))
    rhs = float(np.dot(Jtw, v))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-5


@pytest.mark.slow
def test_chunked_matches_differentiable_small():
    from zephyr_tpu.parallel.multifreq import (multifreq_dpred,
                                               multifreq_dpred_chunked)
    nz, nx = 48, 48
    cfg = SolverConfig(tol=1e-8, maxiter=200)
    freqs = np.array([90.])
    q = np.zeros((1, 2, nz, nx), np.complex128)
    q[:, 0, 14, 14] = 1.0
    q[:, 1, 30, 22] = 1.0
    R = np.zeros((2, nz * nx), np.complex128)
    R[0, 20 * nx + 8] = 1.0
    R[1, 26 * nx + 40] = 1.0
    c = 2000. * np.ones((nz, nx))
    d1 = np.asarray(multifreq_dpred(
        jnp.asarray(c), jnp.ones((nz, nx)), jnp.asarray(freqs),
        jnp.asarray(q), jnp.asarray(R), config=cfg))
    d2 = multifreq_dpred_chunked(c, np.ones((nz, nx)), freqs, q, R,
                                 config=cfg, chunk=16)
    assert np.linalg.norm(d1 - d2) / np.linalg.norm(d1) < 1e-5


def test_stratified_precond_layered_small():
    '''
    fft_mode='strat' (per-row interior tridiagonal solve, PCR): exact
    solution parity with dense LU on a layered medium, and fewer
    iterations than the constant-symbol hybrid (512^2 measurement:
    231 -> 39; here we assert parity + a sane count).
    '''
    cfg = CFG._replace(fft_mode='strat', mg_coarse='inv', tol=1e-8,
                       fft_scale=2)
    c = np.full((NZ, NX), 1500.)
    c[NZ // 3:] = 2200.
    c[2 * NZ // 3:] = 3000.
    op = _mz_operator(cfg, c=jnp.asarray(c, jnp.complex128),
                      with_transpose=True)
    assert op.strat is not None and op.fft_sinv is None
    q = _delta(14, 22)
    x, iters, relres = solve_info(op, jnp.asarray(q), cfg)
    A = planes_to_dense(np.asarray(op.planes[0, 0]))
    x_lu = np.linalg.solve(A, q.ravel())
    rel = np.linalg.norm(np.asarray(x).ravel() - x_lu) / np.linalg.norm(x_lu)
    assert rel < 1e-5
    assert int(iters) < 150

    # transpose solve through VJP stays exact with the stratified P^T
    qj = jnp.asarray(q)
    f = lambda b: solve(op, b, cfg)
    _, vjp = jax.vjp(f, qj)
    g = _delta(20, 12) * (1.0 - 0.3j)
    (gb,) = vjp(jnp.asarray(g))
    x_t = np.linalg.solve(A.T, g.ravel())
    assert np.linalg.norm(np.asarray(gb).ravel() - x_t) \
        / np.linalg.norm(x_t) < 1e-5


@pytest.mark.slow
def test_chunked_fwi_gradient_matches_autodiff_small():
    'Explicit adjoint-state chunked gradient == monolithic jax.grad.'
    from zephyr_tpu.parallel.multifreq import (multifreq_dpred,
                                               fwi_misfit_grad_chunked)
    nz, nx = 40, 36
    cfg = SolverConfig(tol=1e-9, maxiter=300)
    freqs = np.array([90.])
    q = np.zeros((1, 2, nz, nx), np.complex128)
    q[:, 0, 10, 10] = 1.0
    q[:, 1, 26, 20] = 1.0
    R = np.zeros((2, nz * nx), np.complex128)
    R[0, 16 * nx + 6] = 1.0
    R[1, 22 * nx + 30] = 1.0
    c = 2000. * np.ones((nz, nx))
    c_true = c.copy()
    c_true[16:26, 14:26] -= 150.
    rho = np.ones((nz, nx))
    dobs = np.asarray(multifreq_dpred(
        jnp.asarray(c_true), jnp.asarray(rho), jnp.asarray(freqs),
        jnp.asarray(q), jnp.asarray(R), config=cfg, nPML=8))

    def objective(cm):
        d = multifreq_dpred(cm, jnp.asarray(rho), jnp.asarray(freqs),
                            jnp.asarray(q), jnp.asarray(R), config=cfg,
                            nPML=8)
        return 0.5 * jnp.sum(jnp.abs(d - jnp.asarray(dobs)) ** 2)

    m0 = float(objective(jnp.asarray(c)))
    g0 = np.asarray(jax.grad(objective)(jnp.asarray(c)))
    m1, g1 = fwi_misfit_grad_chunked(c, rho, freqs, q, R, dobs,
                                     config=cfg, chunk=1, nPML=8)
    assert abs(m0 - m1) / m0 < 1e-6
    assert np.linalg.norm(g1 - g0) / np.linalg.norm(g0) < 1e-6


@pytest.mark.slow
def test_chunked_fwi_gradient_stamps_matches_dense():
    '''
    The positions/stamps path at target_gpw large (no actual coarsening:
    every frequency keeps the fine grid) must agree with the dense
    q/R-matrix path built from the SAME Kaiser stamps — pins the
    gather/scatter receiver algebra against the einsum reference.
    '''
    from zephyr_tpu.parallel.multifreq import (fwi_misfit_grad_chunked,
                                               _kaiser_stamps,
                                               freq_grid_plan)
    nz, nx = 48, 40
    cfg = SolverConfig(tol=1e-10, maxiter=400)
    freqs = np.array([220.])
    src_pos = np.array([[10.0, 12.0], [30.0, 18.0]])   # (x, z)
    rec_pos = np.array([[32.0, 30.0], [8.0, 36.0], [20.0, 40.0]])
    c = 2000. * np.ones((nz, nx))
    c[20:30, 12:24] -= 150.
    rho = np.ones((nz, nx))
    dobs = np.zeros((1, 2, 3), np.complex128)

    # huge target_gpw => scale formula gives < 1: clamped to fine grid
    assert freq_grid_plan(nz, nx, freqs, 2000., target_gpw=1e6) \
        == [(nz, nx)]

    m_st, g_st = fwi_misfit_grad_chunked(
        c, rho, freqs, None, None, dobs, config=cfg, chunk=2,
        target_gpw=1e6, src_pos=src_pos, rec_pos=rec_pos, cmin=2000.,
        nPML=8)

    scols, svals = _kaiser_stamps((nz, nx), 1.0, 1.0, src_pos, 4)
    rcols, rvals = _kaiser_stamps((nz, nx), 1.0, 1.0, rec_pos, 4,
                                  receiver=True)
    q = np.zeros((1, 2, nz, nx), np.complex128)
    qf = q.reshape(1, 2, nz * nx)
    np.add.at(qf[0], (np.arange(2)[:, None], np.asarray(scols)),
              np.asarray(svals))
    R = np.zeros((3, nz * nx), np.complex128)
    np.add.at(R, (np.arange(3)[:, None], np.asarray(rcols)),
              np.asarray(rvals))
    m_d, g_d = fwi_misfit_grad_chunked(c, rho, freqs, q, R, dobs,
                                       config=cfg, chunk=2, nPML=8)
    assert abs(m_st - m_d) / abs(m_d) < 1e-8
    assert np.linalg.norm(g_st - g_d) / np.linalg.norm(g_d) < 1e-8


@pytest.mark.slow
def test_chunked_fwi_gradient_grid_adapted_fd():
    '''
    Per-frequency targetGPW grid adaptation (the reference's
    MultiGridMultiFreq semantics): the low frequency solves on a coarser
    grid, and the returned gradient is the exact FINE-grid gradient of
    the multi-scale misfit (finite-difference identity).
    '''
    from zephyr_tpu.parallel.multifreq import (fwi_misfit_grad_chunked,
                                               freq_grid_plan)
    nz = nx = 64
    cfg = SolverConfig(tol=1e-11, maxiter=600)
    freqs = np.array([150., 320.])
    plans = freq_grid_plan(nz, nx, freqs, 2000., target_gpw=8.,
                           quantum=16, min_size=32)
    assert plans[0][0] < nz and plans[1] == (nz, nx)

    src_pos = np.array([[12.0, 12.0], [40.0, 14.0]])
    rec_pos = np.array([[48.0, 22.0], [16.0, 44.0], [50.0, 48.0]])
    c = 2000. * np.ones((nz, nx))
    c[24:40, 20:44] -= 120.
    rho = np.ones((nz, nx))
    dobs = np.zeros((2, 2, 3), np.complex128)

    kw = dict(config=cfg, chunk=2, target_gpw=8., src_pos=src_pos,
              rec_pos=rec_pos, cmin=2000., grid_quantum=16, grid_min=32,
              nPML=8)
    m0, g = fwi_misfit_grad_chunked(c, rho, freqs, None, None, dobs, **kw)
    assert np.isfinite(m0) and np.isfinite(g).all()

    rng = np.random.default_rng(3)
    dc = rng.standard_normal((nz, nx))
    # smooth the direction so the cubic-resample VJP is well-resolved
    k = np.ones((5, 5)) / 25.
    from scipy.signal import convolve2d
    dc = convolve2d(dc, k, mode='same')
    eps = 0.05
    m_p, _ = fwi_misfit_grad_chunked(c + eps * dc, rho, freqs, None,
                                     None, dobs, **kw)
    m_m, _ = fwi_misfit_grad_chunked(c - eps * dc, rho, freqs, None,
                                     None, dobs, **kw)
    fd = (m_p - m_m) / (2 * eps)
    an = float(np.sum(g * dc))
    assert abs(fd - an) / abs(an) < 2e-4, (fd, an)


@pytest.mark.slow
def test_chunked_fwi_gradient_panels_fd():
    '''
    The chunked adjoint-state gradient with the x-PANELLED stratified
    preconditioner engaged on BOTH the forward and the transposed
    operator (the production marmousi-gradient path — the auto rule
    resolves panels for laterally heterogeneous media): finite-
    difference identity against the explicit panel config.
    '''
    from zephyr_tpu.parallel.multifreq import fwi_misfit_grad_chunked

    nz = nx = 64
    cfg = SolverConfig(tol=1e-11, maxiter=600, strat_panels=2,
                       strat_overlap=8)
    freqs = np.array([250.])
    src_pos = np.array([[12.0, 12.0], [40.0, 14.0]])
    rec_pos = np.array([[48.0, 22.0], [16.0, 44.0]])
    x = np.linspace(0., 1., nx)[None, :] * np.ones((nz, 1))
    c = 2000. * (1.0 + 0.4 * x)            # lateral trend
    c[24:40, 20:44] -= 120.
    rho = np.ones((nz, nx))
    dobs = np.zeros((1, 2, 2), np.complex128)

    kw = dict(config=cfg, chunk=2, target_gpw=1e6, src_pos=src_pos,
              rec_pos=rec_pos, cmin=float(c.min()), nPML=8)
    m0, g = fwi_misfit_grad_chunked(c, rho, freqs, None, None, dobs,
                                    **kw)
    assert np.isfinite(m0) and np.isfinite(g).all()
    rng = np.random.default_rng(5)
    dc = rng.standard_normal((nz, nx))
    eps = 0.1
    m_p, _ = fwi_misfit_grad_chunked(c + eps * dc, rho, freqs, None,
                                     None, dobs, **kw)
    m_m, _ = fwi_misfit_grad_chunked(c - eps * dc, rho, freqs, None,
                                     None, dobs, **kw)
    fd = (m_p - m_m) / (2 * eps)
    an = float(np.sum(g * dc))
    assert abs(fd - an) / abs(an) < 2e-4, (fd, an)


@pytest.mark.slow
def test_sharded_grad_matches_single_small():
    'Mesh-sharded FWI gradient == single-device gradient (tiny shapes).'
    from zephyr_tpu.parallel import make_mesh, make_sharded_fwi_step
    from zephyr_tpu.parallel.multifreq import multifreq_dpred

    if jax.device_count() < 4:
        pytest.skip('needs 4 virtual devices')
    nz, nx = 40, 32
    cfg = SolverConfig(tol=1e-6, maxiter=150)
    freqs = np.array([60., 90.])
    q = np.zeros((2, 2, nz, nx), np.complex128)
    q[:, 0, 10, 8] = 1.0
    q[:, 1, 20, 8] = 1.0
    R = np.zeros((2, nz * nx), np.complex128)
    R[0, 12 * nx + 24] = 1.0
    R[1, 24 * nx + 24] = 1.0
    c = 2000. * np.ones((nz, nx))
    rho = np.ones((nz, nx))
    c_true = c.copy()
    c_true[18:26, 12:20] -= 100.
    dobs = multifreq_dpred(jnp.asarray(c_true), jnp.asarray(rho),
                           jnp.asarray(freqs), jnp.asarray(q),
                           jnp.asarray(R), config=cfg, nPML=8)
    mesh = make_mesh(freq=2, src=2)
    step = make_sharded_fwi_step(mesh, rho, freqs, q, R, dobs, lr=0.,
                                 config=cfg, nPML=8)
    _, misfit, grad = step(jnp.asarray(c))

    def objective(cm):
        d = multifreq_dpred(cm, jnp.asarray(rho), jnp.asarray(freqs),
                            jnp.asarray(q), jnp.asarray(R), config=cfg,
                            nPML=8)
        return 0.5 * jnp.sum(jnp.abs(d - dobs) ** 2)

    g1 = np.asarray(jax.grad(objective)(jnp.asarray(c)))
    assert np.allclose(np.asarray(grad), g1, rtol=1e-6, atol=1e-12)


def test_fused_hybrid_matches_lu_small():
    '''
    hybrid_comp='fused' (PCR as the level-1 boost of one V-cycle; the
    production 2048^2 bench configuration) solves to the same answer as
    the dense LU, and its VJP (transpose solves fall back to 'mult')
    matches the transposed dense solve.
    '''
    cfg = CFG._replace(mg_coarse='inv', tol=1e-9, fft_mode='strat',
                       fft_scale=2, hybrid_comp='fused',
                       mg_nu1=2, mg_nu2=1, mg_min_size=10)
    c = np.full((NZ, NX), 1500.)
    c[NZ // 2:] = 2400.
    op = _mz_operator(cfg, with_transpose=True,
                      c=jnp.asarray(c, jnp.complex128))
    q = _delta(16, 28)
    f = lambda b: solve(op, b, cfg)
    x, vjp = jax.vjp(f, jnp.asarray(q))
    A = planes_to_dense(np.asarray(op.planes[0, 0]))
    x_lu = np.linalg.solve(A, q.ravel())
    assert np.linalg.norm(np.asarray(x).ravel() - x_lu) \
        / np.linalg.norm(x_lu) < 1e-6
    g = _delta(20, 20) * (1.0 - 0.25j)
    (gb,) = vjp(jnp.asarray(g))
    gt = np.linalg.solve(A.T, g.ravel())
    assert np.linalg.norm(np.asarray(gb).ravel() - gt) \
        / np.linalg.norm(gt) < 1e-6


def test_prep_trace_shared_across_frequencies():
    '''
    The Ainv preparation jit is cached class-wide with freq/tau/ky as
    traced inputs: sibling subproblems of a distributor (one per
    frequency) must NOT each retrace the preparation graph. Distinct
    static plane attributes (e.g. dx) must get their own trace.
    '''

    from zephyr_tpu.backend import MiniZephyr
    from zephyr_tpu.backend.discretization import BaseDiscretization

    BaseDiscretization._rio_preps.clear()
    base = {'c': 2500., 'rho': 1., 'nx': 40, 'nz': 48}
    q = np.zeros((48 * 40, 1), np.complex128)
    q[24 * 40 + 20] = 1.0
    for freq in (80., 120.):
        u = MiniZephyr(dict(base, freq=freq)) * q
        assert np.isfinite(u).all()
    assert len(BaseDiscretization._rio_preps) == 1
    u = MiniZephyr(dict(base, freq=80., dx=2., dz=2.)) * q
    assert np.isfinite(u).all()
    assert len(BaseDiscretization._rio_preps) == 2
