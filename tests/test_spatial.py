'''
Spatial domain decomposition: halo-exchanging stencil apply and the
domain-decomposed Helmholtz solve on the 8-device virtual mesh.
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
from zephyr_tpu.ops.stencil import apply_block_stencil
from zephyr_tpu.parallel.spatial import (make_sharded_apply,
                                         make_dd_solver, make_dd_dpred)
from zephyr_tpu.solver.helmholtz import (SolverConfig, shifted_velocity)

NZ, NX = 64, 128
FREQ = 100.


def _mesh(n=4):
    if jax.device_count() < n:
        pytest.skip('needs %d devices' % n)
    return Mesh(np.array(jax.devices()[:n]), axis_names=('x',))


def _mesh2d(nz=2, nx=2):
    if jax.device_count() < nz * nx:
        pytest.skip('needs %d devices' % (nz * nx))
    return Mesh(np.array(jax.devices()[:nz * nx]).reshape(nz, nx),
                axis_names=('z', 'x'))


def _planes(tol=1e-8):
    c = 2000. * jnp.ones((NZ, NX), dtype=jnp.complex128)
    rho = jnp.ones((NZ, NX))
    planes = minizephyr_planes(c, rho, FREQ, nPML=6)[None, None]
    cfg = SolverConfig(tol=tol, maxiter=600, mg_coarse='inv',
                       mg_min_size=16)
    pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho, FREQ,
                                nPML=6, pml_cap=cfg.pml_cap)[None, None]
    return planes, pplanes, cfg


def test_sharded_apply_matches_unsharded():
    mesh = _mesh(4)
    planes, _, _ = _planes()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((1, NZ, NX))
                    + 1j * rng.standard_normal((1, NZ, NX)))

    ref = apply_block_stencil(planes, u)
    sharded = make_sharded_apply(mesh)(planes, u)
    assert np.allclose(np.asarray(sharded), np.asarray(ref), atol=1e-12)


def test_sharded_apply_2d_tiles_matches_unsharded():
    mesh = _mesh2d(2, 2)
    planes, _, _ = _planes()
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((1, NZ, NX))
                    + 1j * rng.standard_normal((1, NZ, NX)))

    ref = apply_block_stencil(planes, u)
    sharded = make_sharded_apply(mesh, axis_name='x', axis_z='z')(planes, u)
    assert np.allclose(np.asarray(sharded), np.asarray(ref), atol=1e-12)


def _reference_solve(planes, pplanes, cfg, qj):
    from zephyr_tpu.solver.helmholtz import prepare_operator, solve_info
    op = prepare_operator(planes, pplanes, cfg, with_transpose=False)
    return solve_info(op, qj, cfg)


@pytest.mark.slow
def test_dd_solve_matches_global():
    mesh = _mesh(4)
    planes, pplanes, cfg = _planes()

    q = np.zeros((1, NZ, NX), dtype=np.complex128)
    q[0, NZ // 2, NX // 2] = 1.0
    qj = jnp.asarray(q)

    solver = make_dd_solver(mesh, cfg)
    x, iters, relres = solver(planes, pplanes, qj)
    assert float(relres) < 1e-7

    x_ref, ref_iters, _ = _reference_solve(planes, pplanes, cfg, qj)
    rel = np.linalg.norm(np.asarray(x) - np.asarray(x_ref)) \
        / np.linalg.norm(np.asarray(x_ref))
    assert rel < 1e-5

    # the shard-local hybrid (additive Schwarz) must stay within a small
    # factor of the single-device iteration count
    assert int(iters) < 4 * max(int(ref_iters), 1)


def test_dd_solve_2d_tiles_batched_rhs():
    'DD over (z, x) tiles with a batched RHS matches the global solve.'
    mesh = _mesh2d(2, 2)
    planes, pplanes, cfg = _planes()

    q = np.zeros((2, 1, NZ, NX), dtype=np.complex128)
    q[0, 0, NZ // 2, NX // 2] = 1.0
    q[1, 0, NZ // 3, 2 * NX // 3] = 1.0 - 0.5j
    qj = jnp.asarray(q)

    solver = make_dd_solver(mesh, cfg, axis_name='x', axis_z='z')
    x, iters, relres = solver(planes, pplanes, qj)
    assert float(relres) < 1e-7

    for r in range(2):
        x_ref, _, _ = _reference_solve(planes, pplanes, cfg, qj[r])
        rel = np.linalg.norm(np.asarray(x[r]) - np.asarray(x_ref)) \
            / np.linalg.norm(np.asarray(x_ref))
        assert rel < 1e-5


@pytest.mark.slow
def test_dd_dpred_matches_multifreq_dpred():
    'The DD production forward == the single-device differentiable path.'
    from zephyr_tpu.parallel.multifreq import multifreq_dpred

    mesh = _mesh(4)
    cfg = SolverConfig(tol=1e-8, maxiter=600, mg_coarse='inv',
                       mg_min_size=16)
    freqs = np.array([80., 110.])
    nsrc, nrec = 2, 3
    c = 2000. * np.ones((NZ, NX))
    c[NZ // 2:] = 2600.
    rho = np.ones((NZ, NX))
    q = np.zeros((2, nsrc, NZ, NX), np.complex128)
    q[:, 0, 16, 20] = 1.0
    q[:, 1, 40, 90] = 1.0
    Rg = np.zeros((nrec, NZ, NX), np.complex128)
    Rg[0, 10, 40] = 1.0
    Rg[1, 30, 64] = 1.0
    Rg[2, 50, 100] = 1.0

    dpred = make_dd_dpred(mesh, freqs, cfg, nPML=6)
    d_dd, info = dpred(jnp.asarray(c + 0j), jnp.asarray(rho),
                       jnp.asarray(q), jnp.asarray(Rg))
    for iters, relres in info:
        assert relres < 1e-7

    d_ref = multifreq_dpred(jnp.asarray(c + 0j), jnp.asarray(rho),
                            jnp.asarray(freqs), jnp.asarray(q),
                            jnp.asarray(Rg.reshape(nrec, NZ * NX)),
                            config=cfg, nPML=6)
    rel = np.linalg.norm(np.asarray(d_dd) - np.asarray(d_ref)) \
        / np.linalg.norm(np.asarray(d_ref))
    assert rel < 1e-5


@pytest.mark.slow
def test_dd_iteration_inflation_at_scale():
    '''
    DD iteration-inflation pin at production-like shard sizes (VERDICT
    round-3 item 9): 512^2 layered on a 2x2 mesh — 256^2 shards, 16
    wavelengths across each shard (supra-wavelength, where RAS overlap
    is engaged) — must converge within 2x the global solve's iteration
    count, and match its solution. This is the scale regime where the
    per-shard slabs are wide enough for the shard-local hybrid to hold
    up; the dryrun's 40x32 shards (MULTICHIP iters [176, 83, 55, 39])
    are BELOW that regime by design.
    '''

    n = 512
    mesh = _mesh2d(2, 2)
    cl = np.zeros((n, n))
    for i, v in enumerate([1500., 2000., 2500., 3000.]):
        cl[i * n // 4:(i + 1) * n // 4] = v
    c = jnp.asarray(cl).astype(jnp.complex128)
    rho = jnp.ones((n, n))
    freq = 1500.0 / 16.0
    cfg = SolverConfig(tol=1e-5, maxiter=1200, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2)
    planes = minizephyr_planes(c, rho, freq)[None, None]
    pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho, freq,
                                pml_cap=cfg.pml_cap)[None, None]
    q = np.zeros((1, n, n), dtype=np.complex128)
    q[0, n // 2, n // 2] = 1.0
    qj = jnp.asarray(q)

    x_ref, ref_iters, _ = _reference_solve(planes, pplanes, cfg, qj)

    solver = make_dd_solver(mesh, cfg, axis_name='x', axis_z='z',
                            overlap=16)
    x, iters, relres = solver(planes, pplanes, qj)
    assert float(relres) < 1e-5
    rel = np.linalg.norm(np.asarray(x) - np.asarray(x_ref)) \
        / np.linalg.norm(np.asarray(x_ref))
    assert rel < 1e-4, rel
    assert int(iters) <= 2 * int(ref_iters), (int(iters), int(ref_iters))


@pytest.mark.slow
def test_dd_ras_overlap_reduces_iterations():
    '''
    Restricted additive Schwarz: on supra-wavelength shards an
    overlapped slab preconditioner must (a) still match the global
    solve and (b) converge in FEWER outer iterations than plain block
    Schwarz (measured 159 -> 88 at 256^2 layered on a 2x2 mesh).
    Shards below 4x the overlap fall back to overlap 0, so this test
    uses a grid large enough to engage the overlap path.
    '''

    n = 192
    mesh = _mesh2d(2, 2)   # 96x96 shards >= 4 * overlap
    cl = np.zeros((n, n))
    for i, v in enumerate([1500., 2000., 2500., 3000.]):
        cl[i * n // 4:(i + 1) * n // 4] = v
    c = jnp.asarray(cl).astype(jnp.complex128)
    rho = jnp.ones((n, n))
    freq = 1500.0 / 16.0
    cfg = SolverConfig(tol=1e-6, maxiter=600, mg_coarse='inv',
                       mg_min_size=16)
    planes = minizephyr_planes(c, rho, freq, nPML=8)[None, None]
    pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho, freq,
                                nPML=8, pml_cap=cfg.pml_cap)[None, None]
    q = np.zeros((1, n, n), dtype=np.complex128)
    q[0, n // 2, n // 2] = 1.0
    qj = jnp.asarray(q)

    solver0 = make_dd_solver(mesh, cfg, axis_name='x', axis_z='z',
                             overlap=0)
    x0, it0, rr0 = solver0(planes, pplanes, qj)
    solver8 = make_dd_solver(mesh, cfg, axis_name='x', axis_z='z',
                             overlap=8)
    x8, it8, rr8 = solver8(planes, pplanes, qj)
    assert float(rr8) < 1e-6
    assert int(it8) < int(it0), (int(it8), int(it0))

    x_ref, _, _ = _reference_solve(planes, pplanes, cfg, qj)
    rel = np.linalg.norm(np.asarray(x8) - np.asarray(x_ref)) \
        / np.linalg.norm(np.asarray(x_ref))
    assert rel < 1e-5
