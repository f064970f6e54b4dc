'''
Parallel layer: vmapped multi-frequency operators, mesh-sharded solves,
and the sharded FWI training step — exercised on the 8-device virtual
CPU platform (SURVEY.md section 4.3 test strategy).
'''

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zephyr_tpu.parallel import (make_mesh, multifreq_dpred,
                                 make_sharded_fwi_step, viscous_velocity)
from zephyr_tpu.solver.helmholtz import SolverConfig
from zephyr_tpu.middleware import Helm2DProblem, Helm2DSurvey
from zephyr_tpu.backend import MiniZephyr

NZ, NX = 48, 40
FREQS = np.array([40., 60., 80., 100.])
CFG = SolverConfig(tol=1e-8, maxiter=500)


def _fields():
    nsrc, nrec = 2, 3
    q = np.zeros((len(FREQS), nsrc, NZ, NX), dtype=np.complex128)
    for s in range(nsrc):
        q[:, s, 10 + 5 * s, 10] = 1.0
    R = np.zeros((nrec, NZ * NX), dtype=np.complex128)
    for r in range(nrec):
        R[r, (12 + 8 * r) * NX + 30] = 1.0
    return q, R


@pytest.mark.slow
def test_multifreq_dpred_matches_middleware():
    'The vmapped fast path must agree with the per-frequency class path.'

    c = 2000. * np.ones((NZ, NX))
    rho = np.ones((NZ, NX))
    q, R = _fields()

    d_fast = np.asarray(multifreq_dpred(
        jnp.asarray(c), jnp.asarray(rho), jnp.asarray(FREQS),
        jnp.asarray(q), jnp.asarray(R), config=CFG, nPML=10))

    sc = {
        'Disc': MiniZephyr, 'nx': NX, 'nz': NZ, 'c': c, 'rho': 1.,
        'freqs': list(FREQS),
        'geom': {'src': np.array([[10., 10.], [10., 15.]]),
                 'rec': np.array([[30., 12.], [30., 20.], [30., 28.]]),
                 'mode': 'fixed',
                 'GeneratorClass': None},
        'nPML': 10,
        'solverOpts': {'tol': 1e-8, 'maxiter': 500},
    }
    # build the middleware path with SimpleSource-equivalent geometry:
    # compare per-frequency wavefield projection using the same q/R
    from zephyr_tpu.solver.helmholtz import (prepare_operator,
                                             solve_batched,
                                             shifted_velocity)
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes

    panels = []
    for i, f in enumerate(FREQS):
        planes = minizephyr_planes(jnp.asarray(c + 0j), jnp.asarray(rho),
                                   float(f), nPML=10)[None, None]
        pplanes = minizephyr_planes(
            shifted_velocity(jnp.asarray(c + 0j), CFG.shift),
            jnp.asarray(rho), float(f), nPML=10)[None, None]
        op = prepare_operator(planes, pplanes, CFG, with_transpose=False)
        b = jnp.asarray(q[i][:, None])
        u = jnp.conj(solve_batched(op, b, CFG))[:, 0]
        panels.append(np.asarray(
            jnp.einsum('rn,sn->sr', jnp.asarray(R),
                       u.reshape(2, NZ * NX))))
    d_ref = np.stack(panels, axis=0)

    rel = np.linalg.norm(d_fast - d_ref) / np.linalg.norm(d_ref)
    assert rel < 1e-6


def test_viscous_velocity_matches_distributor():
    from zephyr_tpu.backend.distributors import ViscoMultiFreq

    c = 2000. * np.ones((NZ, NX))
    wrapper = ViscoMultiFreq({
        'Disc': MiniZephyr, 'nx': NX, 'nz': NZ, 'c': c,
        'freqs': [100.], 'Q': 20., 'freqBase': 50.,
    })
    c_ref = wrapper.spUpdates[0]['c']
    c_fast = np.asarray(viscous_velocity(jnp.asarray(c), 100., Q=20.,
                                         freqBase=50.))
    assert np.allclose(c_fast, c_ref)


@pytest.mark.slow
def test_sharded_fwi_step_8_devices():
    if jax.device_count() < 8:
        pytest.skip('needs 8 virtual devices')

    c = 2000. * np.ones((NZ, NX))
    rho = np.ones((NZ, NX))
    q, R = _fields()
    mesh = make_mesh(freq=4, src=2)

    c_true = c.copy()
    c_true[20:30, 15:25] -= 100.
    dobs = multifreq_dpred(jnp.asarray(c_true), jnp.asarray(rho),
                           jnp.asarray(FREQS), jnp.asarray(q),
                           jnp.asarray(R), config=CFG, nPML=10)

    step = make_sharded_fwi_step(mesh, rho, FREQS, q, R, dobs,
                                 lr=0.0, config=CFG, nPML=10)
    c1, misfit, grad = step(jnp.asarray(c))
    assert np.isfinite(float(misfit)) and float(misfit) > 0
    g = np.asarray(grad)
    assert np.isfinite(g).all()

    # gradient concentrates on the anomaly rows (10 of 48 rows carry the
    # bulk of the sensitivity; src/rec imprints carry the rest)
    row_energy = np.abs(g).sum(axis=1)
    assert row_energy[20:30].sum() > 0.35 * row_energy.sum()

    # sharded gradient == single-device gradient
    def objective(cm):
        d = multifreq_dpred(cm, jnp.asarray(rho), jnp.asarray(FREQS),
                            jnp.asarray(q), jnp.asarray(R), config=CFG,
                            nPML=10)
        return 0.5 * jnp.sum(jnp.abs(d - dobs) ** 2)

    g_single = np.asarray(jax.grad(objective)(jnp.asarray(c)))
    assert np.allclose(g, g_single, rtol=1e-6, atol=1e-12)


@pytest.mark.slow
def test_multifreq_25d_matches_compat():
    'The vmapped ky summation must agree with the MiniZephyr25D class.'
    from zephyr_tpu.parallel import multifreq_dpred_25d
    from zephyr_tpu.backend import MiniZephyr25D, SimpleSource

    nz, nx, nky, freq = 48, 40, 3, 80.
    c = 2500. * np.ones((nz, nx))
    sc = {
        'c': c, 'rho': 1., 'nx': nx, 'nz': nz, 'freq': freq,
        'nky': nky, 'parallel': False,
        'solverOpts': {'tol': 1e-9, 'maxiter': 600},
    }
    src = SimpleSource(sc)
    sloc = np.array([[10., 12.]])
    qvec = src(sloc)                       # (nrow, 1)
    u_compat = (MiniZephyr25D(sc) * qvec).ravel()

    q = qvec.T.reshape((1, 1, nz, nx))     # (nfreq=1, nsrc=1, nz, nx)
    R = np.eye(nz * nx, dtype=np.complex128)  # extract full wavefield
    cfg = SolverConfig(tol=1e-9, maxiter=600)
    d = multifreq_dpred_25d(jnp.asarray(c + 0j), jnp.ones((nz, nx)),
                            jnp.asarray([freq]), jnp.asarray(q),
                            jnp.asarray(R), nky=nky, config=cfg)
    u_fast = np.asarray(d)[0, 0]
    rel = np.linalg.norm(u_fast - u_compat) / np.linalg.norm(u_compat)
    assert rel < 1e-6


@pytest.mark.slow
def test_multifreq_dpred_chunked_matches_differentiable():
    '''
    The host-driven chunked production forward (one short device program
    per frequency + restarted chunked solves) must agree with the
    monolithic differentiable forward to solver tolerance.
    '''
    import numpy as np
    import jax.numpy as jnp
    from zephyr_tpu.parallel.multifreq import (multifreq_dpred,
                                               multifreq_dpred_chunked)
    from zephyr_tpu.solver.helmholtz import SolverConfig

    nz, nx = 64, 64
    cfg = SolverConfig(tol=1e-8, maxiter=300)
    freqs = np.array([80., 120.])
    q = np.zeros((2, 2, nz, nx), np.complex128)
    q[:, 0, 20, 20] = 1.0
    q[:, 1, 40, 30] = 1.0
    R = np.zeros((3, nz * nx), np.complex128)
    for r in range(3):
        R[r, 30 * nx + 10 + r * 10] = 1.0
    c = 2000. * np.ones((nz, nx))

    d1 = np.asarray(multifreq_dpred(
        jnp.asarray(c), jnp.ones((nz, nx)), jnp.asarray(freqs),
        jnp.asarray(q), jnp.asarray(R), config=cfg))
    d2 = multifreq_dpred_chunked(c, np.ones((nz, nx)), freqs, q, R,
                                 config=cfg, chunk=32)
    rel = np.linalg.norm(d1 - d2) / np.linalg.norm(d1)
    assert rel < 1e-5

    # complex (attenuative) velocity must flow through the chunked
    # realio boundary, not silently lose its imaginary part
    c_cplx = c * (1.0 + 0.01j)
    d1c = np.asarray(multifreq_dpred(
        jnp.asarray(c_cplx), jnp.ones((nz, nx)), jnp.asarray(freqs),
        jnp.asarray(q), jnp.asarray(R), config=cfg))
    d2c = multifreq_dpred_chunked(c_cplx, np.ones((nz, nx)), freqs, q, R,
                                  config=cfg, chunk=32)
    relc = np.linalg.norm(d1c - d2c) / np.linalg.norm(d1c)
    assert relc < 1e-5
    # and the attenuation must actually change the data
    assert np.linalg.norm(d1c - d1) / np.linalg.norm(d1) > 1e-3


def test_initialize_distributed_single_process_noop():
    'Single-process bring-up is a no-op returning False.'
    from zephyr_tpu.parallel.mesh import initialize_distributed
    assert initialize_distributed() is False
    with pytest.raises(ValueError):
        initialize_distributed(num_processes=4)


def test_make_multihost_mesh_single_host():
    "('host','freq','src') mesh degenerates to host=1 on one process."
    from zephyr_tpu.parallel.mesh import make_multihost_mesh
    if jax.device_count() < 4:
        pytest.skip('needs 4 virtual devices')
    mesh = make_multihost_mesh(freq=2, src=2)
    assert mesh.axis_names == ('host', 'freq', 'src')
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        'host': 1, 'freq': 2, 'src': 2}

    # a psum over all three axes runs and matches the device count
    from functools import partial
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(shard_map, mesh=mesh, in_specs=P('host', 'freq', 'src'),
             out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), ('host', 'freq', 'src'))[None]

    out = total(jnp.ones((1, 2, 2)))
    assert float(out[0]) == 4.0


def test_parallel_distributor_multi_device_dispatch():
    '''
    The compat distributor's parallel path round-robins sibling solves
    across local devices and enqueues them up front (the reference's
    pool.apply_async contract, zephyr/backend/distributors.py:161-168):
    the prepared operators land on DISTINCT devices and the results
    match the serial path exactly.
    '''

    from zephyr_tpu.backend.distributors import MultiFreq, SerialMultiFreq
    from zephyr_tpu.backend import MiniZephyr

    if jax.local_device_count() < 2:
        pytest.skip('needs >= 2 local devices')

    nz = nx = 24
    sc = {'Disc': MiniZephyr, 'nx': nx, 'nz': nz,
          'c': 2000. * np.ones((nz, nx)), 'rho': 1.,
          'freqs': [60., 90.],
          'solverOpts': {'tol': 1e-8, 'maxiter': 300}}
    q = np.zeros((nz * nx, 1), dtype=np.complex128)
    q[12 * nx + 12] = 1.0

    outer = MultiFreq(sc)
    us = [np.asarray(u) for u in outer * q]

    devs = set()
    for sub in outer.subProblems:
        leaf = jax.tree_util.tree_leaves(sub._Ainv)[0]
        (dev,) = leaf.devices()
        devs.add(dev)
    assert len(devs) > 1, 'sibling operators share one device'

    serial = SerialMultiFreq(sc)
    us_serial = [np.asarray(u) for u in serial * q]
    for u_p, u_s in zip(us, us_serial):
        assert np.allclose(u_p, u_s, rtol=1e-12, atol=1e-14)


def test_lazy_fields_protocol():
    '''
    Distributor __mul__ is lazy (reference generator-protocol parity,
    zephyr/backend/distributors.py:161-173): no subproblem solve runs
    until a wavefield is consumed; len/indexing/re-iteration work.
    '''
    from zephyr_tpu.backend.distributors import MultiFreq, LazyFields
    from zephyr_tpu.backend import MiniZephyr

    calls = []

    class CountingDisc(MiniZephyr):
        def __mul__(self, rhs):
            calls.append(self.freq)
            return MiniZephyr.__mul__(self, rhs)

    nz = nx = 24
    sc = {'Disc': CountingDisc, 'nx': nx, 'nz': nz,
          'c': 2000. * np.ones((nz, nx)), 'rho': 1.,
          'freqs': [60., 90.],
          'solverOpts': {'tol': 1e-4, 'maxiter': 200}}
    outer = MultiFreq(sc)
    q = np.zeros((nz * nx, 1), dtype=np.complex128)
    q[12 * nx + 12] = 1.0
    fields = outer * q
    assert isinstance(fields, LazyFields)
    assert len(fields) == 2
    assert calls == []                 # nothing solved yet
    u0 = np.asarray(fields[0])
    assert calls == [60.]              # only the consumed subproblem ran
    us = [np.asarray(u) for u in fields]
    assert calls == [60., 60., 90.]    # re-iteration recomputes
    assert np.allclose(us[0], u0)
    assert all(np.isfinite(u).all() for u in us)
