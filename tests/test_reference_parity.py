'''
EXACT stencil parity against the reference implementation.

These tests execute the reference's own matrix assembly (read-only, from
the mounted snapshot at /root/reference, with its py2-era dependencies
stubbed) and compare the resulting sparse operators element-wise against
zephyr_tpu's coefficient planes. This pins the TPU implementation to the
reference at machine precision — far beyond the oracle-based tolerances.

Skipped automatically when the reference snapshot is not mounted.
'''

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_BACKEND = '/root/reference/zephyr/backend'

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_BACKEND),
                                reason='reference snapshot not mounted')


def _load_reference_module(name):
    'Load a reference backend module with stubbed py2-era dependencies.'

    if 'future' not in sys.modules:
        future = types.ModuleType('future')
        sl = types.ModuleType('future.standard_library')
        sl.install_aliases = lambda: None
        future.standard_library = sl
        sys.modules['future'] = future
        sys.modules['future.standard_library'] = sl

    pkgname = 'refzephyr_backend'
    if pkgname not in sys.modules:
        pkg = types.ModuleType(pkgname)
        pkg.__path__ = [REF_BACKEND]
        sys.modules[pkgname] = pkg

        # distinct stub bases (reference classes multiply-inherit them)
        disc = types.ModuleType(pkgname + '.discretization')
        disc.BaseDiscretization = type('BaseDiscretization', (), {})
        disc.DiscretizationWrapper = type('DiscretizationWrapper', (), {})
        sys.modules[pkgname + '.discretization'] = disc

        base = types.ModuleType(pkgname + '.base')
        base.BaseModelDependent = type('BaseModelDependent', (), {})
        base.BaseAnisotropic = type('BaseAnisotropic', (), {})
        sys.modules[pkgname + '.base'] = base

    full = pkgname + '.' + name
    if full not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(REF_BACKEND, name + '.py'))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    return sys.modules[full]


def _make_ref_instance(cls, **attrs):
    obj = object.__new__(cls)
    for key, value in attrs.items():
        setattr(obj, key, value)
    return obj


@pytest.mark.parametrize('freeSurf', [
    (False, False, False, False),
    (True, False, True, False),
])
@pytest.mark.parametrize('ky', [0.0, 0.02])
def test_minizephyr_matrix_exact(freeSurf, ky):
    'Our planes assemble to the reference MiniZephyr matrix exactly.'

    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.ops.stencil import planes_to_dense
    import jax.numpy as jnp

    mz = _load_reference_module('minizephyr')

    nz, nx, freq = 38, 30, 180.
    rng = np.random.default_rng(0)
    c = 2000. + 400. * rng.random((nz, nx))        # heterogeneous
    rho = 1. + 0.5 * rng.random((nz, nx))
    tau = 0.37

    ref = _make_ref_instance(
        mz.MiniZephyr,
        nx=nx, nz=nz, dx=1.0, dz=1.0,
        c=c.astype(np.complex128), rho=rho,
        freq=freq, dampCoeff=1j / tau, freeSurf=freeSurf,
        _ky=ky)
    A_ref = np.asarray(ref._initHelmholtzNinePoint().todense())

    planes = minizephyr_planes(jnp.asarray(c + 0j), jnp.asarray(rho),
                               freq, ky=ky, tau=tau, freeSurf=freeSurf)
    A_ours = planes_to_dense(np.asarray(planes))

    scale = np.abs(A_ref).max()
    assert np.abs(A_ours - A_ref).max() / scale < 1e-12


@pytest.mark.slow
def test_eurus_matrix_exact():
    'Our block planes assemble to the reference Eurus matrix exactly.'

    from zephyr_tpu.ops.eurus_coeff import eurus_planes
    from zephyr_tpu.ops.stencil import block_planes_to_dense
    import jax.numpy as jnp

    eu = _load_reference_module('eurus')

    nz, nx, freq = 30, 24, 160.
    rng = np.random.default_rng(1)
    c = 2000. + 400. * rng.random((nz, nx))
    rho = 1. + 0.5 * rng.random((nz, nx))
    theta = 0.2 * rng.random((nz, nx))
    eps = 0.15 * rng.random((nz, nx))
    delta = 0.1 * rng.random((nz, nx))

    ref = _make_ref_instance(
        eu.Eurus,
        nx=nx, nz=nz, dx=1.0, dz=1.0,
        c=c.astype(np.complex128), rho=rho,
        freq=np.complex128(freq), dampCoeff=0j,
        theta=theta, eps=eps, delta=delta,
        freeSurf=(False, False, False, False))
    A_ref = np.asarray(ref._initHelmholtzNinePoint().todense())

    planes = eurus_planes(jnp.asarray(c + 0j), jnp.asarray(rho), freq,
                          theta=jnp.asarray(theta), eps=jnp.asarray(eps),
                          delta=jnp.asarray(delta))
    A_ours = block_planes_to_dense(np.asarray(planes))

    scale = np.abs(A_ref).max()
    assert np.abs(A_ours - A_ref).max() / scale < 1e-12


def test_kaiser_source_exact():
    'Our Kaiser stamps equal the reference SparseKaiserSource exactly.'

    src_mod = _load_reference_module('source')
    from zephyr_tpu.backend import SparseKaiserSource

    nz, nx = 40, 36
    locs = np.array([[7.3, 9.6], [20.0, 20.0], [2.1, 3.4], [33.8, 36.5]])

    ref = _make_ref_instance(src_mod.SparseKaiserSource,
                             nx=nx, nz=nz, dx=1.0, dz=1.0,
                             xorig=0.0, zorig=0.0, nrow=nz * nx,
                             freeSurf=(False, True, True, False))
    # the reference's SimpleSource.__init__ builds the coordinate grids
    ref._z, ref._x = np.mgrid[0:float(nz), 0:float(nx)]
    q_ref = np.asarray(ref(locs).todense())

    ours = SparseKaiserSource({'nx': nx, 'nz': nz,
                               'freeSurf': (False, True, True, False)})
    q_ours = np.asarray(ours(locs).todense())

    assert np.abs(q_ours - q_ref).max() < 1e-14
