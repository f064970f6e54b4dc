'''
Matrix-free stencil algebra: apply/transpose vs dense assembly, plane
sanitization, and exact Galerkin (RAP) coarsening.
'''

import numpy as np
import jax.numpy as jnp

from zephyr_tpu.ops.stencil import (apply_stencil, apply_block_stencil,
                                    transpose_planes,
                                    transpose_block_planes,
                                    sanitize_planes, planes_to_dense,
                                    block_planes_to_dense,
                                    planes_to_dense_jax)
from zephyr_tpu.solver.multigrid import (galerkin_coarsen_scalar, restrict,
                                         prolong)

RNG = np.random.default_rng(7)


def _rand_planes(nz, nx, n=9):
    return jnp.asarray(RNG.standard_normal((n, nz, nx))
                       + 1j * RNG.standard_normal((n, nz, nx)))


def _dense_P(nz, nx):
    W = {-1: 0.5, 0: 1.0, 1: 0.5}
    nzc, nxc = (nz + 1) // 2, (nx + 1) // 2
    P = np.zeros((nz * nx, nzc * nxc))
    for I in range(nzc):
        for J in range(nxc):
            for az in (-1, 0, 1):
                for ax in (-1, 0, 1):
                    fi, fj = 2 * I + az, 2 * J + ax
                    if 0 <= fi < nz and 0 <= fj < nx:
                        P[fi * nx + fj, I * nxc + J] += W[az] * W[ax]
    return P


def test_apply_matches_dense():
    nz, nx = 13, 11
    planes = _rand_planes(nz, nx)
    A = planes_to_dense(np.asarray(planes))
    v = RNG.standard_normal((nz, nx)) + 1j * RNG.standard_normal((nz, nx))
    y1 = np.asarray(apply_stencil(planes, jnp.asarray(v)))
    y2 = (A @ v.ravel()).reshape(nz, nx)
    assert np.max(np.abs(y1 - y2)) < 1e-12


def test_transpose_matches_dense():
    nz, nx = 12, 9
    planes = _rand_planes(nz, nx)
    A = planes_to_dense(np.asarray(planes))
    pT = transpose_planes(planes)
    AT = planes_to_dense(np.asarray(pT))
    assert np.max(np.abs(AT - A.T)) < 1e-12


def test_block_apply_and_transpose():
    nz, nx = 10, 8
    planes = jnp.stack([jnp.stack([_rand_planes(nz, nx) for _ in range(2)])
                        for _ in range(2)])
    A = block_planes_to_dense(np.asarray(planes))
    v = RNG.standard_normal((2, nz, nx)) \
        + 1j * RNG.standard_normal((2, nz, nx))
    y1 = np.asarray(apply_block_stencil(planes, jnp.asarray(v)))
    y2 = (A @ v.reshape(-1)).reshape(2, nz, nx)
    assert np.max(np.abs(y1 - y2)) < 1e-12

    pT = transpose_block_planes(planes)
    AT = block_planes_to_dense(np.asarray(pT))
    assert np.max(np.abs(AT - A.T)) < 1e-12


def test_dense_jax_matches_numpy():
    nz, nx = 9, 7
    planes = _rand_planes(nz, nx)[None, None]
    A1 = np.asarray(planes_to_dense_jax(planes))
    A2 = block_planes_to_dense(np.asarray(planes))
    assert np.max(np.abs(A1 - A2)) < 1e-12


def test_sanitize_is_semantically_noop():
    nz, nx = 9, 7
    planes = _rand_planes(nz, nx)
    A1 = planes_to_dense(np.asarray(planes))
    A2 = planes_to_dense(np.asarray(sanitize_planes(planes)))
    assert np.max(np.abs(A1 - A2)) < 1e-12


def test_galerkin_rap_exact():
    for nz, nx in [(9, 7), (10, 8), (11, 8), (8, 11)]:
        planes = _rand_planes(nz, nx)
        P = _dense_P(nz, nx)
        R = 0.25 * P.T
        Ac_dense = R @ planes_to_dense(np.asarray(planes)) @ P
        Ac = planes_to_dense(np.asarray(galerkin_coarsen_scalar(planes)))
        assert np.max(np.abs(Ac_dense - Ac)) < 1e-12


def test_restrict_prolong_match_dense():
    nz, nx = 11, 9
    P = _dense_P(nz, nx)
    R = 0.25 * P.T
    v = RNG.standard_normal((nz, nx)) + 1j * RNG.standard_normal((nz, nx))
    rc = np.asarray(restrict(jnp.asarray(v)))
    assert np.max(np.abs(rc.ravel() - R @ v.ravel())) < 1e-12
    nzc, nxc = (nz + 1) // 2, (nx + 1) // 2
    vc = RNG.standard_normal((nzc, nxc))
    pf = np.asarray(prolong(jnp.asarray(vc), nz, nx))
    assert np.max(np.abs(pf.ravel() - P @ vc.ravel())) < 1e-12
