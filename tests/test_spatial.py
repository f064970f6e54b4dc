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
from zephyr_tpu.parallel.spatial import make_sharded_apply, make_dd_solver
from zephyr_tpu.solver.helmholtz import (SolverConfig, shifted_velocity)

NZ, NX = 64, 128
FREQ = 100.


def _mesh(n=4):
    if jax.device_count() < n:
        pytest.skip('needs %d devices' % n)
    return Mesh(np.array(jax.devices()[:n]), axis_names=('x',))


def _planes():
    c = 2000. * jnp.ones((NZ, NX), dtype=jnp.complex128)
    rho = jnp.ones((NZ, NX))
    planes = minizephyr_planes(c, rho, FREQ, nPML=6)[None, None]
    cfg = SolverConfig(tol=1e-8, maxiter=600)
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

    # check against the single-device reference solve
    from zephyr_tpu.solver.helmholtz import prepare_operator, solve_info
    op = prepare_operator(planes, pplanes, cfg, with_transpose=False)
    x_ref, ref_iters, _ = solve_info(op, qj, cfg)
    rel = np.linalg.norm(np.asarray(x) - np.asarray(x_ref)) \
        / np.linalg.norm(np.asarray(x_ref))
    assert rel < 1e-5

    # additive-Schwarz preconditioning is weaker than global multigrid,
    # but must stay within a small factor of the single-device count
    assert int(iters) < 4 * max(int(ref_iters), 1)
