'''
Spatial domain decomposition with halo exchange.

The reference has NO spatial parallelism — its scaling axes are frequency,
source, and ky fan-out (SURVEY.md section 2.5). For grids beyond one
chip's memory/bandwidth comfort (the 2048^2+ north star), zephyr_tpu adds
the missing axis: the (nz, nx) grid is sharded across a mesh axis along x,
the 9-point stencil apply exchanges one-cell halos with its neighbours
via ``jax.lax.ppermute`` (which XLA lowers to ICI ppermute / remote DMA),
and everything else in the solver (pointwise smoothing, restriction/
prolongation per shard, reductions via psum) composes through shard_map.

This module provides the sharded stencil apply and a domain-decomposed
Krylov solve where the multigrid preconditioner acts block-locally per
shard (an additive-Schwarz flavour of the CSLP preconditioner: exact on
shard interiors, coupled through the outer Krylov iteration).
'''

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.stencil import OFFSETS


def halo_exchange_x(u_local, axis_name):
    '''
    Exchange one-column halos with the left/right neighbour shards along
    ``axis_name``. u_local: (..., nz, nx_local). Returns the local block
    padded to (..., nz, nx_local + 2), zero-filled at the global edges.
    '''

    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    right_edge = u_local[..., :, -1:]
    left_edge = u_local[..., :, :1]

    # send my right edge to my right neighbour (it becomes their left halo)
    from_left = lax.ppermute(right_edge, axis_name,
                             [(i, (i + 1) % n) for i in range(n)])
    # send my left edge to my left neighbour (their right halo)
    from_right = lax.ppermute(left_edge, axis_name,
                              [(i, (i - 1) % n) for i in range(n)])

    # zero the wrapped halos at the global boundary
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                           from_right)

    return jnp.concatenate([from_left, u_local, from_right], axis=-1)


def apply_stencil_sharded(planes_local, u_local, axis_name):
    '''
    The 9-point block-stencil apply on an x-sharded grid. planes_local:
    (B, B, 9, nz, nx_local); u_local: (B, nz, nx_local). Must run inside
    shard_map over ``axis_name``.
    '''

    B = planes_local.shape[0]
    nz, nxl = u_local.shape[-2:]

    rows = []
    for i in range(B):
        acc = None
        for j in range(B):
            uh = halo_exchange_x(u_local[j], axis_name)   # (nz, nxl+2)
            up = jnp.pad(uh, ((1, 1), (0, 0)))            # z zero-pad
            for k, (dz, dx) in enumerate(OFFSETS):
                term = planes_local[i, j, k] \
                    * lax.dynamic_slice(up, (1 + dz, 1 + dx), (nz, nxl))
                acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def make_sharded_apply(mesh, axis_name='x'):
    '''
    Build a jitted (planes, u) -> A u over a grid sharded along
    ``axis_name`` (last axis of every array). planes replicate in B/9
    and shard in x; u shards in x.
    '''

    pspec = P(None, None, None, None, axis_name)
    uspec = P(None, None, axis_name)

    fn = shard_map(partial(apply_stencil_sharded, axis_name=axis_name),
                   mesh=mesh, in_specs=(pspec, uspec), out_specs=uspec)
    return jax.jit(fn)


def _dot(a, b, axis_name):
    'Mesh-global complex inner product of shard-local arrays.'
    return lax.psum(jnp.vdot(a, b), axis_name)


def sharded_bicgstab(planes_local, b_local, M_local, axis_name,
                     tol=1e-6, maxiter=500):
    '''
    BiCGStab over the x-sharded domain: matvecs exchange halos, inner
    products psum over the mesh, and the preconditioner ``M_local`` acts
    shard-locally (additive Schwarz). Runs inside shard_map.
    '''

    mv = partial(apply_stencil_sharded, planes_local,
                 axis_name=axis_name)

    def norm(a):
        return jnp.sqrt(jnp.abs(_dot(a, a, axis_name)).real)

    bnorm = norm(b_local)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    atol = tol * bnorm

    x0 = jnp.zeros_like(b_local)
    r0 = b_local - mv(x0)
    rhat = r0
    # scalar carries here are psum outputs, i.e. axis-INVARIANT types
    one = jnp.ones((), dtype=b_local.dtype)
    down0 = jnp.asarray(False)
    tiny = jnp.finfo(jnp.real(jnp.zeros((), b_local.dtype)).dtype).tiny

    def _safe_div(num, den):
        bad = jnp.abs(den) < tiny
        return jnp.where(bad, jnp.zeros((), b_local.dtype),
                         num / jnp.where(bad, jnp.ones((), b_local.dtype),
                                         den))

    def cond(state):
        x, r, p, v, rho, alpha, omega, k, down = state
        return (norm(r) > atol) & (k < maxiter) & jnp.logical_not(down)

    def body(state):
        x, r, p, v, rho, alpha, omega, k, down = state
        rho_new = _dot(rhat, r, axis_name)
        beta = _safe_div(rho_new * alpha, rho * omega)
        p = r + beta * (p - omega * v)
        phat = M_local(p)
        v = mv(phat)
        denom = _dot(rhat, v, axis_name)
        alpha = _safe_div(rho_new, denom)
        s = r - alpha * v
        shat = M_local(s)
        t = mv(shat)
        tt = _dot(t, t, axis_name)
        omega_new = _safe_div(_dot(t, s, axis_name), tt)
        x = x + alpha * phat + omega_new * shat
        r = s - omega_new * t
        down = (jnp.abs(rho_new) < tiny) | (jnp.abs(denom) < tiny) \
            | (jnp.abs(omega_new) < tiny)
        return (x, r, p, v, rho_new, alpha, omega_new, k + 1, down)

    state0 = (x0, r0, jnp.zeros_like(b_local), jnp.zeros_like(b_local),
              one, one, one, jnp.zeros((), jnp.int32), down0)
    x, r, *_, k, _down = lax.while_loop(cond, body, state0)
    return x, k, norm(r) / bnorm


def make_dd_solver(mesh, config=None, axis_name='x'):
    '''
    Build a jitted domain-decomposed Helmholtz solve:
        (planes, precond_planes, b) -> (x, iters, relres)
    with everything sharded along x. Each shard builds a multigrid
    hierarchy from ITS slab of the shifted preconditioner planes and
    applies V-cycles shard-locally (additive-Schwarz CSLP); the global
    coupling is carried by the halo-exchanging matvec and the psum inner
    products of the outer Krylov iteration.
    '''

    from ..solver.helmholtz import SolverConfig
    from ..solver.multigrid import build_hierarchy, v_cycle

    cfg = config or SolverConfig()

    pspec = P(None, None, None, None, axis_name)
    uspec = P(None, None, axis_name)

    def local_solve(planes_local, pplanes_local, b_local):
        hier = build_hierarchy(lax.stop_gradient(pplanes_local),
                               min_size=cfg.mg_min_size,
                               coarse='iterative')
        # MG-only additive Schwarz is much more coarse-solve-sensitive
        # than the hybrid preconditioner: keep a high iteration cap here
        # regardless of the global default.
        M_local = lambda r: v_cycle(hier, r, omega=cfg.mg_omega,
                                    nu1=cfg.mg_nu1, nu2=cfg.mg_nu2,
                                    coarse_iters=max(cfg.mg_coarse_iters, 48))
        return sharded_bicgstab(planes_local, b_local, M_local,
                                axis_name, tol=cfg.tol,
                                maxiter=cfg.maxiter)

    def wrapper(planes, pplanes, b):
        return shard_map(
            local_solve, mesh=mesh,
            in_specs=(pspec, pspec, uspec),
            out_specs=(uspec, P(), P()))(planes, pplanes, b)

    return jax.jit(wrapper)
