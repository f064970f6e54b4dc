'''
Spatial domain decomposition with halo exchange.

The reference has NO spatial parallelism — its scaling axes are frequency,
source, and ky fan-out (SURVEY.md section 2.5). For grids beyond one
chip's memory/bandwidth comfort (the 2048^2+ north star), zephyr_tpu adds
the missing axis: the (nz, nx) grid is sharded across one or two mesh
axes (x slabs or (z, x) tiles), the 9-point stencil apply exchanges
one-cell halos with its neighbours via ``jax.lax.ppermute`` (which XLA
lowers to ICI ppermute / remote DMA), and everything else in the solver
composes through shard_map.

The preconditioner acts shard-locally (additive Schwarz) but is the FULL
production hybrid stack — each shard runs ``prepare_operator`` on its own
slab (stratified/spectral interior solve + CSLP multigrid + exact coarse
inverse), so DD solves inherit every single-chip preconditioner
improvement; the global coupling is carried by the halo-exchanging
matvec and psum inner products of the outer Krylov iteration.
'''

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.stencil import OFFSETS


def _exchange_axis(u_local, axis_name, dim, width=1, edge='zero'):
    '''
    Exchange ``width``-cell halos along array dimension ``dim`` (-1 for x
    columns, -2 for z rows) across mesh axis ``axis_name``. Returns the
    local block grown by 2*width along ``dim``. At GLOBAL edges the halo
    is zero-filled (``edge='zero'``, the field/residual convention —
    matches the stencil's zero extension) or mirror-filled with the
    shard's own edge strip (``edge='mirror'`` — used for operator
    coefficient planes in the overlapped-Schwarz slabs, where zero rows
    would otherwise become unit-diagonal rows INSIDE the slab and break
    the local multigrid's two-grid convergence, exactly the sign-mixing
    failure ``multigrid._mask_ring_planes`` documents).
    '''

    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    lo_edge = lax.slice_in_dim(u_local, 0, width, axis=u_local.ndim + dim)
    hi_edge = lax.slice_in_dim(u_local, u_local.shape[dim] - width,
                               u_local.shape[dim], axis=u_local.ndim + dim)

    # my high edge becomes my successor's low halo, and vice versa
    from_lo = lax.ppermute(hi_edge, axis_name,
                           [(i, (i + 1) % n) for i in range(n)])
    from_hi = lax.ppermute(lo_edge, axis_name,
                           [(i, (i - 1) % n) for i in range(n)])
    if edge == 'mirror':
        fill_lo = jnp.flip(lo_edge, axis=u_local.ndim + dim)
        fill_hi = jnp.flip(hi_edge, axis=u_local.ndim + dim)
    else:
        fill_lo = jnp.zeros_like(from_lo)
        fill_hi = jnp.zeros_like(from_hi)
    from_lo = jnp.where(idx == 0, fill_lo, from_lo)
    from_hi = jnp.where(idx == n - 1, fill_hi, from_hi)
    return jnp.concatenate([from_lo, u_local, from_hi],
                           axis=u_local.ndim + dim)


def halo_exchange_x(u_local, axis_name):
    '''
    Exchange one-column halos with the left/right neighbour shards along
    ``axis_name``. u_local: (..., nz, nx_local) -> (..., nz, nx_local+2),
    zero-filled at the global edges.
    '''

    return _exchange_axis(u_local, axis_name, -1)


def halo_exchange_2d(u_local, axis_z, axis_x, width=1, edge='zero'):
    '''
    Two-axis halo exchange for (z, x)-tiled grids: x columns first, then
    z rows of the x-extended block — the corner halos ride the second
    exchange automatically. Returns the block grown by 2*width per axis.
    '''

    uh = _exchange_axis(u_local, axis_x, -1, width, edge)
    return _exchange_axis(uh, axis_z, -2, width, edge)


def _extend_overlap(a, axis_z, axis_x, width, edge='zero'):
    '''
    Grow a shard-local array by ``width`` cells per side along the
    sharded grid axes — the overlapped slab of restricted additive
    Schwarz. Works for fields (..., nz, nx) and coefficient planes
    (B, B, 9, nz, nx) alike; ``edge`` controls the global-edge fill
    (see ``_exchange_axis``).
    '''

    if axis_z is None:
        return _exchange_axis(a, axis_x, -1, width, edge)
    return halo_exchange_2d(a, axis_z, axis_x, width, edge)


def _crop_overlap(a, axis_z, width):
    'Crop the owned (non-overlap) center of an overlapped-slab result.'

    out = lax.slice_in_dim(a, width, a.shape[-1] - width, axis=a.ndim - 1)
    if axis_z is not None:
        out = lax.slice_in_dim(out, width, a.shape[-2] - width,
                               axis=a.ndim - 2)
    return out


def apply_stencil_sharded(planes_local, u_local, axis_name=None,
                          axis_z=None, axis_x=None):
    '''
    The 9-point block-stencil apply on a spatially sharded grid.
    planes_local: (B, B, 9, nz_l, nx_l); u_local: (B, nz_l, nx_l). Must
    run inside shard_map. Pass ``axis_name`` (x-slabs, back-compat) or
    ``axis_x`` and optionally ``axis_z`` for 2D (z, x) tiles.
    '''

    if axis_x is None:
        axis_x = axis_name
    B = planes_local.shape[0]
    nz, nxl = u_local.shape[-2:]

    rows = []
    for i in range(B):
        acc = None
        for j in range(B):
            if axis_z is None:
                uh = halo_exchange_x(u_local[j], axis_x)  # (nz, nxl+2)
                up = jnp.pad(uh, ((1, 1), (0, 0)))        # z zero-pad
            else:
                up = halo_exchange_2d(u_local[j], axis_z, axis_x)
            for k, (dz, dx) in enumerate(OFFSETS):
                term = planes_local[i, j, k] \
                    * lax.dynamic_slice(up, (1 + dz, 1 + dx), (nz, nxl))
                acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def make_sharded_apply(mesh, axis_name='x', axis_z=None):
    '''
    Build a jitted (planes, u) -> A u over a grid sharded along
    ``axis_name`` (and optionally ``axis_z`` for 2D tiles).
    '''

    pspec = P(None, None, None, axis_z, axis_name)
    uspec = P(None, axis_z, axis_name)

    fn = shard_map(partial(apply_stencil_sharded, axis_x=axis_name,
                           axis_z=axis_z),
                   mesh=mesh, in_specs=(pspec, uspec), out_specs=uspec)
    return jax.jit(fn)


def _dot(a, b, axes):
    'Mesh-global complex inner product of shard-local arrays.'
    return lax.psum(jnp.vdot(a, b), axes)


def sharded_bicgstab(planes_local, b_local, M_local, axis_name,
                     tol=1e-6, maxiter=500, axis_z=None):
    '''
    BiCGStab over the spatially sharded domain: matvecs exchange halos,
    inner products psum over the mesh axes, and the preconditioner
    ``M_local`` acts shard-locally (additive Schwarz). Runs inside
    shard_map. ``b_local`` may carry a leading batch axis (R, B, nz, nx):
    all right-hand sides iterate in lockstep until the worst residual
    meets tol.
    '''

    axes = (axis_name,) if axis_z is None else (axis_z, axis_name)
    mv_one = partial(apply_stencil_sharded, planes_local,
                     axis_x=axis_name, axis_z=axis_z)
    batched = b_local.ndim == 4

    if batched:
        mv = jax.vmap(mv_one)
        Mfn = jax.vmap(M_local)

        def _gdot(a, b):
            # per-RHS inner products, psummed over the mesh
            loc = jnp.sum(jnp.conj(a) * b, axis=(1, 2, 3))
            return lax.psum(loc, axes)
    else:
        mv = mv_one
        Mfn = M_local

        def _gdot(a, b):
            return _dot(a, b, axes)

    def norm(a):
        return jnp.sqrt(jnp.abs(_gdot(a, a)).real)

    bnorm = norm(b_local)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    atol = tol * bnorm

    x0 = jnp.zeros_like(b_local)
    r0 = b_local - mv(x0)
    rhat = r0
    nR = b_local.shape[0] if batched else None
    sshape = (nR,) if batched else ()
    one = jnp.ones(sshape, dtype=b_local.dtype)
    down0 = jnp.zeros(sshape, dtype=bool)
    tiny = jnp.finfo(jnp.real(jnp.zeros((), b_local.dtype)).dtype).tiny

    def _bc(s):
        'Broadcast a per-RHS scalar over the field axes.'
        return s[..., None, None, None] if batched else s

    def _safe_div(num, den):
        bad = jnp.abs(den) < tiny
        return jnp.where(bad, jnp.zeros_like(num),
                         num / jnp.where(bad, jnp.ones_like(den), den))

    def cond(state):
        x, r, p, v, rho, alpha, omega, k, down = state
        active = (norm(r) > atol) & jnp.logical_not(down)
        return jnp.any(active) & (k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k, down = state
        rho_new = _gdot(rhat, r)
        beta = _safe_div(rho_new * alpha, rho * omega)
        p = r + _bc(beta) * (p - _bc(omega) * v)
        phat = Mfn(p)
        v = mv(phat)
        denom = _gdot(rhat, v)
        alpha = _safe_div(rho_new, denom)
        s = r - _bc(alpha) * v
        shat = Mfn(s)
        t = mv(shat)
        tt = _gdot(t, t)
        omega_new = _safe_div(_gdot(t, s), tt)
        x = x + _bc(alpha) * phat + _bc(omega_new) * shat
        r = s - _bc(omega_new) * t
        down = (jnp.abs(rho_new) < tiny) | (jnp.abs(denom) < tiny) \
            | (jnp.abs(omega_new) < tiny)
        return (x, r, p, v, rho_new, alpha, omega_new, k + 1, down)

    state0 = (x0, r0, jnp.zeros_like(b_local), jnp.zeros_like(b_local),
              one, one, one, jnp.zeros((), jnp.int32), down0)
    x, r, *_, k, _down = lax.while_loop(cond, body, state0)
    return x, k, jnp.max(norm(r) / bnorm)


def _local_hybrid_precond(planes_local, pplanes_local, cfg,
                          axis_x=None, axis_z=None, overlap=0):
    '''
    The FULL production preconditioner built on the local slab: each
    shard runs prepare_operator on its own planes (stratified/spectral
    interior solve + CSLP multigrid + exact coarse inverse), giving an
    additive-Schwarz hybrid. Returns the M_local application.

    With ``overlap`` > 0 this becomes restricted additive Schwarz (RAS):
    the slab (planes and, per application, the residual) is grown by
    ``overlap`` cells per sharded side via halo exchange, the local
    preconditioner acts on the extended slab, and only the owned center
    of the result is kept. Measured at 256^2 layered / 2x2 tiles:
    159 -> 107 outer iterations at overlap 16 on a 2x2 mesh at 256^2
    (83 vs 125 at 128^2); overlap should be ~1 wavelength.
    Coefficient halos beyond the GLOBAL domain edge are mirror-filled
    (zero-filled halos would plant unit-diagonal rows inside the slab
    and break the local MG — see ``_exchange_axis``); residual halos
    there stay zero, so the mirrored rows solve homogeneous equations
    whose garbage lives entirely in the cropped overlap band.
    '''

    from ..solver.helmholtz import prepare_operator, _make_precond

    planes_local = lax.stop_gradient(planes_local)
    pplanes_local = lax.stop_gradient(pplanes_local)
    # Overlapped slabs need room: on shards narrower than 4x the overlap
    # the mirror band dominates the slab and RAS is measured actively
    # harmful (96 wide / 8-way x-slabs at 16 cells/wavelength: overlap
    # 12 stalls at 2e-3 and overlap 3 diverges, where overlap 0
    # converges in 88 iterations) — and a larger-than-shard overlap
    # cannot even trace (the halo exchange ships at most one shard).
    # Fall back to plain block Schwarz on such narrow shards.
    nzl, nxl = planes_local.shape[-2:]
    extents = [nxl] + ([nzl] if axis_z is not None else [])
    if any(e < 4 * overlap for e in extents):
        overlap = 0
    interior_mask = None
    if overlap:
        planes_local = _extend_overlap(planes_local, axis_z, axis_x,
                                       overlap, edge='mirror')
        pplanes_local = _extend_overlap(pplanes_local, axis_z, axis_x,
                                        overlap, edge='mirror')
        # exclude from the local coarse-grid correction every row the
        # slab treats as closure: the mirror band at GLOBAL edges plus
        # the true global Dirichlet ring row, which now sit INSIDE the
        # slab rather than on its ring (the Dirichlet +1 rows mixed into
        # the Galerkin coarse operator are the documented two-grid
        # breaker — this masking is what makes overlapped slabs converge)
        def closure_mask_1d(n_ext, axis_name):
            i = jnp.arange(n_ext)
            idx = lax.axis_index(axis_name)
            n = lax.axis_size(axis_name)
            m = jnp.ones((n_ext,), jnp.float32)
            m = jnp.where((idx == 0) & (i <= overlap), 0.0, m)
            m = jnp.where((idx == n - 1) & (i >= n_ext - 1 - overlap),
                          0.0, m)
            return m

        nzx, nxx = planes_local.shape[-2:]
        mx = closure_mask_1d(nxx, axis_x)
        mz = (closure_mask_1d(nzx, axis_z) if axis_z is not None
              else jnp.ones((nzx,), jnp.float32))
        interior_mask = mz[:, None] * mx[None, :]
    op = prepare_operator(planes_local, pplanes_local, cfg,
                          with_transpose=False,
                          interior_mask=interior_mask)
    M0 = _make_precond(op, cfg)
    if not overlap:
        return M0

    def M(r):
        r_ext = _extend_overlap(r, axis_z, axis_x, overlap)
        return _crop_overlap(M0(r_ext), axis_z, overlap)

    return M


def make_dd_solver(mesh, config=None, axis_name='x', axis_z=None,
                   overlap=16):
    '''
    Build a jitted domain-decomposed Helmholtz solve:
        (planes, precond_planes, b) -> (x, iters, relres)
    with the grid sharded along ``axis_name`` (x slabs) and optionally
    ``axis_z`` ((z, x) tiles). The preconditioner is the restricted-
    additive-Schwarz hybrid stack built shard-locally on ``overlap``-
    extended slabs (overlap=0 recovers plain block Schwarz); the outer
    Krylov carries the global coupling.
    ``b`` may be (B, nz, nx) or batched (R, B, nz, nx).
    '''

    from ..solver.helmholtz import SolverConfig

    cfg = config or SolverConfig()

    pspec = P(None, None, None, axis_z, axis_name)

    def local_solve(planes_local, pplanes_local, b_local):
        M_local = _local_hybrid_precond(planes_local, pplanes_local, cfg,
                                        axis_x=axis_name, axis_z=axis_z,
                                        overlap=overlap)
        return sharded_bicgstab(planes_local, b_local, M_local,
                                axis_name, tol=cfg.tol,
                                maxiter=cfg.maxiter, axis_z=axis_z)

    def wrapper(planes, pplanes, b):
        uspec = (P(None, axis_z, axis_name) if b.ndim == 3
                 else P(None, None, axis_z, axis_name))
        return shard_map(
            local_solve, mesh=mesh,
            in_specs=(pspec, pspec, uspec),
            out_specs=(uspec, P(), P()))(planes, pplanes, b)

    return jax.jit(wrapper)


def make_dd_dpred(mesh, freqs, config=None, axis_name='x', axis_z=None,
                  Q=None, freqBase=0.0, overlap=16, **plane_kwargs):
    '''
    Production forward modelling over a spatially sharded grid:
        dpred(c, rho, q, R) -> (nfreq, nsrc, nrec) data cube.

    c, rho: (nz, nx) model fields (sharded over the mesh by GSPMD);
    q: (nfreq, nsrc, nz, nx) source fields; R: (nrec, nz, nx) receiver
    extraction fields (the (nrec, nz*nx) matrix reshaped to the grid so
    it shards spatially). Each frequency runs one jitted DD solve; the
    operator planes are built under the same jit, so XLA keeps every
    array sharded end-to-end — this is the path for grids larger than
    one chip's HBM. Differentiation is not supported here (use
    multifreq_dpred); reference semantics match survey.dpred
    (zephyr/middleware/survey.py:190-198).
    '''

    import numpy as np
    from ..solver.helmholtz import SolverConfig, shifted_velocity
    from ..ops.minizephyr_coeff import minizephyr_planes

    cfg = config or SolverConfig()
    if Q is None:
        Q = np.inf

    pspec = P(None, None, None, axis_z, axis_name)
    qspec = P(None, None, axis_z, axis_name)     # (nsrc, B, nz, nx)
    rspec = P(None, axis_z, axis_name)           # (nrec, nz, nx)

    def one_freq(freq, c, rho, q_f, R):
        from .multifreq import viscous_velocity
        ci = viscous_velocity(c.astype(q_f.dtype), freq, Q, freqBase)
        planes = minizephyr_planes(ci, rho, freq, **plane_kwargs)[None,
                                                                  None]
        pplanes = minizephyr_planes(
            shifted_velocity(ci, cfg.shift), rho, freq,
            pml_cap=cfg.pml_cap, **plane_kwargs)[None, None]

        def local(planes_l, pplanes_l, b_l, R_l):
            M_local = _local_hybrid_precond(planes_l, pplanes_l, cfg,
                                            axis_x=axis_name,
                                            axis_z=axis_z,
                                            overlap=overlap)
            x, iters, relres = sharded_bicgstab(
                planes_l, b_l, M_local, axis_name, tol=cfg.tol,
                maxiter=cfg.maxiter, axis_z=axis_z)
            u = jnp.conj(x[:, 0])                # (nsrc, nz_l, nx_l)
            d_loc = jnp.einsum('rzx,szx->sr', R_l, u)
            axes = ((axis_name,) if axis_z is None
                    else (axis_z, axis_name))
            return lax.psum(d_loc, axes), iters, relres

        b = q_f[:, None]                         # (nsrc, 1, nz, nx)
        return shard_map(local, mesh=mesh,
                         in_specs=(pspec, pspec, qspec, rspec),
                         out_specs=(P(), P(), P()))(planes, pplanes, b, R)

    jfreq = jax.jit(one_freq)

    def dpred(c, rho, q, R):
        outs = []
        info = []
        for i, f in enumerate(np.asarray(freqs)):
            d, iters, relres = jfreq(jnp.asarray(float(f)), c, rho,
                                     q[i], R)
            outs.append(d)
            info.append((int(iters), float(relres)))
        return jnp.stack(outs, axis=0), info

    return dpred
