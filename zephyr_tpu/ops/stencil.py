'''
Matrix-free 9-point stencil operators for zephyr_tpu.

The reference (uwoseis/zephyr) assembles its 9-point frequency-domain
Helmholtz operators as SciPy CSR matrices built from 9 diagonal vectors
(reference zephyr/backend/minizephyr.py:219-252 and
zephyr/backend/eurus.py:300-463) and factorizes them with sparse LU. On TPU
the idiomatic inversion of that design keeps the SAME stencil coefficients,
but stores them as dense "coefficient planes" of shape (9, nz, nx) and
applies the operator matrix-free:

    (A u)[i, j] = sum_k  planes[k, i, j] * u[i + dz_k, j + dx_k]

with zero extension outside the grid. This matches the sparse-diagonal
semantics of the reference exactly, because the reference zeroes every
off-diagonal coefficient on boundary rows (minizephyr.py:256-298), so the
linear-index wraparound of scipy.sparse.diags never contributes.

Block operators (the Eurus TTI 2N-state system, eurus.py:430-464) are
represented as planes of shape (B, B, 9, nz, nx) acting on fields of shape
(B, nz, nx).

Plane ordering: index k = (dz + 1) * 3 + (dx + 1) for offsets
(dz, dx) in row-major order over {-1, 0, 1}^2, i.e.

    k : 0        1       2       3       4      5       6       7       8
    s : (-1,-1) (-1,0) (-1,+1) (0,-1) (0,0) (0,+1) (+1,-1) (+1,0) (+1,+1)

where dz indexes the slow (z, first) axis and dx the fast (x, second) axis.
'''

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

#: Stencil offsets (dz, dx), index k = (dz+1)*3 + (dx+1)
OFFSETS = tuple((dz, dx) for dz in (-1, 0, 1) for dx in (-1, 0, 1))
CENTER = 4


def shift2d(arr, dz, dx):
    '''
    Return out[i, j] = arr[i + dz, j + dx], zero outside the array.
    Operates on the last two axes.
    '''

    nz, nx = arr.shape[-2:]
    padded = jnp.pad(arr, [(0, 0)] * (arr.ndim - 2) + [(1, 1), (1, 1)])
    return lax.slice_in_dim(
        lax.slice_in_dim(padded, 1 + dz, 1 + dz + nz, axis=arr.ndim - 2),
        1 + dx, 1 + dx + nx, axis=arr.ndim - 1)


def sanitize_planes(planes):
    '''
    Zero the stencil entries that point outside the grid (e.g. the (0,+1)
    plane on the last column). Such entries never contribute to
    ``apply_stencil`` (zero padding) or to dense assembly (masked), so this
    is semantically a no-op — but it makes plane storage canonical, which
    the Galerkin coarsening in ``zephyr_tpu.solver.multigrid`` relies on.
    Works on (..., 9, nz, nx).
    '''

    nz, nx = planes.shape[-2:]
    out = []
    for k, (dz, dx) in enumerate(OFFSETS):
        p = planes[..., k, :, :]
        if dz < 0:
            p = p.at[..., 0, :].set(0)
        if dz > 0:
            p = p.at[..., -1, :].set(0)
        if dx < 0:
            p = p.at[..., :, 0].set(0)
        if dx > 0:
            p = p.at[..., :, -1].set(0)
        out.append(p)
    return jnp.stack(out, axis=-3)


def apply_stencil(planes, u):
    '''
    Apply a scalar 9-point stencil operator.

    Args:
        planes: (9, nz, nx) complex coefficient planes
        u: (..., nz, nx) field (leading axes broadcast, e.g. RHS batch)

    Returns:
        (..., nz, nx) A @ u
    '''

    up = jnp.pad(u, [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)])
    nz, nx = u.shape[-2:]
    out = None
    for k, (dz, dx) in enumerate(OFFSETS):
        term = planes[k] * lax.slice_in_dim(
            lax.slice_in_dim(up, 1 + dz, 1 + dz + nz, axis=u.ndim - 2),
            1 + dx, 1 + dx + nx, axis=u.ndim - 1)
        out = term if out is None else out + term
    return out


def _pallas_wanted():
    'Pallas fast path: on TPU backends unless explicitly disabled.'

    import os
    if os.environ.get('ZEPHYR_TPU_NO_PALLAS'):
        return False
    try:
        import jax
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


@jax.custom_batching.custom_vmap
def _apply_batched_fast(planes, u):
    '''
    Batched scalar apply (planes (9, nz, nx), u (R, nz, nx)); uses the
    Pallas kernel when eligible. Wrapped in custom_vmap so that any
    FURTHER batching (e.g. an outer frequency vmap batching the planes)
    falls back to the jnp path — the default pallas_call batching rule
    cannot handle the kernel's ANY-memory-space inputs.
    '''

    if _pallas_wanted():
        from .pallas_stencil import (apply_stencil_pallas_batched,
                                     pallas_batched_applicable)
        if pallas_batched_applicable(planes, u):
            return apply_stencil_pallas_batched(planes, u)
    return apply_stencil(planes, u)


@_apply_batched_fast.def_vmap
def _apply_batched_fast_vmap(axis_size, in_batched, planes, u):
    planes_b, u_b = in_batched
    fn = jax.vmap(apply_stencil,
                  in_axes=(0 if planes_b else None, 0 if u_b else None))
    return fn(planes, u), True


@jax.custom_batching.custom_vmap
def _apply_scalar_fast(planes, u):
    'Scalar 9-point apply; under vmap dispatches to the Pallas kernel.'

    return apply_stencil(planes, u)


@_apply_scalar_fast.def_vmap
def _apply_scalar_fast_vmap(axis_size, in_batched, planes, u):
    planes_b, u_b = in_batched
    if u_b and not planes_b:
        return _apply_batched_fast(planes, u), True
    fn = jax.vmap(apply_stencil,
                  in_axes=(0 if planes_b else None, 0 if u_b else None))
    return fn(planes, u), True


def _jacobi_ref(p, d, bb, uu):
    return uu + d * (bb - apply_stencil(p, uu))


@jax.custom_batching.custom_vmap
def _jacobi_batched_fast(planes, dinv_eff, b, u):
    'Batched fused sweep; further batching falls back to jnp (see apply).'

    if _pallas_wanted():
        from .pallas_stencil import (jacobi_sweep_pallas_batched,
                                     pallas_jacobi_applicable)
        if pallas_jacobi_applicable(planes, u):
            return jacobi_sweep_pallas_batched(planes, dinv_eff, b, u)
    return _jacobi_ref(planes, dinv_eff, b, u)


@_jacobi_batched_fast.def_vmap
def _jacobi_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff, b, u):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_jacobi_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, b, u), True


@jax.custom_batching.custom_vmap
def _jacobi_scalar_fast(planes, dinv_eff, b, u):
    'One damped-Jacobi sweep; under vmap dispatches to the fused kernel.'

    return _jacobi_ref(planes, dinv_eff, b, u)


@_jacobi_scalar_fast.def_vmap
def _jacobi_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff, b, u):
    planes_b, dinv_b, b_b, u_b = in_batched
    if u_b and b_b and not planes_b and not dinv_b:
        return _jacobi_batched_fast(planes, dinv_eff, b, u), True
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_jacobi_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, b, u), True


def jacobi_sweep_fast(planes, dinv_eff, b, u):
    '''
    Fused damped-Jacobi sweep u' = u + dinv_eff * (b - A u) for a scalar
    (B=1) operator; eligible for the Pallas kernel when vmapped on TPU.
    Preconditioner-internal only (no AD rules on the fast path).
    '''

    return _jacobi_scalar_fast(planes, dinv_eff, b, u)


def _jacobi2_ref(p, d, bb, uu):
    return _jacobi_ref(p, d, bb, _jacobi_ref(p, d, bb, uu))


def _jacobi2z_ref(p, d, bb):
    return _jacobi_ref(p, d, bb, d * bb)


@jax.custom_batching.custom_vmap
def _jacobi2_batched_fast(planes, dinv_eff, b, u):
    'Batched fused DOUBLE sweep; further batching falls back to jnp.'

    if _pallas_wanted():
        from .pallas_stencil import (jacobi_sweep2_pallas_batched,
                                     pallas_jacobi2_applicable)
        if pallas_jacobi2_applicable(planes, b):
            return jacobi_sweep2_pallas_batched(planes, dinv_eff, b, u)
    return _jacobi2_ref(planes, dinv_eff, b, u)


@_jacobi2_batched_fast.def_vmap
def _jacobi2_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                               b, u):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_jacobi2_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, b, u), True


@jax.custom_batching.custom_vmap
def _jacobi2_scalar_fast(planes, dinv_eff, b, u):
    'Two damped-Jacobi sweeps; vmapped: dispatches to the fused kernel.'

    return _jacobi2_ref(planes, dinv_eff, b, u)


@_jacobi2_scalar_fast.def_vmap
def _jacobi2_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                              b, u):
    planes_b, dinv_b, b_b, u_b = in_batched
    if u_b and b_b and not planes_b and not dinv_b:
        return _jacobi2_batched_fast(planes, dinv_eff, b, u), True
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_jacobi2_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, b, u), True


@jax.custom_batching.custom_vmap
def _jacobi2z_batched_fast(planes, dinv_eff, b):
    'Batched double sweep FROM ZERO (saves the u input stream).'

    if _pallas_wanted():
        from .pallas_stencil import (jacobi_sweep2_pallas_batched,
                                     pallas_jacobi2_applicable)
        if pallas_jacobi2_applicable(planes, b):
            return jacobi_sweep2_pallas_batched(planes, dinv_eff, b, None)
    return _jacobi2z_ref(planes, dinv_eff, b)


@_jacobi2z_batched_fast.def_vmap
def _jacobi2z_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                                b):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_jacobi2z_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, b), True


@jax.custom_batching.custom_vmap
def _jacobi2z_scalar_fast(planes, dinv_eff, b):
    return _jacobi2z_ref(planes, dinv_eff, b)


@_jacobi2z_scalar_fast.def_vmap
def _jacobi2z_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff, b):
    planes_b, dinv_b, b_b = in_batched
    if b_b and not planes_b and not dinv_b:
        return _jacobi2z_batched_fast(planes, dinv_eff, b), True
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_jacobi2z_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, b), True


def jacobi_sweep2_fast(planes, dinv_eff, b, u):
    '''
    TWO fused damped-Jacobi sweeps (one kernel pass on TPU when vmapped:
    single-sweep traffic via redundant halo compute). No AD rules.
    '''

    return _jacobi2_scalar_fast(planes, dinv_eff, b, u)


def jacobi_sweep2_zero_fast(planes, dinv_eff, b):
    'Two fused sweeps from a zero initial guess.'

    return _jacobi2z_scalar_fast(planes, dinv_eff, b)


def _apply_block_ref(planes, u):
    'jnp reference block apply: (B, B, 9, nz, nx) x (..., B, nz, nx).'

    B = planes.shape[0]
    rows = []
    for i in range(B):
        acc = None
        for j in range(B):
            term = apply_stencil(planes[i, j], u[..., j, :, :])
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=-3)


@jax.custom_batching.custom_vmap
def _apply_block2_batched_fast(planes, u):
    'Batched 2x2 block apply (u (R, 2, nz, nx)); fused kernel on TPU.'

    if _pallas_wanted():
        from .pallas_stencil import (apply_block_stencil_pallas_batched,
                                     pallas_block_applicable)
        if pallas_block_applicable(planes, u):
            return apply_block_stencil_pallas_batched(planes, u)
    return _apply_block_ref(planes, u)


@_apply_block2_batched_fast.def_vmap
def _apply_block2_batched_fast_vmap(axis_size, in_batched, planes, u):
    planes_b, u_b = in_batched
    fn = jax.vmap(_apply_block_ref,
                  in_axes=(0 if planes_b else None, 0 if u_b else None))
    return fn(planes, u), True


@jax.custom_batching.custom_vmap
def _apply_block2_fast(planes, u):
    '2x2 block apply; under vmap dispatches to the fused block kernel.'

    return _apply_block_ref(planes, u)


@_apply_block2_fast.def_vmap
def _apply_block2_fast_vmap(axis_size, in_batched, planes, u):
    planes_b, u_b = in_batched
    if u_b and not planes_b:
        return _apply_block2_batched_fast(planes, u), True
    fn = jax.vmap(_apply_block_ref,
                  in_axes=(0 if planes_b else None, 0 if u_b else None))
    return fn(planes, u), True


def apply_block_stencil_fast(planes, u):
    '''
    Same contract as ``apply_block_stencil``, but eligible for the fused
    Pallas kernels when vmapped on TPU — the scalar kernel for B=1 and
    the fused 2x2 block kernel for B=2 (one pass over both field
    components instead of four scalar kernels plus adds). The Pallas
    kernels have no AD rules: use ONLY where gradients are not traced
    through — the multigrid / spectral preconditioner internals and the
    non-differentiable chunked and info solvers.
    (``lax.custom_linear_solve`` differentiates its matvec, so the
    operator apply in ``solve`` must stay on the jnp path.)
    '''

    B = planes.shape[0]
    if B == 2:
        return _apply_block2_fast(planes, u)
    rows = []
    for i in range(B):
        acc = None
        for j in range(B):
            term = _apply_scalar_fast(planes[i, j], u[..., j, :, :])
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=-3)


def transpose_planes(planes):
    '''
    Coefficient planes of the transposed scalar operator.

    A^T[r, r+s] = A[r+s, r] = P_{-s}[r+s], so the transposed plane for
    offset s is the plane for -s shifted by +s (with zero fill).
    '''

    out = []
    for k, (dz, dx) in enumerate(OFFSETS):
        krev = ((-dz) + 1) * 3 + ((-dx) + 1)  # index of offset (-dz, -dx)
        out.append(shift2d(planes[krev], dz, dx))
    return jnp.stack(out, axis=0)


def apply_block_stencil(planes, u):
    '''
    Apply a block 9-point stencil operator.

    Args:
        planes: (B, B, 9, nz, nx) coefficient planes
        u: (..., B, nz, nx) block field

    Returns:
        (..., B, nz, nx): out[i] = sum_j A[i,j] u[j]
    '''

    B = planes.shape[0]
    rows = []
    for i in range(B):
        acc = None
        for j in range(B):
            term = apply_stencil(planes[i, j], u[..., j, :, :])
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=-3)


def transpose_block_planes(planes):
    'Planes of the transposed block operator (swap blocks + per-block T).'

    B = planes.shape[0]
    rows = []
    for i in range(B):
        cols = [transpose_planes(planes[j, i]) for j in range(B)]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def block_diag(planes):
    '''
    The (B, B, nz, nx) pointwise block-diagonal of a block stencil operator
    (the k=CENTER plane of each block).
    '''

    return planes[:, :, CENTER]


def invert_block_diag(D):
    '''
    Pointwise inverse of a (B, B, nz, nx) block-diagonal field.
    Supports B = 1 and B = 2 analytically.
    '''

    B = D.shape[0]
    if B == 1:
        return (1.0 / D[0, 0])[None, None]
    if B == 2:
        a, b = D[0, 0], D[0, 1]
        c, d = D[1, 0], D[1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b], axis=0),
                         jnp.stack([-c, a], axis=0)], axis=0)
        return inv / det
    raise NotImplementedError('invert_block_diag: B > 2')


def block_diag_matvec(Dinv, r):
    'Apply a pointwise (B, B, nz, nx) block field to (..., B, nz, nx).'

    B = Dinv.shape[0]
    outs = []
    for i in range(B):
        acc = None
        for j in range(B):
            term = Dinv[i, j] * r[..., j, :, :]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=-3)


# ---------------------------------------------------------------------------
# Dense assembly (for tests and for the multigrid coarse-level solve only;
# NEVER in the fine-grid hot path)
# ---------------------------------------------------------------------------

def planes_to_dense(planes):
    '''
    Assemble a scalar (9, nz, nx) plane set into a dense (nz*nx, nz*nx)
    matrix with true 2D neighbor semantics (no linear-index wraparound).
    '''

    planes = np.asarray(planes)
    _, nz, nx = planes.shape
    n = nz * nx
    A = np.zeros((n, n), dtype=planes.dtype)
    I, J = np.mgrid[0:nz, 0:nx]
    rows = (I * nx + J).ravel()
    for k, (dz, dx) in enumerate(OFFSETS):
        In, Jn = I + dz, J + dx
        valid = (In >= 0) & (In < nz) & (Jn >= 0) & (Jn < nx)
        cols = (In * nx + Jn).ravel()
        v = valid.ravel()
        A[rows[v], cols[v]] += planes[k].ravel()[v]
    return A


def block_planes_to_dense(planes):
    'Assemble (B, B, 9, nz, nx) block planes into a dense (B*n, B*n) matrix.'

    planes = np.asarray(planes)
    B = planes.shape[0]
    nz, nx = planes.shape[-2:]
    n = nz * nx
    A = np.zeros((B * n, B * n), dtype=planes.dtype)
    for i in range(B):
        for j in range(B):
            A[i * n:(i + 1) * n, j * n:(j + 1) * n] = \
                planes_to_dense(planes[i, j])
    return A


def planes_to_dense_jax(planes):
    '''
    jit-compatible dense assembly of block planes (B, B, 9, nz, nx) into
    (B*nz*nx, B*nz*nx). Used for the multigrid coarsest-level direct solve.
    '''

    B = planes.shape[0]
    nz, nx = planes.shape[-2:]
    n = nz * nx
    I, J = jnp.mgrid[0:nz, 0:nx]
    rows = (I * nx + J).ravel()
    A = jnp.zeros((B * n, B * n), dtype=planes.dtype)
    for bi in range(B):
        for bj in range(B):
            for k, (dz, dx) in enumerate(OFFSETS):
                In, Jn = I + dz, J + dx
                valid = (In >= 0) & (In < nz) & (Jn >= 0) & (Jn < nx)
                cols = (jnp.clip(In, 0, nz - 1) * nx
                        + jnp.clip(Jn, 0, nx - 1)).ravel()
                vals = jnp.where(valid.ravel(), planes[bi, bj, k].ravel(), 0.)
                A = A.at[bi * n + rows, bj * n + cols].add(vals)
    return A


def _ps2r_ref(p, d, m, bb):
    'Reference: two from-zero sweeps + masked residual of the iterate.'

    u2 = _jacobi2z_ref(p, d, bb)
    return u2, m * (bb - apply_stencil(p, u2))


@jax.custom_batching.custom_vmap
def _ps2r_batched_fast(planes, dinv_eff, mask, b):
    'Batched fused presmooth+residual; further batching falls back.'

    if _pallas_wanted():
        from .pallas_stencil import (presmooth2_residual_pallas_batched,
                                     pallas_ps2r_applicable)
        if pallas_ps2r_applicable(planes, b):
            return presmooth2_residual_pallas_batched(planes, dinv_eff,
                                                      mask, b)
    return _ps2r_ref(planes, dinv_eff, mask, b)


@_ps2r_batched_fast.def_vmap
def _ps2r_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                            mask, b):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_ps2r_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b), (True, True)


@jax.custom_batching.custom_vmap
def _ps2r_scalar_fast(planes, dinv_eff, mask, b):
    return _ps2r_ref(planes, dinv_eff, mask, b)


@_ps2r_scalar_fast.def_vmap
def _ps2r_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                           mask, b):
    planes_b, dinv_b, mask_b, b_b = in_batched
    if b_b and not planes_b and not dinv_b and not mask_b:
        return _ps2r_batched_fast(planes, dinv_eff, mask, b), (True, True)
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_ps2r_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b), (True, True)


def presmooth2_residual_fast(planes, dinv_eff, mask, b):
    '''
    The V-cycle fine-level downstroke for a scalar (B=1) operator in one
    fused pass (on TPU when vmapped): u2 = two damped-Jacobi sweeps from
    zero, resm = mask * (b - A u2). Returns (u2, resm). No AD rules —
    preconditioner-internal only.
    '''

    return _ps2r_scalar_fast(planes, dinv_eff, mask, b)


def _pas_ref(p, d, m, bb, uu, ec):
    'Reference upstroke: one sweep of (u + mask * prolong(ec)) vs b.'

    from ..solver.multigrid import _prolong_ref
    nz, nx = bb.shape[-2:]
    u1 = uu + m * _prolong_ref(ec, nz, nx)
    return u1 + d * (bb - apply_stencil(p, u1))


@jax.custom_batching.custom_vmap
def _pas_batched_fast(planes, dinv_eff, mask, b, u, ec):
    'Batched fused upstroke; further batching falls back to jnp.'

    if _pallas_wanted():
        from .pallas_stencil import (prolong_add_smooth_pallas_batched,
                                     pallas_pas_applicable)
        if pallas_pas_applicable(planes, b, ec):
            return prolong_add_smooth_pallas_batched(planes, dinv_eff,
                                                     mask, b, u, ec)
    return _pas_ref(planes, dinv_eff, mask, b, u, ec)


@_pas_batched_fast.def_vmap
def _pas_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                           mask, b, u, ec):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_pas_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b, u, ec), True


@jax.custom_batching.custom_vmap
def _pas_scalar_fast(planes, dinv_eff, mask, b, u, ec):
    return _pas_ref(planes, dinv_eff, mask, b, u, ec)


@_pas_scalar_fast.def_vmap
def _pas_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                          mask, b, u, ec):
    planes_b, dinv_b, mask_b, b_b, u_b, ec_b = in_batched
    if (b_b and u_b and ec_b and not planes_b and not dinv_b
            and not mask_b):
        return _pas_batched_fast(planes, dinv_eff, mask, b, u, ec), True
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_pas_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b, u, ec), True


def prolong_add_smooth_fast(planes, dinv_eff, mask, b, u, ec):
    '''
    The V-cycle upstroke for a scalar (B=1) operator in one fused pass
    (on TPU when vmapped): one damped-Jacobi sweep of
    (u + mask * prolong(ec)) against b. No AD rules —
    preconditioner-internal only.
    '''

    return _pas_scalar_fast(planes, dinv_eff, mask, b, u, ec)


def _ps2rr_ref(p, d, m, bb):
    'Reference: downstroke (two sweeps + masked residual) + restriction.'

    from ..solver.multigrid import _restrict_ref
    u2, resm = _ps2r_ref(p, d, m, bb)
    return u2, _restrict_ref(resm)


@jax.custom_batching.custom_vmap
def _ps2rr_batched_fast(planes, dinv_eff, mask, b):
    'Batched fused downstroke+restrict; further batching falls back.'

    if _pallas_wanted():
        from .pallas_stencil import (presmooth2_restrict_pallas_batched,
                                     pallas_ps2rr_applicable)
        if pallas_ps2rr_applicable(planes, b):
            return presmooth2_restrict_pallas_batched(planes, dinv_eff,
                                                      mask, b)
    return _ps2rr_ref(planes, dinv_eff, mask, b)


@_ps2rr_batched_fast.def_vmap
def _ps2rr_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                             mask, b):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_ps2rr_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b), (True, True)


@jax.custom_batching.custom_vmap
def _ps2rr_scalar_fast(planes, dinv_eff, mask, b):
    return _ps2rr_ref(planes, dinv_eff, mask, b)


@_ps2rr_scalar_fast.def_vmap
def _ps2rr_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                            mask, b):
    planes_b, dinv_b, mask_b, b_b = in_batched
    if b_b and not planes_b and not dinv_b and not mask_b:
        return _ps2rr_batched_fast(planes, dinv_eff, mask, b), (True, True)
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_ps2rr_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b), (True, True)


def presmooth2_restrict_fast(planes, dinv_eff, mask, b):
    '''
    The complete V-cycle fine-level downstroke INCLUDING the transfer
    for a scalar (B=1) operator in one fused pass (on TPU when vmapped):
    u2 = two damped-Jacobi sweeps from zero, rc = restrict(mask *
    (b - A u2)). Returns (u2, rc). No AD rules.
    '''

    return _ps2rr_scalar_fast(planes, dinv_eff, mask, b)


def _ps1rr_ref(p, d, m, bb):
    'Single-sweep downstroke + restriction: u1 = D b, rc = R(m (b-A u1)).'

    from ..solver.multigrid import _restrict_ref
    u1 = d * bb
    return u1, _restrict_ref(m * (bb - apply_stencil(p, u1)))


@jax.custom_batching.custom_vmap
def _ps1rr_batched_fast(planes, dinv_eff, mask, b):
    'Batched fused single-sweep downstroke+restrict.'

    if _pallas_wanted():
        from .pallas_stencil import (presmooth2_restrict_pallas_batched,
                                     pallas_ps2rr_applicable)
        if pallas_ps2rr_applicable(planes, b):
            return presmooth2_restrict_pallas_batched(planes, dinv_eff,
                                                      mask, b, nsweeps=1)
    return _ps1rr_ref(planes, dinv_eff, mask, b)


@_ps1rr_batched_fast.def_vmap
def _ps1rr_batched_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                             mask, b):
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_ps1rr_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b), (True, True)


@jax.custom_batching.custom_vmap
def _ps1rr_scalar_fast(planes, dinv_eff, mask, b):
    return _ps1rr_ref(planes, dinv_eff, mask, b)


@_ps1rr_scalar_fast.def_vmap
def _ps1rr_scalar_fast_vmap(axis_size, in_batched, planes, dinv_eff,
                            mask, b):
    planes_b, dinv_b, mask_b, b_b = in_batched
    if b_b and not planes_b and not dinv_b and not mask_b:
        return _ps1rr_batched_fast(planes, dinv_eff, mask, b), (True,
                                                                True)
    ax = lambda flag: 0 if flag else None
    fn = jax.vmap(_ps1rr_ref, in_axes=tuple(ax(f) for f in in_batched))
    return fn(planes, dinv_eff, mask, b), (True, True)


def presmooth1_restrict_fast(planes, dinv_eff, mask, b):
    '''
    Single-sweep variant of ``presmooth2_restrict_fast`` (nu1=1):
    u1 = omega D b, rc = restrict(mask (b - A u1)) in one fused pass.
    Near-homogeneous media lose nothing from the lighter downstroke
    (512^2 hom: 25 iterations either way) while the second sweep is a
    full VPU-bound stencil apply per preconditioner application.
    '''

    return _ps1rr_scalar_fast(planes, dinv_eff, mask, b)
