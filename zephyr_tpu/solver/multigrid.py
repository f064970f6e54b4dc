'''
Geometric multigrid with Galerkin (RAP) coarse operators, matrix-free,
for the zephyr_tpu Helmholtz solver.

This is the TPU-native replacement for the reference's sparse direct solver
(problemo.BestSolver wrapping SciPy SuperLU / MUMPS; reference
zephyr/backend/discretization.py:79-85). No sparse LU exists on TPU, so the
solve becomes Krylov iteration (see ``zephyr_tpu.solver.krylov``)
preconditioned by a complex-shifted-Laplacian multigrid cycle (Erlangga-
style), built entirely from the 9-point coefficient planes:

- Coarse-grid operators are computed by exact stencil-space Galerkin
  coarsening R A P (full-weighting restriction, bilinear prolongation),
  which stays within the 9-point stencil class — so every level reuses the
  same matrix-free apply. This handles PML regions, Dirichlet boundary rows
  and heterogeneous media without any special-casing.
- Smoothing is damped (block-)Jacobi; the pointwise (B, B) diagonal blocks
  are inverted analytically.
- The coarsest level is solved directly with a precomputed dense LU.

All functions are jit-compatible with static shapes; hierarchies are
pytrees, so the whole V-cycle traces into a single XLA computation.
'''

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import stencil
from ..ops.stencil import (apply_block_stencil, apply_block_stencil_fast,
                           block_diag, invert_block_diag, block_diag_matvec,
                           planes_to_dense_jax)

#: per-axis prolongation weights for offsets (-1, 0, +1)
_W = (0.5, 1.0, 0.5)


def _coarse_extent(n):
    'Number of coarse points for vertex-centred 2:1 coarsening.'
    return (n + 1) // 2


def _strided_gather(plane, az, ax, nzc, nxc):
    '''
    Return plane[2I+az, 2J+ax] for coarse indices (I, J), zero outside.
    ``plane`` has shape (..., nz, nx).
    '''

    padded = jnp.pad(plane, [(0, 0)] * (plane.ndim - 2) + [(1, 1), (1, 1)])
    start = [0] * (plane.ndim - 2) + [1 + az, 1 + ax]
    limit = list(padded.shape[:-2]) + [1 + az + 2 * (nzc - 1) + 1,
                                       1 + ax + 2 * (nxc - 1) + 1]
    strides = [1] * (plane.ndim - 2) + [2, 2]
    return lax.slice(padded, start, limit, strides)


def galerkin_coarsen_scalar(planes):
    '''
    Exact stencil-space Galerkin coarsening of a scalar (9, nz, nx) operator:
    A_c = R A P with full-weighting R = (1/4) P^T and bilinear P. The result
    is again a 9-point stencil, with coefficients

        A_c[d](I,J) = sum_{a, s : a' = a + s - 2d in [-1,1]^2}
            (1/4) w(a) w(a') planes[s][2I + a_z, 2J + a_x]

    The input planes are sanitized first (entries pointing outside the grid
    zeroed) so that the stencil-space product matches the dense R A P
    exactly, including at boundaries.
    '''

    planes = stencil.sanitize_planes(planes)
    nz, nx = planes.shape[-2:]
    nzc, nxc = _coarse_extent(nz), _coarse_extent(nx)

    out = []
    for dz in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = jnp.zeros((nzc, nxc), dtype=planes.dtype)
            for az in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    apz = az + sz - 2 * dz
                    if apz < -1 or apz > 1:
                        continue
                    wz = _W[az + 1] * _W[apz + 1]
                    for ax in (-1, 0, 1):
                        for sx in (-1, 0, 1):
                            apx = ax + sx - 2 * dx
                            if apx < -1 or apx > 1:
                                continue
                            w = 0.25 * wz * _W[ax + 1] * _W[apx + 1]
                            k = (sz + 1) * 3 + (sx + 1)
                            acc = acc + w * _strided_gather(
                                planes[k], az, ax, nzc, nxc)
            out.append(acc)
    return jnp.stack(out, axis=0)


def galerkin_coarsen(planes):
    'Galerkin coarsening of block planes (B, B, 9, nz, nx).'

    B = planes.shape[0]
    rows = []
    for i in range(B):
        cols = [galerkin_coarsen_scalar(planes[i, j]) for j in range(B)]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


def _restrict_ref(v):
    '''
    Full-weighting restriction of (..., nz, nx) to the coarse grid:
    out[I, J] = 0.25 sum_{a,b} w(a) w(b) v[2I+a, 2J+b].

    Implemented as a separable [0.5, 1, 0.5] tent filter followed by
    reshape-based decimation. (A single-pass 9-term sum of stride-2
    slices looks cheaper on paper but measured 2.6x SLOWER on v5e —
    lane-dimension strided slices defeat the (8, 128) tiling; the
    strided-gather formulation is worse still.)
    '''

    from ..ops.stencil import shift2d
    nz, nx = v.shape[-2:]
    nzc, nxc = _coarse_extent(nz), _coarse_extent(nx)
    t = v + 0.5 * (shift2d(v, 1, 0) + shift2d(v, -1, 0))
    t = t + 0.5 * (shift2d(t, 0, 1) + shift2d(t, 0, -1))
    t = 0.25 * t
    pz, px = 2 * nzc - nz, 2 * nxc - nx
    t = jnp.pad(t, [(0, 0)] * (t.ndim - 2) + [(0, pz), (0, px)])
    t = t.reshape(t.shape[:-2] + (nzc, 2, nxc, 2))
    return t[..., :, 0, :, 0]


def _prolong_ref(vc, nz, nx):
    '''
    Bilinear prolongation of (..., nzc, nxc) onto the (nz, nx) fine grid.

    Implemented as zero-interleaving (stack + reshape) followed by a
    separable tent filter [0.5, 1, 0.5] per axis: out[2I+a, 2J+b] =
    w(a) w(b) vc[I, J] summed over contributions, identical to scattering
    with the _W weights but with no scatter ops (strided scatter-add is a
    catastrophic slow path on TPU: measured 60 ms vs 0.3 ms per 512^2
    V-cycle transfer).
    '''

    from ..ops.stencil import shift2d
    nzc, nxc = vc.shape[-2:]
    lead = vc.shape[:-2]
    zx = jnp.stack([vc, jnp.zeros_like(vc)], axis=-1)
    zx = zx.reshape(lead + (nzc, 2 * nxc))
    zz = jnp.stack([zx, jnp.zeros_like(zx)], axis=-2)
    zz = zz.reshape(lead + (2 * nzc, 2 * nxc))
    out = zz + 0.5 * (shift2d(zz, 1, 0) + shift2d(zz, -1, 0))
    out = out + 0.5 * (shift2d(out, 0, 1) + shift2d(out, 0, -1))
    return out[..., :nz, :nx]


# --- Pallas fast paths (TPU): dispatched when a (B=1, nz, nx) transfer is
# --- vmapped over an RHS batch, mirroring the stencil-op dispatch pattern.
# --- Further (e.g. frequency) batching falls back to the jnp reference.

def _pallas_transfers_wanted():
    from ..ops.stencil import _pallas_wanted
    return _pallas_wanted()


@jax.custom_batching.custom_vmap
def _restrict_batched(v):
    'Batched restriction (R, nz, nx); Pallas on TPU when eligible.'

    if _pallas_transfers_wanted():
        from ..ops.pallas_transfer import (restrict_pallas_batched,
                                           restrict_pallas_applicable)
        if restrict_pallas_applicable(v):
            return restrict_pallas_batched(v)
    return _restrict_ref(v)


@_restrict_batched.def_vmap
def _restrict_batched_vmap(axis_size, in_batched, v):
    return jax.vmap(_restrict_ref)(v), True


@jax.custom_batching.custom_vmap
def _restrict_example(v):
    'Single-example (B, nz, nx) restriction; batches to the fused kernel.'

    return _restrict_ref(v)


@_restrict_example.def_vmap
def _restrict_example_vmap(axis_size, in_batched, v):
    if v.shape[1] == 1:
        return _restrict_batched(v[:, 0])[:, None], True
    return jax.vmap(_restrict_ref)(v), True


def restrict(v):
    'Full-weighting restriction (see _restrict_ref), with TPU fast path.'

    if v.ndim == 3:
        return _restrict_example(v)
    return _restrict_ref(v)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _prolong_dispatch(nz, nx):
    @jax.custom_batching.custom_vmap
    def batched(vc):
        if _pallas_transfers_wanted():
            from ..ops.pallas_transfer import (prolong_pallas_batched,
                                               prolong_pallas_applicable)
            if prolong_pallas_applicable(vc, nz, nx):
                return prolong_pallas_batched(vc, nz, nx)
        return _prolong_ref(vc, nz, nx)

    @batched.def_vmap
    def _batched_vmap(axis_size, in_batched, vc):
        return jax.vmap(lambda q: _prolong_ref(q, nz, nx))(vc), True

    @jax.custom_batching.custom_vmap
    def example(vc):
        return _prolong_ref(vc, nz, nx)

    @example.def_vmap
    def _example_vmap(axis_size, in_batched, vc):
        if vc.shape[1] == 1:
            return batched(vc[:, 0])[:, None], True
        return jax.vmap(lambda q: _prolong_ref(q, nz, nx))(vc), True

    return example


def prolong(vc, nz, nx):
    'Bilinear prolongation (see _prolong_ref), with TPU fast path.'

    if vc.ndim == 3:
        return _prolong_dispatch(nz, nx)(vc)
    return _prolong_ref(vc, nz, nx)


class MGLevel(NamedTuple):
    planes: Any   # (B, B, 9, nz, nx)
    dinv: Any     # (B, B, nz, nx)
    mask: Any     # (nz, nx) interior mask: 0 on the boundary ring
    linez: Any = None  # precomputed block PCR of the z-line bands
    linex: Any = None  # precomputed block PCR of the x-line bands
                       # (axes swapped); present iff smoother='line'


class MGHierarchy(NamedTuple):
    levels: Any        # tuple of MGLevel, fine -> coarse
    coarse_lu: Any     # LU factors of the coarsest dense operator
    coarse_piv: Any
    coarse_inv: Any = None  # explicit dense inverse (coarse='inv')


def _ring_mask(nz, nx, dtype):
    m = jnp.ones((nz, nx), dtype=dtype)
    m = m.at[0, :].set(0).at[-1, :].set(0)
    m = m.at[:, 0].set(0).at[:, -1].set(0)
    return m


def _mask_ring_planes(planes, mask):
    '''
    The operator diag(m) A diag(m) in stencil space: zero the plane rows on
    the boundary ring and zero every entry that points into the ring.
    The boundary (Dirichlet) rows are decoupled from coarse-grid correction
    this way — they are diagonal rows that the smoother solves exactly, and
    including them in the Galerkin coarse operator mixes +1 identity rows
    with the (oppositely signed) interior rows, which destroys two-grid
    convergence (measured rho(TG) > 1.3 even for the Laplacian).
    '''

    from ..ops.stencil import OFFSETS, shift2d
    B = planes.shape[0]
    out = []
    for i in range(B):
        row = []
        for j in range(B):
            ps = []
            for k, (dz, dx) in enumerate(OFFSETS):
                # mask[p] (row on ring) and mask[p + s] (points into ring)
                ps.append(planes[i, j, k] * mask * shift2d(mask, dz, dx))
            row.append(jnp.stack(ps, axis=0))
        out.append(jnp.stack(row, axis=0))
    return jnp.stack(out, axis=0)


def _fix_empty_rows(planes):
    '''
    Give any all-but-empty row of a Galerkin coarse operator a unit
    diagonal so the coarsest dense/iterative solve stays nonsingular.
    Rows with genuine restricted content (including the coarse boundary
    ring, which receives interior fine equations and whose values the
    interior prolongation uses) are left untouched — clobbering them
    destroys the coarse-grid correction near boundaries.
    '''

    B = planes.shape[0]
    out = planes
    for i in range(B):
        d = out[i, i, 4]
        rowmag = sum(jnp.abs(out[i, j, k])
                     for j in range(B) for k in range(9))
        empty = rowmag < 1e-30
        out = out.at[i, i, 4].set(jnp.where(empty, jnp.ones_like(d), d))
    return out


def _line_pcr_states(planes):
    '''
    Precomputed block cyclic-reduction states of the z-line and x-line
    band splittings of a block operator — the alternating-line smoother's
    tridiagonal factors. The z bands are the (dz in {-1,0,1}, dx=0)
    planes with their TRUE per-point coefficients (not row means); the
    x-line family is the same construction with the grid axes swapped.

    The reduction's clamped block inverses sit close to singular for
    the Eurus TTI bands: at the default 1e-6 clamp the recurrence
    amplifies f32 rounding ~1e5x, enough that the SAME complex64
    computation lands stable on XLA:CPU but unstable on TPU (measured:
    x-line apply differs 1.1e-1 between backends; plain-Jacobi V-cycles
    match at 1e-6, and the TTI solve diverges on TPU only). The clamp
    is therefore a real stability parameter, overridable for
    experiments via ZT_LINE_DELTA.
    '''

    import os as _os
    from .stratified import pcr_precompute_block
    delta = float(_os.environ.get('ZT_LINE_DELTA', 1e-6))
    quant = (None if _os.environ.get('ZT_LINE_QUANT', '1') != '0'
             else False)
    # plane index k = (dz + 1) * 3 + (dx + 1)
    zb = (planes[:, :, 1], planes[:, :, 4], planes[:, :, 7])
    linez = pcr_precompute_block(*zb, delta=delta, quantize=quant)
    if _os.environ.get('ZT_LINE_AXES', 'zx') == 'z':
        # z-lines only: the x-line family's block reduction runs
        # closest to singular (round-5 bisect: its apply differs 1.1e-1
        # between XLA:CPU and TPU where the z family differs 2.8e-3)
        return linez, None
    xb = tuple(jnp.swapaxes(planes[:, :, k], -1, -2) for k in (3, 4, 5))
    return linez, pcr_precompute_block(*xb, delta=delta, quantize=quant)


def build_hierarchy(planes, min_size=16, max_levels=16, coarse='lu',
                    smoother='jacobi', interior_mask=None):
    '''
    Build a multigrid hierarchy from (B, B, 9, nz, nx) planes. Coarsens by
    2x per level until min(nz, nx) <= min_size, then either LU-factorizes
    the coarsest dense operator (coarse='lu') or leaves it matrix-free for
    a fixed-iteration Krylov coarse solve (coarse='iterative' — used on
    backends without a dense LU, and for very large coarsest grids).
    Boundary-ring dofs are excluded from the coarse-grid correction at
    every level (see ``_mask_ring_planes``).

    ``smoother='line'`` (block operators only) precomputes per-level
    alternating z/x line-splitting PCR states: damped block-Jacobi cannot
    damp the strongly-coupled error modes the PML complex stretch creates
    in the Eurus TTI system under velocity contrast (measured: layered
    2:1 TTI at 256^2 stalls at 1e-2 with Jacobi at every tested damping,
    converges in ~200 iterations with alternating line smoothing).

    ``interior_mask`` (optional, (nz, nx) in {0, 1}) marks EXTRA rows to
    exclude from the coarse-grid correction, on top of the boundary
    ring — used by the overlapped-Schwarz slabs, whose Dirichlet-like
    closure rows sit INSIDE the slab rather than on its ring. The mask
    is decimated down the hierarchy (coarse point (I, J) inherits fine
    point (2I, 2J)) so the closure band's coarse images stay excluded
    at EVERY level — leaving them in at level >= 1 re-mixes their
    unit-diagonal rows into deeper Galerkin operators, the same
    sign-mixing two-grid breaker as the ring. Masked rows are still
    smoothed (they are decoupled diagonal rows the smoother solves
    exactly).
    '''

    rdtype = jnp.real(jnp.zeros((), planes.dtype)).dtype
    levels = []
    current = planes
    imask = interior_mask
    for lev in range(max_levels):
        nz, nx = current.shape[-2:]
        mask = _ring_mask(nz, nx, rdtype)
        if imask is not None:
            mask = mask * imask.astype(rdtype)
        dinv = invert_block_diag(block_diag(current))
        linez = linex = None
        if smoother == 'line' and current.shape[0] > 1:
            linez, linex = _line_pcr_states(current)
        levels.append(MGLevel(current, dinv, mask, linez, linex))
        if min(nz, nx) <= min_size:
            break
        masked = _mask_ring_planes(current, mask)
        current = _fix_empty_rows(galerkin_coarsen(masked))
        if imask is not None:
            imask = _strided_gather(imask, 0, 0, _coarse_extent(nz),
                                    _coarse_extent(nx))

    lu, piv, cinv = None, None, None
    if coarse == 'lu':
        dense = planes_to_dense_jax(levels[-1].planes)
        lu, piv = jax.scipy.linalg.lu_factor(dense)
    elif coarse == 'inv':
        # Explicit dense inverse, computed ONCE at prepare time: each
        # coarse solve is then a single (MXU) matmul instead of
        # triangular substitutions or latency-bound micro-Krylov sweeps.
        # This is the production TPU setting: the 'iterative' coarse
        # solve (12 capped BiCGStab iterations) is inaccurate on strongly
        # heterogeneous media, which destroys outer convergence
        # (measured: layered 2:1 contrast at 128^2 diverges under
        # 'iterative' but converges in 77 iterations with an exact
        # coarse solve).
        dense = planes_to_dense_jax(levels[-1].planes)
        # optional Tikhonov regularization of the coarse inverse
        # (ZT_COARSE_REG, relative to the mean diagonal magnitude):
        # the coarsest TTI block operator is near-singular enough that
        # its f32 inverse-apply differs ~9e-2 between XLA:CPU and TPU
        import os as _os
        reg = float(_os.environ.get('ZT_COARSE_REG', 0.0))
        if reg:
            dmag = jnp.mean(jnp.abs(jnp.diagonal(dense)))
            dense = dense + (reg * dmag) * jnp.eye(dense.shape[0],
                                                   dtype=dense.dtype)
        cinv = jnp.linalg.inv(dense)
    return MGHierarchy(tuple(levels), lu, piv, cinv)


#: damping of the alternating-line smoother; 1.0 diverges on layered TTI,
#: 0.6-0.8 both converge with 0.8 fastest (measured at 128^2/256^2)
LINE_OMEGA = 0.8


def _smooth(level, u, b, omega, nsweeps, from_zero=False):
    '''
    Damped smoothing sweeps. (Preconditioner-only: fast apply is OK.)
    Block-Jacobi by default; alternating z/x line sweeps (exact damped
    solves of the tridiagonal band splittings, via precomputed block PCR)
    when the level carries line states. ``from_zero=True`` asserts the
    incoming u is all-zero, enabling the fused from-zero double-sweep
    kernel (saves the u input stream) on the scalar Jacobi path.
    '''

    B = level.planes.shape[0]
    if level.linez is not None:
        from .stratified import pcr_apply_block
        w = LINE_OMEGA

        if level.linex is None:
            def body(i, u):
                r = b - apply_block_stencil_fast(level.planes, u)
                return u + w * pcr_apply_block(level.linez, r)
        else:
            def body(i, u):
                r = b - apply_block_stencil_fast(level.planes, u)
                u = u + w * pcr_apply_block(level.linez, r)
                r = b - apply_block_stencil_fast(level.planes, u)
                du = pcr_apply_block(level.linex,
                                     jnp.swapaxes(r, -1, -2))
                return u + w * jnp.swapaxes(du, -1, -2)
        return lax.fori_loop(0, nsweeps, body, u)
    if B == 1:
        # scalar operator: fused sweeps (apply + diag-inverse + update in
        # one pass; double-sweep Pallas kernels on TPU when vmapped)
        from ..ops.stencil import (jacobi_sweep_fast, jacobi_sweep2_fast,
                                   jacobi_sweep2_zero_fast)
        dinv_eff = omega * level.dinv[0, 0]
        planes00 = level.planes[0, 0]
        bb = b[..., 0, :, :]
        u0 = u[..., 0, :, :]
        remaining = nsweeps
        if from_zero and remaining >= 2:
            u0 = jacobi_sweep2_zero_fast(planes00, dinv_eff, bb)
            remaining -= 2
        while remaining >= 2:
            u0 = jacobi_sweep2_fast(planes00, dinv_eff, bb, u0)
            remaining -= 2
        if remaining:
            u0 = jacobi_sweep_fast(planes00, dinv_eff, bb, u0)
        return u0[..., None, :, :]

    def body(_, u):
        r = b - apply_block_stencil_fast(level.planes, u)
        return u + omega * block_diag_matvec(level.dinv, r)
    return lax.fori_loop(0, nsweeps, body, u)


#: default coarse BiCGStab iteration cap; with the hybrid (spectral + MG)
#: preconditioner the coarse solve barely matters (measured: 4 vs 48
#: iterations leave the outer count unchanged at 512^2), but plain-MG
#: heterogeneous solves still benefit from a moderate cap.
COARSE_ITERS = 12


def _coarse_solve(hier, b, coarse_iters=None):
    lvl = hier.levels[-1]
    if hier.coarse_inv is not None:
        B = b.shape[-3]
        nz, nx = b.shape[-2:]
        # explicit precision: complex matmuls hit the MXU at bfloat16
        # default precision on TPU
        x = jnp.matmul(hier.coarse_inv, b.reshape(-1),
                       precision=lax.Precision.HIGHEST)
        return x.reshape(B, nz, nx)
    if hier.coarse_lu is None:
        # Matrix-free coarse solve: fixed-iteration block-Jacobi-
        # preconditioned BiCGStab on the coarsest operator.
        from .krylov import bicgstab

        def mv(x):
            return apply_block_stencil(lvl.planes, x)

        def M(r):
            return block_diag_matvec(lvl.dinv, r)

        iters = COARSE_ITERS if coarse_iters is None else coarse_iters
        return bicgstab(mv, b, M=M, tol=1e-8, maxiter=iters).x

    B = b.shape[-3]
    nz, nx = b.shape[-2:]
    x = jax.scipy.linalg.lu_solve((hier.coarse_lu, hier.coarse_piv),
                                  b.reshape(-1))
    return x.reshape(B, nz, nx)


def presmooth_residual(lvl, b, omega, nu1):
    '''
    The V-cycle fine-level downstroke: nu1 damped-Jacobi sweeps from
    zero plus the masked residual of the smoothed iterate,
    (u, mask * (b - A u)). For scalar operators at nu1=2 this runs as
    ONE fused Pallas pass on TPU (sweep kernel + residual kernel would
    round-trip the iterate through HBM twice).
    '''

    B = lvl.planes.shape[0]
    if B == 1 and nu1 == 2:
        from ..ops.stencil import presmooth2_residual_fast
        u0, resm = presmooth2_residual_fast(
            lvl.planes[0, 0], omega * lvl.dinv[0, 0], lvl.mask,
            b[..., 0, :, :])
        return u0[..., None, :, :], resm[..., None, :, :]
    u = jnp.zeros_like(b)
    u = _smooth(lvl, u, b, omega, nu1, from_zero=True)
    r = b - apply_block_stencil_fast(lvl.planes, u)
    return u, lvl.mask * r


def presmooth_restrict(lvl, b, omega, nu1):
    '''
    The complete downstroke INCLUDING the transfer: (u, restrict(resm)).
    For scalar operators at nu1=2 the sweeps, masked residual and
    full-weighting restriction run as ONE fused Pallas pass on TPU (the
    restriction rides the kernel as banded MXU matmuls on the halo-1
    residual block, saving the residual's HBM round-trip and a kernel
    launch).
    '''

    B = lvl.planes.shape[0]
    if B == 1 and nu1 in (1, 2) and lvl.linez is None:
        from ..ops.stencil import (presmooth2_restrict_fast,
                                   presmooth1_restrict_fast)
        fast = (presmooth2_restrict_fast if nu1 == 2
                else presmooth1_restrict_fast)
        u0, rc = fast(lvl.planes[0, 0], omega * lvl.dinv[0, 0],
                      lvl.mask, b[..., 0, :, :])
        return u0[..., None, :, :], rc[..., None, :, :]
    u, rm = presmooth_residual(lvl, b, omega, nu1)
    return u, restrict(rm)


def prolong_add_smooth(lvl, u, b, ec, omega, nu2):
    '''
    The V-cycle upstroke: u + mask * prolong(ec), then nu2 damped
    post-smoothing sweeps. For scalar operators with nu2 >= 1 the
    prolongation, masked add and FIRST sweep run as one fused Pallas
    pass on TPU (separate kernels would round-trip the corrected
    iterate and the prolonged field through HBM twice).
    '''

    nz, nx = b.shape[-2:]
    B = lvl.planes.shape[0]
    if B == 1 and nu2 >= 1 and lvl.linez is None:
        from ..ops.stencil import (prolong_add_smooth_fast,
                                   jacobi_sweep_fast, jacobi_sweep2_fast)
        dinv_eff = omega * lvl.dinv[0, 0]
        planes00 = lvl.planes[0, 0]
        bb = b[..., 0, :, :]
        u0 = prolong_add_smooth_fast(planes00, dinv_eff, lvl.mask, bb,
                                     u[..., 0, :, :], ec[..., 0, :, :])
        remaining = nu2 - 1
        while remaining >= 2:
            u0 = jacobi_sweep2_fast(planes00, dinv_eff, bb, u0)
            remaining -= 2
        if remaining:
            u0 = jacobi_sweep_fast(planes00, dinv_eff, bb, u0)
        return u0[..., None, :, :]
    u = u + lvl.mask * prolong(ec, nz, nx)
    return _smooth(lvl, u, b, omega, nu2)


def v_cycle(hier, b, omega=0.6, nu1=2, nu2=2, level=0, coarse_iters=None):
    '''
    One multigrid V-cycle for the (shifted) operator; returns an
    approximate solution of A x = b with zero initial guess.
    b has shape (B, nz, nx).
    '''

    lvl = hier.levels[level]
    if level == len(hier.levels) - 1:
        return _coarse_solve(hier, b, coarse_iters)

    u, rc = presmooth_restrict(lvl, b, omega, nu1)
    ec = v_cycle(hier, rc, omega, nu1, nu2, level + 1, coarse_iters)
    return prolong_add_smooth(lvl, u, b, ec, omega, nu2)


def transpose_hierarchy(hier):
    '''
    Hierarchy for the transposed operator. Since R = (1/4) P^T, the Galerkin
    coarse operator of A^T equals the transpose of the coarse operator of A,
    so each level's planes are simply block-transposed; the coarsest dense
    LU is re-factorized from the transposed planes.
    '''

    levels = []
    for lvl in hier.levels:
        planesT = stencil.transpose_block_planes(lvl.planes)
        linez = linex = None
        if lvl.linez is not None:
            linez, linex = _line_pcr_states(planesT)
        levels.append(MGLevel(planesT,
                              invert_block_diag(block_diag(planesT)),
                              lvl.mask, linez, linex))
    lu, piv, cinv = None, None, None
    if hier.coarse_inv is not None:
        # inverse of the transpose is the transpose of the inverse
        cinv = hier.coarse_inv.T
    elif hier.coarse_lu is not None:
        dense = planes_to_dense_jax(levels[-1].planes)
        lu, piv = jax.scipy.linalg.lu_factor(dense)
    return MGHierarchy(tuple(levels), lu, piv, cinv)
