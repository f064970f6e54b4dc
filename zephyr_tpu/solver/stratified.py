'''
Stratified (depth-varying) spectral interior solve for the hybrid
Helmholtz preconditioner.

The 2D spectral component of the hybrid preconditioner inverts the MEAN
interior symbol, which degrades badly on media with strong vertical
structure (layered / Marmousi-style models: measured ~230 outer
iterations at 512^2 vs ~20 homogeneous). This module keeps the full
z-dependence instead: take per-ROW mean stencil coefficients over an
interior x-window, FFT in x only, and solve, for every cross-line
wavenumber kx, the resulting TRIDIAGONAL system in z exactly:

    T(kx)[z] x[z-1..z+1] = r_hat[z],
    T_dz(z, kx) = sum_dx c[(dz,dx)](z) e^{i kx dx}.

This is exact (in the interior) for ANY depth-varying medium — including
the z-PML frame rows, whose coefficients vary only with z — and reduces
to the constant-symbol solve for homogeneous media.

The tridiagonal solves use parallel cyclic reduction (PCR): ~log2(nz)
elementwise sweeps, fully vectorized over kx and the RHS batch — the
TPU-native alternative to the sequential Thomas algorithm. No scans, no
scatters.

Reference context: replaces/augments the interior symbol inverse of
zephyr_tpu.solver.helmholtz._fft_symbol_inverse; the reference package
has no preconditioner at all (sparse direct LU, reference
zephyr/backend/discretization.py:79-85).
'''

from typing import NamedTuple, Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


class StratPCR(NamedTuple):
    '''
    Precomputed cyclic-reduction state of the stratified tridiagonal
    family. The reduction recurrences on (l, d, u) are RHS-independent,
    so they are run ONCE at operator-preparation time; each application
    then only sweeps the right-hand side: b += alpha_s b[z-s] +
    gamma_s b[z+s] per level, then x = b * dinv. Measured on v5e at
    1024^2 x 16 this removes the coefficient-side traffic (~60%% of the
    on-the-fly PCR cost).

    On the complex64 (production TPU) path the factors are stored as
    bfloat16 re/im pairs — an extra leading axis of size 2 — halving
    the factor stream, which dominates the apply's HBM traffic
    (~log2(nz) factor planes per field plane). Measured: iteration
    counts UNCHANGED to 3 digits of the final residual (the factors are
    preconditioner-internal; quantization only perturbs M slightly).
    complex128 operators keep full-precision factors.
    '''

    alphas: Any   # (nsteps, nz, nx) complex, or (nsteps, 2, nz, nx) bf16
    gammas: Any   # like alphas
    dinv: Any     # (nz, nx) clamped inverse of the fully reduced
                  # diagonal, or (2, nz, nx) bf16
    ldu: Any      # (3, nz, nx) original coefficients (transpose path;
                  # always full precision)
    dft: Any = None   # optional (F, Fi) DFT matrix pair (each (w, w)
                      # complex, symmetric): when present the x
                      # transforms run as MXU matmuls instead of
                      # jnp.fft — XLA's TPU FFT is latency-bound at the
                      # production widths (measured 8.7 ms per
                      # fft+ifft of (16, 1024, 1024) c64 = 62 GB/s on
                      # v5e, vs ~69 GFLOP of DFT matmul work that the
                      # MXU turns over in ~2 ms)


def _pack_bf16(x):
    '(...,) complex -> (2, ...) bfloat16 re/im pair.'
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=0).astype(
        jnp.bfloat16)


def _unpack_bf16(p, cdtype):
    '(2, ...) bfloat16 -> complex (upcast fuses into the consumer).'
    return lax.complex(p[0].astype(jnp.float32),
                       p[1].astype(jnp.float32)).astype(cdtype)


def _shift_z(a, s):
    'a[..., z + s, :] with zero fill outside; shift along axis -2.'

    nz = a.shape[-2]
    if s == 0:
        return a
    pad = [(0, 0)] * (a.ndim - 2) + [(abs(s), abs(s)), (0, 0)]
    ap = jnp.pad(a, pad)
    start = abs(s) + s
    return lax.slice_in_dim(ap, start, start + nz, axis=a.ndim - 2)


def _pcr_nsteps(nz):
    return max(1, int(np.ceil(np.log2(max(nz, 2)))))


def _safe_inv(x, delta):
    '''
    Magnitude-clamped reciprocal: entries below ``delta * max|x|``
    (including the exact zeros produced by out-of-range shifts) are
    replaced by the clamp value with their phase preserved, so the
    inverse stays finite and 0 * inv products stay 0.
    '''

    a = jnp.abs(x)
    dmin = delta * jnp.max(a)
    tiny = jnp.finfo(a.dtype).tiny
    phase = jnp.where(a > 0, x / jnp.maximum(a, tiny).astype(x.dtype),
                      jnp.ones((), x.dtype))
    xs = jnp.where(a < dmin, dmin.astype(x.dtype) * phase, x)
    return 1.0 / xs


def _pcr_levels(l, d, u, delta):
    '''
    The RHS-independent cyclic-reduction recurrence — THE single source
    of truth for the scalar PCR arithmetic (clamping included), shared
    by the on-the-fly solve and the precomputed fast path. Returns
    (alphas, gammas) per level and the final reduced diagonal inverse.
    '''

    alphas, gammas = [], []
    s = 1
    for _ in range(_pcr_nsteps(d.shape[-2])):
        alpha = -l * _safe_inv(_shift_z(d, -s), delta)
        gamma = -u * _safe_inv(_shift_z(d, +s), delta)
        l_new = alpha * _shift_z(l, -s)
        u_new = gamma * _shift_z(u, +s)
        d_new = d + alpha * _shift_z(u, -s) + gamma * _shift_z(l, +s)
        alphas.append(alpha)
        gammas.append(gamma)
        l, d, u = l_new, d_new, u_new
        s *= 2
    return alphas, gammas, _safe_inv(d, delta)


def _pcr_sweep_rhs(alphas, gammas, dinv, b):
    'RHS-only reduction sweep with per-level (alpha, gamma) factors.'

    s = 1
    for alpha, gamma in zip(alphas, gammas):
        b = b + alpha * _shift_z(b, -s) + gamma * _shift_z(b, +s)
        s *= 2
    return b * dinv


def tridiag_pcr_solve(l, d, u, b, delta=1e-6):
    '''
    Solve tridiagonal systems T x = b along axis -2, batched over every
    other axis: T x[z] = l[z] x[z-1] + d[z] x[z] + u[z] x[z+1].

    l, d, u: (nz, nx) complex; b: (..., nz, nx) complex (the same
    coefficient arrays apply across the leading batch axes).

    Parallel cyclic reduction: ceil(log2 nz) sweeps; after the last sweep
    every equation involves only its own unknown and x = b / d. Divisions
    are magnitude-clamped at ``delta`` times the running max |d| so
    near-resonant (z, kx) pairs stay bounded (the caller applies a
    complex shift, so true zeros do not occur).
    '''

    return _pcr_sweep_rhs(*_pcr_levels(l, d, u, delta), b)


def dft_mats(w, dtype=jnp.complex64):
    '''
    Symmetric DFT matrix pair (F, Fi) of width ``w``: F[x, k] =
    exp(-2 pi i x k / w), Fi = conj(F) / w. ``r @ F`` along the last
    axis equals ``jnp.fft.fft(r, axis=-1)`` (and Fi the inverse); both
    matrices are symmetric, so the algebraic-transpose path reuses them
    unchanged.
    '''

    x = jnp.arange(w)
    phase = (-2j * jnp.pi / w) * (x[:, None] * x[None, :])
    F = jnp.exp(phase.astype(dtype))
    return F, jnp.conj(F) / w


def _dft_apply(r, M):
    'Contraction of the last axis with a DFT matrix, on the MXU.'

    return jnp.matmul(r, M, precision=lax.Precision.HIGHEST)


def pcr_precompute(l, d, u, delta=1e-6, quantize=None, dft=None):
    '''
    Run the RHS-independent part of the cyclic reduction once, returning
    a StratPCR whose per-level (alpha, gamma) arrays drive the fast
    ``pcr_apply`` sweep. Identical arithmetic (and clamping) to
    ``tridiag_pcr_solve`` — both run ``_pcr_levels``. ``quantize``
    (default: on for complex64 operators) stores the factors as bf16
    re/im pairs — see StratPCR. ``dft`` (width int or True) attaches
    the DFT matrix pair so the apply's x transforms run on the MXU.
    '''

    ldu = jnp.stack([l, d, u], axis=0)
    alphas, gammas, dinv = _pcr_levels(l, d, u, delta)
    alphas = jnp.stack(alphas, 0)
    gammas = jnp.stack(gammas, 0)
    if quantize is None:
        quantize = d.dtype == jnp.complex64
    if quantize:
        # pack per level: (nsteps, 2, nz, nx)
        alphas = jnp.swapaxes(_pack_bf16(alphas), 0, 1)
        gammas = jnp.swapaxes(_pack_bf16(gammas), 0, 1)
        dinv = _pack_bf16(dinv)
    mats = None
    if dft:
        w = d.shape[-1] if dft is True else int(dft)
        mats = dft_mats(w, d.dtype)
    return StratPCR(alphas, gammas, dinv, ldu, mats)


def _pcr_sweep_bf16_jnp(alphas, gammas, dinv, b):
    'Per-level unpacked bf16 sweep (the jnp reference path).'

    s = 1
    for i in range(alphas.shape[0]):
        a = _unpack_bf16(alphas[i], b.dtype)
        g = _unpack_bf16(gammas[i], b.dtype)
        b = b + a * _shift_z(b, -s) + g * _shift_z(b, +s)
        s *= 2
    return b * _unpack_bf16(dinv, b.dtype)


@jax.custom_batching.custom_vmap
def _pcr_sweep_bf16(alphas, gammas, dinv, b):
    '''
    bf16-packed sweep of ONE field (nz, nx); under vmap (the solver's
    RHS batch) dispatches to the fused Pallas kernel, which keeps the
    field VMEM-resident across all reduction levels instead of paying
    one HBM round-trip per level (ops/pallas_pcr.py) — the single
    largest preconditioner stream at production sizes.
    '''

    return _pcr_sweep_bf16_jnp(alphas, gammas, dinv, b)


@_pcr_sweep_bf16.def_vmap
def _pcr_sweep_bf16_vmap(axis_size, in_batched, alphas, gammas, dinv, b):
    import os as _os
    from ..ops.stencil import _pallas_wanted
    ab, gb, db, bb = in_batched
    if bb and not (ab or gb or db) and _pallas_wanted():
        # 'rb' (default): whole-batch column programs with the factor
        # stack VMEM-resident — one program per column block instead of
        # one per (column, RHS), removing both the per-program dispatch
        # latency and the R-fold redundant factor re-fetch.
        # 'grid' keeps the per-RHS-program kernel for experiments.
        which = _os.environ.get('ZT_PCR_KERNEL', 'rb')
        if which == 'rb':
            from ..ops.pallas_pcr import (pcr_sweep_pallas_rb,
                                          pcr_rb_applicable)
            if pcr_rb_applicable(alphas, dinv, b):
                return pcr_sweep_pallas_rb(alphas, gammas, dinv, b), True
        if which in ('rb', 'grid'):
            from ..ops.pallas_pcr import (pcr_sweep_pallas,
                                          pcr_pallas_applicable)
            if pcr_pallas_applicable(alphas, dinv, b):
                return pcr_sweep_pallas(alphas, gammas, dinv, b), True
    fn = jax.vmap(_pcr_sweep_bf16_jnp,
                  in_axes=(0 if ab else None, 0 if gb else None,
                           0 if db else None, 0 if bb else None))
    return fn(alphas, gammas, dinv, b), True


def pcr_apply(pcr, b):
    'RHS-only cyclic-reduction sweep with precomputed levels.'

    if pcr.alphas.dtype == jnp.bfloat16:
        if b.ndim >= 2 and b.shape[-2:] == pcr.ldu.shape[-2:]:
            # route through the custom-vmap boundary on the trailing
            # field so the solver's RHS batch reaches the fused kernel
            lead = b.shape[:-2]
            if len(lead) == 0:
                return _pcr_sweep_bf16(pcr.alphas, pcr.gammas, pcr.dinv,
                                       b)
            if len(lead) == 1 and lead[0] == 1:
                return _pcr_sweep_bf16(pcr.alphas, pcr.gammas, pcr.dinv,
                                       b[0])[None]
        return _pcr_sweep_bf16_jnp(pcr.alphas, pcr.gammas, pcr.dinv, b)
    return _pcr_sweep_rhs(pcr.alphas, pcr.gammas, pcr.dinv, b)


# ---------------------------------------------------------------------------
# Block (B = 2) variant: the Eurus TTI system is a 2x2 block operator
# (reference zephyr/backend/eurus.py:430-464); its stratified interior
# solve is a block-tridiagonal family per kx, reduced by the same cyclic
# reduction with pointwise 2x2 block inverses.
# ---------------------------------------------------------------------------


def _bmul(A, B):
    '2x2 block product: (2, 2, ...) x (2, 2, ...) pointwise over trailing.'

    rows = []
    for i in range(2):
        rows.append(jnp.stack([A[i, 0] * B[0, j] + A[i, 1] * B[1, j]
                               for j in range(2)], axis=0))
    return jnp.stack(rows, axis=0)


def _bmatvec(A, x):
    '2x2 block times block vector: (2, 2, ...) x (..., 2, nz, nx).'

    out0 = A[0, 0] * x[..., 0, :, :] + A[0, 1] * x[..., 1, :, :]
    out1 = A[1, 0] * x[..., 0, :, :] + A[1, 1] * x[..., 1, :, :]
    return jnp.stack([out0, out1], axis=-3)


def _binv(D, delta):
    '2x2 block inverse with det magnitude-clamped at delta * max|det|.'

    a, b = D[0, 0], D[0, 1]
    c, d = D[1, 0], D[1, 1]
    det = a * d - b * c
    mag = jnp.abs(det)
    dmin = delta * jnp.max(mag)
    tiny = jnp.finfo(mag.dtype).tiny
    phase = jnp.where(mag > 0,
                      det / jnp.maximum(mag, tiny).astype(det.dtype),
                      jnp.ones((), det.dtype))
    det_s = jnp.where(mag < dmin, dmin.astype(det.dtype) * phase, det)
    inv = jnp.stack([jnp.stack([d, -b], 0), jnp.stack([-c, a], 0)], 0)
    return inv / det_s


def _bshift(A, s):
    'Shift 2x2 block coefficient arrays (2, 2, nz, nx) along z.'
    return _shift_z(A, s)


def _bcap(A, cap):
    '''
    Magnitude cap of a 2x2 block field: rescale any block whose
    Frobenius norm exceeds ``cap`` down to it. The block cyclic
    reduction is not growth-bounded for the non-diagonally-dominant
    Eurus TTI bands — the reduction factors can amplify f32 rounding
    until norms overflow, and the SAME complex64 recurrence lands
    stable on XLA:CPU but NaN-diverges on TPU (round-5 bisect: x-line
    apply differs 1.1e-1 between backends). The cap bounds the
    amplification; the result is still an exact solve wherever the
    factors were within range, and a preconditioner everywhere else.
    '''

    if not cap:
        return A
    nrm = jnp.sqrt(sum(jnp.abs(A[i, j]) ** 2
                       for i in range(2) for j in range(2)))
    scale = jnp.minimum(1.0, cap / jnp.maximum(nrm, 1e-30))
    return A * scale.astype(A.dtype)[None, None]


def _pcr_levels_block(L, D, U, delta, cap=None):
    '''
    RHS-independent block cyclic-reduction recurrence — the single
    source of truth for the block PCR arithmetic, shared by the
    on-the-fly solve and the precomputed fast path. ``cap`` (default:
    ZT_PCR_BLOCK_CAP env, 0 = off) bounds the per-level reduction
    factors — see _bcap.
    '''

    import os as _os
    if cap is None:
        cap = float(_os.environ.get('ZT_PCR_BLOCK_CAP', 0.0))
    alphas, gammas = [], []
    s = 1
    for _ in range(_pcr_nsteps(D.shape[-2])):
        alpha = _bcap(_bmul(-L, _binv(_bshift(D, -s), delta)), cap)
        gamma = _bcap(_bmul(-U, _binv(_bshift(D, +s), delta)), cap)
        L_new = _bmul(alpha, _bshift(L, -s))
        U_new = _bmul(gamma, _bshift(U, +s))
        D_new = D + _bmul(alpha, _bshift(U, -s)) \
            + _bmul(gamma, _bshift(L, +s))
        alphas.append(alpha)
        gammas.append(gamma)
        L, D, U = L_new, D_new, U_new
        s *= 2
    return alphas, gammas, _binv(D, delta)


def _pcr_sweep_rhs_block(alphas, gammas, dinv, b):
    'RHS-only block reduction sweep with per-level factors.'

    s = 1
    for alpha, gamma in zip(alphas, gammas):
        b = b + _bmatvec(alpha, _shift_z(b, -s)) \
            + _bmatvec(gamma, _shift_z(b, +s))
        s *= 2
    return _bmatvec(dinv, b)


def block_tridiag_pcr_solve(L, D, U, b, delta=1e-6):
    '''
    Solve block-tridiagonal systems (2x2 blocks) along axis -2 of the
    block fields: T x[z] = L[z] x[z-1] + D[z] x[z] + U[z] x[z+1].

    L, D, U: (2, 2, nz, nx); b: (..., 2, nz, nx). Same parallel cyclic
    reduction as the scalar path, with pointwise block inverses.
    '''

    return _pcr_sweep_rhs_block(*_pcr_levels_block(L, D, U, delta), b)


class StratPCRBlock(NamedTuple):
    'Precomputed block cyclic-reduction state (B = 2).'

    alphas: Any   # (nsteps, 2, 2, nz, nx)
    gammas: Any
    dinv: Any     # (2, 2, nz, nx)
    ldu: Any      # (3, 2, 2, nz, nx)


def pcr_precompute_block(L, D, U, delta=1e-6, quantize=None):
    '''
    RHS-independent block reduction, run once at prepare time. Identical
    arithmetic to ``block_tridiag_pcr_solve`` — both run
    ``_pcr_levels_block``. Factors are bf16-packed on the complex64
    path (see StratPCR).
    '''

    ldu = jnp.stack([L, D, U], axis=0)
    alphas, gammas, dinv = _pcr_levels_block(L, D, U, delta)
    alphas = jnp.stack(alphas, 0)
    gammas = jnp.stack(gammas, 0)
    if quantize is None:
        quantize = D.dtype == jnp.complex64
    if quantize:
        # pack per level: (nsteps, 2, 2, 2, nz, nx), re/im axis second
        alphas = jnp.swapaxes(_pack_bf16(alphas), 0, 1)
        gammas = jnp.swapaxes(_pack_bf16(gammas), 0, 1)
        dinv = _pack_bf16(dinv)
    return StratPCRBlock(alphas, gammas, dinv, ldu)


def pcr_apply_block(pcr, b):
    'RHS-only block cyclic-reduction sweep with precomputed levels.'

    if pcr.alphas.dtype == jnp.bfloat16:
        s = 1
        for i in range(pcr.alphas.shape[0]):
            a = _unpack_bf16(pcr.alphas[i], b.dtype)
            g = _unpack_bf16(pcr.gammas[i], b.dtype)
            b = b + _bmatvec(a, _shift_z(b, -s)) \
                + _bmatvec(g, _shift_z(b, +s))
            s *= 2
        return _bmatvec(_unpack_bf16(pcr.dinv, b.dtype), b)
    return _pcr_sweep_rhs_block(pcr.alphas, pcr.gammas, pcr.dinv, b)


def _block_transpose(A):
    'Transpose the 2x2 block structure: out[i, j] = A[j, i].'
    return jnp.stack([jnp.stack([A[0, 0], A[1, 0]], 0),
                      jnp.stack([A[0, 1], A[1, 1]], 0)], 0)


def transpose_strat_block(ldu):
    '''
    Block-tridiagonal transpose: L_T(z) = U(z-1)^T, D_T = D^T,
    U_T(z) = L(z+1)^T (block transposes throughout).
    '''

    L, D, U = ldu[0], ldu[1], ldu[2]
    return (_block_transpose(_bshift(U, -1)), _block_transpose(D),
            _block_transpose(_bshift(L, +1)))


def stratified_coeffs_block(planes, precond_planes, shift, fft_shift):
    '''
    Per-row mean coefficients of a B = 2 block operator at the spectral
    CSLP shift: returns (L, D, U), each (2, 2, nz, nx) complex — the
    block-tridiagonal family over cross-line wavenumber kx.
    '''

    assert planes.shape[0] == 2, 'block stratified: B = 2 only'
    c0 = _per_row_mean(planes)            # (2, 2, 9, nz)
    cP = _per_row_mean(precond_planes)
    shift = jnp.asarray(shift, dtype=c0.dtype)
    cM = (c0 - cP) / shift

    if isinstance(fft_shift, str):  # 'auto': damped setting for blocks
        fft_shift = 0.25j
    cF = c0 - jnp.asarray(fft_shift).astype(c0.dtype) * cM

    nx = planes.shape[-1]
    kx = (2 * jnp.pi) * jnp.fft.fftfreq(nx).astype(jnp.real(c0).dtype)
    bands = []
    for dz in (-1, 0, 1):
        acc = None
        for dx in (-1, 0, 1):
            k = (dz + 1) * 3 + (dx + 1)
            phase = jnp.exp(1j * kx * dx).astype(c0.dtype)   # (nx,)
            term = cF[:, :, k, :, None] * phase[None, None, None, :]
            acc = term if acc is None else acc + term
        bands.append(acc)                 # (2, 2, nz, nx)
    return tuple(bands)


def stratified_apply_block(strat, r, transpose=False, delta=1e-6):
    '''
    Apply the block stratified interior inverse to (..., 2, nz, nx).
    ``strat`` is a StratPCRBlock (fast forward path) or an (L, D, U)
    triple; the transpose path reduces on the fly.
    '''

    pre = isinstance(strat, StratPCRBlock)
    if transpose:
        ldu = strat.ldu if pre else jnp.stack(list(strat), axis=0)
        L, D, U = transpose_strat_block(ldu)
        rhat = jnp.fft.ifft(r, axis=-1)
        xhat = block_tridiag_pcr_solve(L, D, U, rhat, delta=delta)
        return jnp.fft.fft(xhat, axis=-1)
    rhat = jnp.fft.fft(r, axis=-1)
    if pre:
        xhat = pcr_apply_block(strat, rhat)
    else:
        L, D, U = strat
        xhat = block_tridiag_pcr_solve(L, D, U, rhat, delta=delta)
    return jnp.fft.ifft(xhat, axis=-1)


def _per_row_mean(planes):
    '''
    Per-row mean stencil coefficients over the interior x-window
    (B, B, 9, nz, nx) -> (B, B, 9, nz): all z rows retained (the z-PML
    frame varies only with z and is captured exactly), x-PML columns
    excluded by the central-half window.
    '''

    nx = planes.shape[-1]
    x0, x1 = nx // 4, max(nx // 4 + 1, (3 * nx) // 4)
    return jnp.mean(planes[..., x0:x1], axis=-1)


def stratified_coeffs(planes, precond_planes, shift, fft_shift,
                      contrast_threshold=1.05):
    '''
    Build the (l, d, u) tridiagonal coefficient arrays of the stratified
    interior operator at the spectral CSLP shift, for a SCALAR (B=1)
    operator.

    Follows the same shift algebra as the 2D symbol: with per-row true
    coefficients c0(z) and ``shift``-shifted coefficients cP(z), the mass
    part is cM = (c0 - cP) / shift and the spectral-shift operator is
    cF = c0 - fft_shift * cM.

    fft_shift may be 'auto': the damping is chosen from the CROSS-ROW
    residual contrast of the mass plane (row means removed) — for
    depth-only media the rows are exact, so the small near-homogeneous
    shift applies; x-varying media get the damped setting.

    Returns (l, d, u), each (nz, nx) complex.
    '''

    assert planes.shape[0] == 1, 'stratified solve: scalar operators only'
    c0 = _per_row_mean(planes)[0, 0]           # (9, nz)
    cP = _per_row_mean(precond_planes)[0, 0]
    shift = jnp.asarray(shift, dtype=c0.dtype)
    cM = (c0 - cP) / shift

    if isinstance(fft_shift, str):  # 'auto'
        from ..ops.stencil import CENTER
        nz, nx = planes.shape[-2:]
        z0, z1 = nz // 4, max(nz // 4 + 1, (3 * nz) // 4)
        x0, x1 = nx // 4, max(nx // 4 + 1, (3 * nx) // 4)
        mass = (planes[0, 0, CENTER, z0:z1, x0:x1]
                - precond_planes[0, 0, CENTER, z0:z1, x0:x1]) / shift
        # per-row normalized contrast: how much the medium varies WITHIN
        # rows (the per-row solve already captures cross-row variation)
        ma = jnp.abs(mass)
        tiny = jnp.finfo(ma.dtype).tiny
        row_mean = jnp.maximum(jnp.mean(ma, axis=-1, keepdims=True), tiny)
        man = ma / row_mean
        contrast = jnp.sqrt(jnp.max(man) / jnp.maximum(jnp.min(man), tiny))
        fft_shift = jnp.where(contrast < contrast_threshold, 0.03, 0.25) \
            * 1j
    cF = c0 - jnp.asarray(fft_shift).astype(c0.dtype) * cM   # (9, nz)

    nx = planes.shape[-1]
    kx = (2 * jnp.pi) * jnp.fft.fftfreq(nx).astype(jnp.real(c0).dtype)
    bands = []
    for dz in (-1, 0, 1):
        acc = None
        for dx in (-1, 0, 1):
            k = (dz + 1) * 3 + (dx + 1)
            phase = jnp.exp(1j * kx * dx).astype(c0.dtype)   # (nx,)
            term = cF[k][:, None] * phase[None, :]
            acc = term if acc is None else acc + term
        bands.append(acc)                                     # (nz, nx)
    return tuple(bands)   # (l, d, u)


# ---------------------------------------------------------------------------
# x-panelled stratification: the per-row mean misses LATERAL velocity
# structure (Marmousi-style media measured ~200+ outer iterations at
# 512^2 where layered media run ~40). Partition x into ``npanels``
# overlapping panels blended by a partition of unity; per panel, take
# per-row means over ITS x-window, solve per-panel x-FFT + z-PCR, and
# scatter-add the weighted panel solutions. Captures piecewise-lateral
# trends at ~(1 + 2 P overlap / nx) the cost of the global solve. The
# panels concatenate along x, so the PCR machinery applies unchanged.
# ---------------------------------------------------------------------------


def panel_layout(nx, npanels, overlap):
    '''
    Static panel windows: cores of width C = nx // npanels (the last
    core absorbs the remainder), each window extended by ``overlap`` on
    both sides and clamped to the domain; all windows share one width W
    (static shapes). Returns (starts tuple, W).
    '''

    C = nx // npanels
    W = min(nx, C + (nx - C * (npanels - 1)) % max(C, 1) + 2 * overlap)
    starts = []
    for p in range(npanels):
        s = p * C - overlap
        starts.append(max(0, min(s, nx - W)))
    # the last window must reach the domain edge: for degenerate
    # configs (tiny nx vs npanels/overlap) the shared width W can
    # otherwise leave tail columns uncovered, silently zeroing them in
    # the preconditioner (singular M)
    starts[-1] = nx - W
    covered = np.zeros(nx, bool)
    for s in starts:
        covered[s:s + W] = True
    assert covered.all(), \
        'panel_layout: nx=%d npanels=%d overlap=%d leaves columns ' \
        'uncovered' % (nx, npanels, overlap)
    return tuple(starts), W


def panel_weights(nx, npanels, overlap, dtype=np.float32):
    '''
    Partition-of-unity blend weights, (P, W): tent ramps of length
    ``overlap`` at interior panel edges, flat elsewhere, normalized so
    the pointwise sum over panels is exactly 1 everywhere.
    '''

    starts, W = panel_layout(nx, npanels, overlap)
    ramp = max(overlap, 1)
    w = np.zeros((npanels, nx), np.float64)
    for p, s in enumerate(starts):
        x = np.arange(s, s + W)
        up = np.minimum(1.0, (x - s + 1) / ramp)
        dn = np.minimum(1.0, (s + W - x) / ramp)
        w[p, s:s + W] = np.minimum(up, dn)
    # pointwise normalization: interior overlaps blend 50/50 at panel
    # joins; cells covered by a single panel (incl. the domain edges,
    # where the tent would otherwise taper against nothing) get 1.
    # Coverage is an invariant (panel_layout asserts it), so the column
    # sums are bounded away from zero — check rather than clamp, so a
    # layout bug fails loudly instead of silently zeroing columns.
    colsum = w.sum(axis=0, keepdims=True)
    assert colsum.min() > 1.0 / max(overlap, 1) - 1e-9, \
        'panel_weights: coverage hole (min column weight %g)' \
        % colsum.min()
    w /= colsum
    out = np.zeros((npanels, W), np.float64)
    for p, s in enumerate(starts):
        out[p] = w[p, s:s + W]
    return out.astype(dtype)


def stratified_coeffs_panels(planes, precond_planes, shift, fft_shift,
                             npanels, overlap, dst=False):
    '''
    Per-panel stratified tridiagonal coefficients for a scalar operator:
    (l, d, u), each (nz, P * W) — panel p occupies columns [p*W, (p+1)*W)
    — plus per-panel kx built from the panel width W. The 'auto'
    fft_shift resolves PER PANEL from the within-panel row-residual
    contrast, so locally-layered panels get the tight shift.

    With ``dst=True`` the kx grid doubles to 2W (the zero-Dirichlet
    odd-extension solve of ``stratified_apply_panels(taper='dst')``),
    so the returned bands are (nz, P * 2W).
    '''

    assert planes.shape[0] == 1, 'panel stratified: scalar operators only'
    nz, nx = planes.shape[-2:]
    starts, W = panel_layout(nx, npanels, overlap)
    # interior x-columns for the mean (exclude the x-PML frames)
    xlo, xhi = nx // 8, nx - nx // 8

    kx = (2 * jnp.pi) * jnp.fft.fftfreq(2 * W if dst else W).astype(
        jnp.real(planes).dtype)
    shift = jnp.asarray(shift, dtype=planes.dtype)

    bands_all = [[], [], []]
    for s in starts:
        a, b = max(s, xlo), min(s + W, xhi)
        if b <= a:          # panel fully inside a PML frame: use window
            a, b = s, s + W
        c0 = jnp.mean(planes[0, 0, :, :, a:b], axis=-1)          # (9, nz)
        cP = jnp.mean(precond_planes[0, 0, :, :, a:b], axis=-1)
        cM = (c0 - cP) / shift

        fshift = fft_shift
        if isinstance(fshift, str):  # 'auto', per panel
            from ..ops.stencil import CENTER
            z0, z1 = nz // 4, max(nz // 4 + 1, (3 * nz) // 4)
            mass = (planes[0, 0, CENTER, z0:z1, a:b]
                    - precond_planes[0, 0, CENTER, z0:z1, a:b]) / shift
            ma = jnp.abs(mass)
            tiny = jnp.finfo(ma.dtype).tiny
            row_mean = jnp.maximum(jnp.mean(ma, axis=-1, keepdims=True),
                                   tiny)
            man = ma / row_mean
            contrast = jnp.sqrt(jnp.max(man)
                                / jnp.maximum(jnp.min(man), tiny))
            fshift = jnp.where(contrast < 1.05, 0.03, 0.25) * 1j
        cF = c0 - jnp.asarray(fshift).astype(c0.dtype) * cM      # (9, nz)

        for i, dz in enumerate((-1, 0, 1)):
            acc = None
            for dx in (-1, 0, 1):
                k = (dz + 1) * 3 + (dx + 1)
                phase = jnp.exp(1j * kx * dx).astype(cF.dtype)   # (W,)
                term = cF[k][:, None] * phase[None, :]
                acc = term if acc is None else acc + term
            bands_all[i].append(acc)                              # (nz, W)

    return tuple(jnp.concatenate(b, axis=-1) for b in bands_all)


def _panel_gather(r, starts, W):
    '(..., nz, nx) -> (..., nz, P*W) panel-window gather.'
    return jnp.concatenate([r[..., s:s + W] for s in starts], axis=-1)


def _panel_scatter(xp, starts, W, nx):
    '(..., nz, P*W) -> (..., nz, nx) overlapping scatter-add.'
    out = jnp.zeros(xp.shape[:-1] + (nx,), xp.dtype)
    for p, s in enumerate(starts):
        out = out.at[..., s:s + W].add(xp[..., p * W:(p + 1) * W])
    return out


def _panel_fft(rp, P, W, axis_inverse=False, dft=None):
    '''
    Per-panel FFT along x: (..., nz, P*W) blockwise of width W. With
    ``dft`` (the (F, Fi) pair of width W) the transform runs as an MXU
    matmul instead of jnp.fft (see StratPCR.dft).
    '''
    shp = rp.shape[:-1] + (P, W)
    rps = rp.reshape(shp)
    if dft is not None:
        out = _dft_apply(rps, dft[1] if axis_inverse else dft[0])
    else:
        out = jnp.fft.ifft(rps, axis=-1) if axis_inverse \
            else jnp.fft.fft(rps, axis=-1)
    return out.reshape(rp.shape)


def _odd_extend(rp, P, W):
    '''
    Per-panel odd (Dirichlet) extension along x: (..., nz, P*W) ->
    (..., nz, P*2W), each panel followed by the negated reverse of its
    interior so the periodic FFT solve sees zero-Dirichlet panel edges
    (no wraparound of O(1) residual across the window seam). The
    endpoints of the reversed copy are the panel's own endpoints negated
    (a half-sample-shifted DST-II-style extension would need fractional
    phases; the plain odd mirror is enough for a preconditioner).
    '''

    shp = rp.shape[:-1] + (P, W)
    rps = rp.reshape(shp)
    ext = jnp.concatenate([rps, -jnp.flip(rps, axis=-1)], axis=-1)
    return ext.reshape(rp.shape[:-1] + (P * 2 * W,))


def _odd_restrict(xp, P, W):
    '(..., nz, P*2W) -> (..., nz, P*W): keep each panel first half.'

    shp = xp.shape[:-1] + (P, 2 * W)
    return xp.reshape(shp)[..., :W].reshape(xp.shape[:-1] + (P * W,))


def stratified_apply_panels(strat, r, npanels, overlap, transpose=False,
                            delta=1e-6, taper='out'):
    '''
    Apply the x-panelled stratified interior inverse to (..., 1, nz, nx):
    gather panel windows, per-panel x-FFT, z-PCR solve over the
    concatenated panel columns, inverse FFT, partition-of-unity blend,
    overlapping scatter-add.

    ``taper`` controls where the partition-of-unity weights act — the
    cure for the wraparound artifacts of the per-panel periodic FFT
    (the window seam carries O(1) residual, and the periodic interior
    Green's function wraps it ~1-2 wavelengths into the panel):

    - 'out': weights on the solved output only (the original scheme —
      contamination enters the solve at full strength);
    - 'in': weights on the gathered residual only — the input is zero
      at the seam, so there is no discontinuity to wrap;
    - 'sym': sqrt-weights on both sides;
    - 'dst': zero-Dirichlet panel solves via odd extension to width 2W
      (requires coefficients built with ``dst=True`` — see
      ``stratified_coeffs_panels``), weights on the output. No wrap at
      all, at 2x the FFT/PCR cost.

    The transpose path applies the algebraically transposed
    construction: weights move to the opposite side, with the
    transposed tridiagonal family.
    '''

    nx = r.shape[-1]
    starts, W = panel_layout(nx, npanels, overlap)
    P = len(starts)
    wts = jnp.asarray(panel_weights(nx, npanels, overlap))  # (P, W)
    rdt = jnp.real(r).dtype
    if taper == 'sym':
        w_in = w_out = jnp.sqrt(wts).reshape(P * W).astype(rdt)
    elif taper == 'in':
        w_in, w_out = wts.reshape(P * W).astype(rdt), None
    else:  # 'out', 'dst'
        w_in, w_out = None, wts.reshape(P * W).astype(rdt)
    if transpose:
        w_in, w_out = w_out, w_in

    dst = taper == 'dst'
    Wx = 2 * W if dst else W

    dftm = strat.dft if isinstance(strat, StratPCR) else None
    if dftm is not None and dftm[0].shape[-1] != (2 * W if taper == 'dst'
                                                  else W):
        dftm = None   # stored width does not match this panel layout

    def _solve(rp, use_pre):
        if dst:
            rp = _odd_extend(rp, P, W)
        rhat = _panel_fft(rp, P, Wx, axis_inverse=transpose, dft=dftm)
        if use_pre:
            xhat = pcr_apply(strat, rhat)
        else:
            l, d, u = (transpose_strat(tuple(
                strat.ldu if isinstance(strat, StratPCR) else strat))
                if transpose else
                (strat.ldu if isinstance(strat, StratPCR) else strat))
            xhat = tridiag_pcr_solve(l, d, u, rhat, delta=delta)
        xp = _panel_fft(xhat, P, Wx, axis_inverse=not transpose,
                        dft=dftm)
        if dst:
            xp = _odd_restrict(xp, P, W)
        return xp

    rp = _panel_gather(r, starts, W)
    if w_in is not None:
        rp = rp * w_in
    xp = _solve(rp, use_pre=isinstance(strat, StratPCR) and not transpose)
    if w_out is not None:
        xp = xp * w_out
    return _panel_scatter(xp, starts, W, nx)


def transpose_strat(strat):
    '''
    Tridiagonal coefficients of the transposed stratified operator:
    (T^T)[z] couples via l_T(z) = u(z-1), d, u_T(z) = l(z+1).
    '''

    l, d, u = strat
    return (_shift_z(u, -1), d, _shift_z(l, +1))


def stratified_apply(strat, r, transpose=False, delta=1e-6):
    '''
    Apply the stratified interior inverse: x-FFT, per-kx tridiagonal
    solve in z, inverse x-FFT. r has shape (..., 1, nz, nx) (scalar
    block). With ``transpose=True`` applies the algebraic transpose
    P^T = F T^{-T} F^{-1} (the x-DFT matrix is symmetric).

    ``strat`` may be a StratPCR (precomputed levels: the fast forward
    path) or a bare (l, d, u) triple. The transpose path always reduces
    on the fly from the stored (l, d, u) — it runs only inside
    custom_linear_solve transpose solves.
    '''

    pre = isinstance(strat, StratPCR)
    dftm = strat.dft if pre else None
    if dftm is not None and dftm[0].shape[-1] != r.shape[-1]:
        dftm = None

    def _fwd(v):
        return (_dft_apply(v, dftm[0]) if dftm is not None
                else jnp.fft.fft(v, axis=-1))

    def _inv(v):
        return (_dft_apply(v, dftm[1]) if dftm is not None
                else jnp.fft.ifft(v, axis=-1))

    if transpose:
        ldu = strat.ldu if pre else strat
        l, d, u = transpose_strat(tuple(ldu))
        # the DFT matrices are symmetric, so the algebraic transpose
        # P^T = F^T T^{-T} F^{-T} reuses (F, Fi) unchanged
        rhat = _inv(r)
        xhat = tridiag_pcr_solve(l, d, u, rhat, delta=delta)
        return _fwd(xhat)
    rhat = _fwd(r)
    if pre:
        xhat = pcr_apply(strat, rhat)
    else:
        l, d, u = strat
        xhat = tridiag_pcr_solve(l, d, u, rhat, delta=delta)
    return _inv(xhat)
