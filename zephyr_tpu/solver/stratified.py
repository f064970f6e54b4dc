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

import numpy as np

import jax.numpy as jnp
from jax import lax


def _shift_z(a, s):
    'a[..., z + s, :] with zero fill outside; shift along axis -2.'

    nz = a.shape[-2]
    if s == 0:
        return a
    pad = [(0, 0)] * (a.ndim - 2) + [(abs(s), abs(s)), (0, 0)]
    ap = jnp.pad(a, pad)
    start = abs(s) + s
    return lax.slice_in_dim(ap, start, start + nz, axis=a.ndim - 2)


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

    nz = d.shape[-2]
    nsteps = max(1, int(np.ceil(np.log2(max(nz, 2)))))

    def _safe_inv(x):
        # magnitude-clamped reciprocal: entries below ``delta * max|x|``
        # (including the exact zeros produced by out-of-range shifts) are
        # replaced by the clamp value with their phase preserved, so the
        # inverse stays finite and 0 * inv products stay 0
        a = jnp.abs(x)
        dmin = delta * jnp.max(a)
        tiny = jnp.finfo(a.dtype).tiny
        phase = jnp.where(a > 0, x / jnp.maximum(a, tiny).astype(x.dtype),
                          jnp.ones((), x.dtype))
        xs = jnp.where(a < dmin, dmin.astype(x.dtype) * phase, x)
        return 1.0 / xs

    s = 1
    for _ in range(nsteps):
        inv_dm = _safe_inv(_shift_z(d, -s))   # d[z - s]
        inv_dp = _safe_inv(_shift_z(d, +s))   # d[z + s]
        alpha = -l * inv_dm
        gamma = -u * inv_dp
        l_new = alpha * _shift_z(l, -s)
        u_new = gamma * _shift_z(u, +s)
        d_new = d + alpha * _shift_z(u, -s) + gamma * _shift_z(l, +s)
        b_new = (b + alpha * _shift_z(b, -s) + gamma * _shift_z(b, +s))
        l, d, u, b = l_new, d_new, u_new, b_new
        s *= 2
    return b * _safe_inv(d)


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
    '''

    l, d, u = transpose_strat(strat) if transpose else strat
    if transpose:
        rhat = jnp.fft.ifft(r, axis=-1)
    else:
        rhat = jnp.fft.fft(r, axis=-1)
    xhat = tridiag_pcr_solve(l, d, u, rhat, delta=delta)
    if transpose:
        return jnp.fft.fft(xhat, axis=-1)
    return jnp.fft.ifft(xhat, axis=-1)
